"""Diffusion-layer parity vs the reference (golden fixtures) plus behavioral
checks of the scan-based samplers.

Goldens (tools/gen_goldens.py):
  - schedules.npz: logSNR curves, alpha/sigma, discrete beta tables
  - tiny_diffusion_continuous.npz / tiny_diffusion_discrete.npz: p_step
    (ddpm mean w/ zero noise + ddim), p_loss with fixed noise, through a
    randomly-initialized tiny EfficientUNet.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu.diffusion import (
    ContinuousTimeGaussianDiffusion,
    DiscreteTimeGaussianDiffusion,
    key_batch_from_seeds,
    schedules,
)
from r2dm_tpu.models.efficient_unet import EfficientUNet
from r2dm_tpu.utils.torch_import import variables_from_reference

GOLDEN = Path(__file__).parent / "golden"

TINY = dict(
    in_channels=2,
    resolution=(16, 64),
    base_channels=16,
    channel_multiplier=(1, 2, 4, 8),
    num_residual_blocks=(1, 1, 1, 1),
    gn_num_groups=4,
    attn_num_heads=4,
    ring=True,
    coords_encoding="fourier_features",
)


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def tiny_net_and_vars():
    g = np.load(GOLDEN / "tiny_diffusion_continuous.npz")
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    net = EfficientUNet(**TINY)
    return net, variables_from_reference(sd)


# ---------------------------------------------------------------- schedules
def test_logsnr_schedules_match_reference():
    g = np.load(GOLDEN / "schedules.npz")
    t = jnp.asarray(g["t"])
    np.testing.assert_allclose(
        schedules.logsnr_linear(t), g["logsnr_linear"], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        schedules.logsnr_cosine(t), g["logsnr_cosine"], rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        schedules.logsnr_cosine_shifted(t, image_d=64, noise_d=32),
        g["logsnr_cosine_shifted"],
        rtol=1e-5,
        atol=1e-4,
    )
    # interpolated: the reference broadcasts t along the trailing axis (a
    # bug — see schedules.logsnr_cosine_interpolated docstring), so the
    # expected value is the intended elementwise blend of the shifted curves.
    low = np.asarray(g["logsnr_cosine_shifted"])  # noise_d=32
    high = np.asarray(g["logsnr_cosine"]) + 2 * np.log(128 / 64)
    tn = np.asarray(g["t"])
    np.testing.assert_allclose(
        schedules.logsnr_cosine_interpolated(
            t, image_d=64, noise_d_low=32, noise_d_high=128
        ),
        tn * low + (1 - tn) * high,
        rtol=1e-5,
        atol=1e-4,
    )
    alpha, sigma = schedules.logsnr_to_alpha_sigma(jnp.asarray(g["logsnr_cosine"]))
    np.testing.assert_allclose(alpha, g["alpha"], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(sigma, g["sigma"], rtol=1e-6, atol=1e-6)


def test_beta_tables_match_reference():
    g = np.load(GOLDEN / "schedules.npz")
    for name in ("linear", "cosine", "sigmoid"):
        ours = schedules.make_beta_table(name, 1000).astype(np.float32)
        np.testing.assert_allclose(
            ours, g[f"beta_{name}"], rtol=5e-5, atol=1e-8, err_msg=name
        )


# ---------------------------------------------------------------- continuous
def test_continuous_p_step_parity(tiny_net_and_vars):
    net, variables = tiny_net_and_vars
    g = np.load(GOLDEN / "tiny_diffusion_continuous.npz")
    ddpm = ContinuousTimeGaussianDiffusion(
        model=net, prediction_type="eps", noise_schedule="cosine"
    )
    x_t = jnp.asarray(nhwc(g["x_t"]))
    step_t = jnp.asarray(g["step_t"])
    step_s = jnp.asarray(g["step_s"])
    mean = ddpm.p_step(variables, x_t, step_t, step_s, noise=None, mode="ddpm")
    np.testing.assert_allclose(
        np.asarray(mean), nhwc(g["ddpm_mean"]), rtol=1e-4, atol=1e-4
    )
    ddim = ddpm.p_step(variables, x_t, step_t, step_s, noise=None, mode="ddim")
    np.testing.assert_allclose(
        np.asarray(ddim), nhwc(g["ddim_out"]), rtol=1e-4, atol=1e-4
    )


def test_continuous_p_loss_parity(tiny_net_and_vars):
    net, variables = tiny_net_and_vars
    g = np.load(GOLDEN / "tiny_diffusion_continuous.npz")
    ddpm = ContinuousTimeGaussianDiffusion(
        model=net, prediction_type="eps", noise_schedule="cosine"
    )
    loss = ddpm.p_loss(
        variables,
        jnp.asarray(nhwc(g["x_t"])),
        jnp.asarray(g["step_t"]),
        noise=jnp.asarray(nhwc(g["noise"])),
    )
    # intended per-sample min-SNR weighting: mean(per_sample * weight).
    # (The reference's own scalar is mean(per)*mean(weight) via a (B,1) x
    # (B,1,1,1) broadcast; see base.masked_weighted_loss docstring.)
    expected = float(np.mean(g["per_sample"] * g["loss_weight"]))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


def test_continuous_sample_runs_and_is_sane(tiny_net_and_vars):
    net, variables = tiny_net_and_vars
    ddpm = ContinuousTimeGaussianDiffusion(
        model=net, prediction_type="eps", noise_schedule="cosine"
    )
    x = jax.jit(
        lambda v, k: ddpm.sample(v, k, batch_size=2, num_steps=4)
    )(variables, jax.random.key(0))
    assert x.shape == (2, 16, 64, 2)
    assert np.isfinite(np.asarray(x)).all()
    # return_all stacks initial noise + every step
    xs = ddpm.sample(
        variables, jax.random.key(0), batch_size=2, num_steps=4, return_all=True
    )
    assert xs.shape == (5, 2, 16, 64, 2)
    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(x), atol=1e-5)


def test_per_sample_keys_are_independent(tiny_net_and_vars):
    """Batch row i must depend only on seed i (reference per-sample
    generator semantics, base.py:71-94)."""
    net, variables = tiny_net_and_vars
    ddpm = ContinuousTimeGaussianDiffusion(
        model=net, prediction_type="eps", noise_schedule="cosine"
    )
    keys_ab = key_batch_from_seeds([7, 8])
    keys_cb = key_batch_from_seeds([9, 8])
    xa = ddpm.sample(variables, keys_ab, batch_size=2, num_steps=2)
    xb = ddpm.sample(variables, keys_cb, batch_size=2, num_steps=2)
    # same seed -> identical sample regardless of batch mates...
    np.testing.assert_allclose(np.asarray(xa[1]), np.asarray(xb[1]), atol=1e-6)
    # ...different seed -> different sample
    assert np.abs(np.asarray(xa[0]) - np.asarray(xb[0])).max() > 1e-3


def test_v_and_x0_objectives_run(tiny_net_and_vars):
    net, variables = tiny_net_and_vars
    for objective in ("v", "x_0"):
        ddpm = ContinuousTimeGaussianDiffusion(
            model=net, prediction_type=objective, noise_schedule="cosine"
        )
        loss = ddpm.loss(
            variables, jnp.zeros((2, 16, 64, 2)), jax.random.key(1)
        )
        assert np.isfinite(float(loss))
        x = ddpm.sample(variables, jax.random.key(2), batch_size=1, num_steps=2)
        assert np.isfinite(np.asarray(x)).all()


def test_repaint_preserves_known_region(tiny_net_and_vars):
    net, variables = tiny_net_and_vars
    ddpm = ContinuousTimeGaussianDiffusion(
        model=net, prediction_type="eps", noise_schedule="cosine"
    )
    known = jnp.zeros((1, 16, 64, 2)).at[:, :8].set(0.5)
    mask = jnp.zeros((1, 16, 64, 2)).at[:, :8].set(1.0)
    out = ddpm.repaint(
        variables,
        known,
        mask,
        jax.random.key(3),
        num_steps=3,
        num_resample_steps=2,
        jump_length=2,
    )
    assert out.shape == (1, 16, 64, 2)
    assert np.isfinite(np.asarray(out)).all()
    # known half must be pinned to the t=0-projected known values: at the
    # final step alpha(0)~1 and sigma(0)=sqrt(sigmoid(-15))~5.5e-4, so the
    # blend leaves only ~1e-3-scale residual noise
    np.testing.assert_allclose(np.asarray(out[:, :8]), 0.5, atol=5e-3)


# ---------------------------------------------------------------- discrete
def test_discrete_p_step_parity(tiny_net_and_vars):
    net, variables = tiny_net_and_vars
    g = np.load(GOLDEN / "tiny_diffusion_discrete.npz")
    ddpm = DiscreteTimeGaussianDiffusion(
        model=net,
        prediction_type="eps",
        noise_schedule="cosine",
        num_training_steps=64,
    )
    x_t = jnp.asarray(nhwc(g["x_t"]))
    steps = jnp.asarray(g["steps"].astype(np.int32))
    mean = ddpm.p_step(variables, x_t, steps, noise=None, mode="ddpm")
    np.testing.assert_allclose(
        np.asarray(mean), nhwc(g["ddpm_mean"]), rtol=1e-4, atol=1e-4
    )
    ddim = ddpm.p_step(variables, x_t, steps, noise=None, mode="ddim")
    np.testing.assert_allclose(
        np.asarray(ddim), nhwc(g["ddim_out"]), rtol=1e-4, atol=1e-4
    )


def test_discrete_p_loss_parity(tiny_net_and_vars):
    net, variables = tiny_net_and_vars
    g = np.load(GOLDEN / "tiny_diffusion_discrete.npz")
    ddpm = DiscreteTimeGaussianDiffusion(
        model=net,
        prediction_type="eps",
        noise_schedule="cosine",
        num_training_steps=64,
    )
    loss = ddpm.p_loss(
        variables,
        jnp.asarray(nhwc(g["x_t"])),
        jnp.asarray(g["steps"].astype(np.int32)),
        noise=jnp.asarray(nhwc(g["noise"])),
    )
    expected = float(np.mean(g["per_sample"] * g["loss_weight"]))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)


def test_discrete_sample_runs(tiny_net_and_vars):
    net, variables = tiny_net_and_vars
    ddpm = DiscreteTimeGaussianDiffusion(
        model=net,
        prediction_type="eps",
        noise_schedule="cosine",
        num_training_steps=64,
    )
    x = ddpm.sample(variables, jax.random.key(0), batch_size=2, num_steps=8)
    assert x.shape == (2, 16, 64, 2)
    assert np.isfinite(np.asarray(x)).all()


# ------------------------------------------------------------ DPM-Solver++
def _analytic_linear_diffusion(s2: float = 0.25):
    """Diffusion with the EXACT eps-predictor for x_0 ~ N(0, s2 I):
    eps*(x_t, t) = sigma_t x_t / (alpha_t^2 s2 + sigma_t^2). With a linear
    model every deterministic sampler discretizes the same probability-flow
    ODE, so a very fine DDIM chain is usable as ground truth."""
    from types import SimpleNamespace

    def analytic_eps(variables, x, log_snr):
        l = jnp.reshape(log_snr, (-1, 1, 1, 1))
        alpha2 = jax.nn.sigmoid(l)
        sigma2 = jax.nn.sigmoid(-l)
        return x * jnp.sqrt(sigma2) / (alpha2 * s2 + sigma2)

    fake = SimpleNamespace(in_channels=2, resolution=(8, 16), apply=analytic_eps)
    return ContinuousTimeGaussianDiffusion(
        model=fake,
        prediction_type="eps",
        noise_schedule="cosine",
        clip_sample=False,  # keep the dynamics exactly linear
    )


def test_dpmpp_2m_beats_ddim_at_equal_steps():
    """The second-order update must track the PF-ODE much closer than DDIM
    at the same step count — the whole point of the extension."""
    diff = _analytic_linear_diffusion()
    key = jax.random.key(11)
    kw = dict(batch_size=2)
    x_ref = diff.sample(None, key, num_steps=4096, mode="ddim", **kw)
    x_ddim = diff.sample(None, key, num_steps=16, mode="ddim", **kw)
    x_dpmpp = diff.sample_dpmpp(None, key, num_steps=16, **kw)
    err_ddim = float(jnp.max(jnp.abs(x_ddim - x_ref)))
    err_dpmpp = float(jnp.max(jnp.abs(x_dpmpp - x_ref)))
    assert err_dpmpp < 0.5 * err_ddim, (err_dpmpp, err_ddim)


def test_dpmpp_segment_chaining_bit_identical(tiny_net_and_vars):
    """Chained dpmpp_2m_segment calls must reproduce sample_dpmpp exactly
    (explicit carry; same contract as sample_segment vs sample)."""
    from r2dm_tpu.diffusion.base import as_typed_key, normal, split_key

    net, variables = tiny_net_and_vars
    diff = ContinuousTimeGaussianDiffusion(
        model=net, prediction_type="eps", noise_schedule="cosine"
    )
    num_steps = 7
    key0 = jax.random.key(5)
    mono = diff.sample_dpmpp(variables, key0, batch_size=2, num_steps=num_steps)

    key = as_typed_key(key0)
    key, sub = split_key(key)
    x = normal(sub, (2, *diff.sampling_shape))
    ts = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)
    idx = jnp.arange(num_steps)
    so = (idx > 0) & (idx < num_steps - 1)
    prev_x0 = jnp.zeros_like(x)
    prev_lam = jnp.zeros((2, 1, 1, 1), jnp.float32)
    done = 0
    for n in (3, 3, 1):
        x, prev_x0, prev_lam, key = diff.dpmpp_2m_segment(
            variables, x, prev_x0, prev_lam, key,
            ts[done : done + n + 1], so[done : done + n],
        )
        done += n
    np.testing.assert_array_equal(np.asarray(mono), np.asarray(x))


def test_dpmpp_first_order_equals_ddim(tiny_net_and_vars):
    """With <= 2 steps every dpmpp update is first-order, and first-order
    DPM-Solver++ in the x0 parameterization is algebraically DDIM eta=0 —
    so the two samplers must agree through the real net. Tolerance: the
    formulas associate differently in fp32 (expm1(-h) vs sqrt(1-alpha^2)
    lowerings), and at 2 steps the net re-amplifies the step-1 rounding
    delta by its Lipschitz factor — observed max ~2e-4."""
    net, variables = tiny_net_and_vars
    diff = ContinuousTimeGaussianDiffusion(
        model=net, prediction_type="eps", noise_schedule="cosine"
    )
    for n in (1, 2):
        key = jax.random.key(21)
        a = diff.sample(variables, key, batch_size=2, num_steps=n, mode="ddim")
        b = diff.sample_dpmpp(variables, key, batch_size=2, num_steps=n)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
