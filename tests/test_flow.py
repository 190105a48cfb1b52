"""Rectified-flow process (diffusion/flow.py — beyond-reference family).

Exactness anchor: for a point-mass data distribution at ``c`` the optimal
velocity field is v(x, t) = (x - c) / t, whose trajectories are LINEAR in t
— Euler integration is exact at any step count, so sampling through the
oracle must return ``c`` bit-tight. Plus path/target identities, trainer
integration (loss decreases), and the DDPM-wrapper seams (chunk identity,
mesh parity, mode validation).
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu.diffusion import RectifiedFlow
from r2dm_tpu.diffusion.base import key_batch_from_seeds

SHAPE = (4, 8)  # (H, W)


def make_flow(apply_fn):
    model = types.SimpleNamespace(
        in_channels=2, resolution=SHAPE, apply=apply_fn
    )
    return RectifiedFlow(model)


def oracle_apply(c):
    """Optimal velocity for data == point mass c: v = (x - c) / t."""

    def apply(variables, x, cond):
        t = (cond / 1000.0).reshape(-1, 1, 1, 1)
        return (x - c) / t

    return apply


@pytest.mark.parametrize("mode", ["euler", "midpoint"])
@pytest.mark.parametrize("num_steps", [1, 7])
def test_point_mass_oracle_is_exact(mode, num_steps):
    c = 0.37
    flow = make_flow(oracle_apply(c))
    x = flow.sample(
        {}, jax.random.key(0), batch_size=3, num_steps=num_steps, mode=mode
    )
    assert x.shape == (3, *SHAPE, 2)
    np.testing.assert_allclose(np.asarray(x), c, rtol=0, atol=1e-5)


def test_path_and_target_identities():
    flow = make_flow(lambda *a: None)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, *SHAPE, 2)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal(x0.shape), jnp.float32)
    t = jnp.asarray([0.0, 1.0])
    xt = flow.q_step_from_x_0(x0, t, eps)
    np.testing.assert_allclose(np.asarray(xt[0]), np.asarray(x0[0]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(xt[1]), np.asarray(eps[1]), atol=1e-7)
    np.testing.assert_array_equal(
        np.asarray(flow.get_target(x0, t, eps)), np.asarray(eps - x0)
    )
    cond = flow.get_network_condition(jnp.asarray([0.25]))
    assert float(cond[0]) == 250.0


def test_segment_chaining_matches_sample():
    c = -0.8
    flow = make_flow(oracle_apply(c))
    key = key_batch_from_seeds([3, 4])
    full = flow.sample({}, key, batch_size=2, num_steps=6, mode="euler")
    from r2dm_tpu.diffusion.base import normal, split_key

    k, sub = split_key(key)
    x = normal(sub, (2, *SHAPE, 2))
    ts = jnp.linspace(1.0, 0.0, 7, dtype=jnp.float32)
    for lo in (0, 2, 4):
        x, k = flow.sample_segment({}, x, k, ts[lo : lo + 3], mode="euler")
    np.testing.assert_array_equal(np.asarray(full), np.asarray(x))


@pytest.fixture(scope="module")
def flow_ddpm():
    from r2dm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
    from r2dm_tpu.inference import DDPM, build_diffusion, build_model, model_coords

    cfg = Config(
        data=DataConfig(resolution=(16, 64)),
        model=ModelConfig(
            base_channels=8,
            channel_multiplier=(1, 2, 2, 2),
            num_residual_blocks=(1, 1, 1, 1),
            gn_num_groups=4,
            attn_num_heads=2,
        ),
        diffusion=DiffusionConfig(timestep_type="flow"),
    )
    model = build_model(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 64, 2)), jnp.zeros((1,))
    )
    # zero-init out_conv would make every velocity 0; randomize
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.key(1), len(leaves))
    variables = jax.tree_util.tree_unflatten(
        treedef,
        [0.05 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )
    variables = {
        "params": variables["params"],
        "buffers": {"coords": jnp.asarray(model_coords(cfg))},
    }
    diffusion = build_diffusion(cfg, model)
    assert isinstance(diffusion, RectifiedFlow)
    return cfg, model, variables, diffusion, DDPM


def test_ddpm_wrapper_flow_modes_and_chunking(flow_ddpm):
    cfg, model, variables, diffusion, DDPM = flow_ddpm
    ddpm = DDPM(diffusion, variables, cfg)
    a = ddpm.sample(batch_size=2, num_steps=5, seeds=[1, 2], mode="euler")
    assert a.shape == (2, 2, 16, 64)
    assert np.isfinite(np.asarray(a)).all()

    ddpm2 = DDPM(diffusion, variables, cfg)
    ddpm2.AUTO_CHUNK_WORK = 1  # force the chunked-serving route
    b = ddpm2.sample(
        batch_size=2, num_steps=5, seeds=[1, 2], mode="euler", progress_chunk=2
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError, match="euler"):
        ddpm.sample(batch_size=1, num_steps=2, mode="ddpm")
    with pytest.raises(ValueError, match="dpmpp_2m"):
        ddpm.sample(batch_size=1, num_steps=2, mode="dpmpp_2m")


def test_flow_repaint(flow_ddpm):
    """Flow checkpoints complete (RePaint) too: the base-class drivers run
    over RectifiedFlow's Euler reverse jumps + straight-path re-noising
    (flow.py q_step/_repaint_reverse_jumps); same surface as the Gaussian
    families (reference continuous_time.py:260-317, completion_demo.py:92-99).
    """
    cfg, model, variables, diffusion, DDPM = flow_ddpm
    ddpm = DDPM(diffusion, variables, cfg)
    known = jnp.zeros((1, 2, 16, 64)).at[:, :, :8].set(0.5)
    mask = jnp.zeros((1, 2, 16, 64)).at[:, :, :8].set(1.0)
    out = ddpm.repaint(
        known, mask, num_steps=3, num_resample_steps=2, jump_length=2,
        seeds=[7],
    )
    out = np.asarray(out)
    assert out.shape == (1, 2, 16, 64)
    assert np.isfinite(out).all()
    # the final reverse sub-step blends at s=0 where the path marginal is
    # the data itself ((1-0)*known + 0*eps) — known pixels come back exact
    # up to one lerp rounding (XLA lowers m*k + (1-m)*u as u + m*(k-u),
    # leaving ~eps*|u| ≈ 1e-7 residue even at m=1; measured max 7.2e-7)
    np.testing.assert_allclose(
        out[:, :, :8], np.asarray(known)[:, :, :8], rtol=0, atol=5e-6
    )
    # unknown region actually got painted (not left at init noise scale 0
    # or copied from known)
    assert np.abs(out[:, :, 8:]).mean() > 1e-4

    # chunked-dispatch route (repaint_segment chaining + repaint_final)
    # follows the same key-split sequence as the monolithic
    # diffusion.repaint; the two are separate XLA programs, so the Euler
    # update x + dt*v may round differently (FMA/lerp reassociation,
    # measured max 7.2e-7 — the Gaussian counterpart in test_inference
    # happens to land bit-exact). A key-sequence bug would diverge O(1).
    ddpm2 = DDPM(diffusion, variables, cfg)
    ddpm2.AUTO_CHUNK_WORK = 1  # force chunking
    out2 = ddpm2.repaint(
        known, mask, num_steps=3, num_resample_steps=2, jump_length=2,
        seeds=[7], progress_chunk=2,
    )
    np.testing.assert_allclose(out, np.asarray(out2), rtol=0, atol=1e-5)


def test_flow_repaint_mesh_parity(flow_ddpm):
    """Flow repaint under (data,) and (data, width) serving meshes must
    match the unsharded result — the mesh plumbing (inference.py
    _mesh_shardings / _repaint_chunked) is family-agnostic, so this pins
    the flow hooks against GSPMD halo handling too (cf. the Gaussian leg
    in tests/test_inference.py::test_repaint_mesh_parity)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from r2dm_tpu.parallel import make_mesh

    cfg, model, variables, diffusion, DDPM = flow_ddpm
    known = jnp.zeros((2, 2, 16, 64)).at[:, :, :8].set(0.5)
    mask = jnp.zeros((2, 2, 16, 64)).at[:, :, :8].set(1.0)
    kwargs = dict(num_steps=4, num_resample_steps=2, jump_length=1,
                  seeds=[5, 6])
    ddpm = DDPM(diffusion, variables, cfg)
    a = ddpm.repaint(known, mask, **kwargs)
    for mesh in (make_mesh((2,)), make_mesh((2, 4))):
        b = ddpm.repaint(known, mask, mesh=mesh, **kwargs)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, err_msg=str(mesh.shape)
        )


def test_flow_q_step_preserves_path_marginal():
    """flow.q_step's moment-matching claim, checked empirically: pushing
    x_s = (1-s) x0 + s eps forward to t must land on N((1-t) x0, t^2 I)."""
    stub = types.SimpleNamespace(apply=None, in_channels=1, resolution=(4, 4))
    flow = RectifiedFlow(model=stub)
    n = 200_000
    x0 = 0.7
    s, t = 0.3, 0.8
    k1, k2 = jax.random.split(jax.random.key(0))
    eps = jax.random.normal(k1, (n, 1, 1, 1), jnp.float32)
    x_s = (1.0 - s) * x0 + s * eps
    x_t = flow.q_step(
        x_s, jnp.full((n,), t), jnp.full((n,), s),
        jax.random.normal(k2, (n, 1, 1, 1), jnp.float32),
    )
    assert abs(float(jnp.mean(x_t)) - (1.0 - t) * x0) < 5e-3
    assert abs(float(jnp.std(x_t)) - t) < 5e-3


def test_flow_mode_rejected_on_gaussian(flow_ddpm):
    cfg, model, variables, _, DDPM = flow_ddpm
    from r2dm_tpu.config import Config, DataConfig, ModelConfig
    from r2dm_tpu.inference import build_diffusion

    gauss_cfg = Config(
        data=DataConfig(resolution=(16, 64)), model=cfg.model
    )
    gauss = DDPM(build_diffusion(gauss_cfg, model), variables, gauss_cfg)
    with pytest.raises(ValueError, match="midpoint"):
        gauss.sample(batch_size=1, num_steps=2, mode="midpoint")


def test_mesh_parity_flow(flow_ddpm):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from r2dm_tpu.parallel import make_mesh

    cfg, model, variables, diffusion, DDPM = flow_ddpm
    ddpm = DDPM(diffusion, variables, cfg)
    a = ddpm.sample(batch_size=8, num_steps=3, seeds=list(range(8)), mode="euler")
    for mesh in (make_mesh((8,)), make_mesh((2, 4))):
        b = ddpm.sample(
            batch_size=8, num_steps=3, seeds=list(range(8)), mode="euler",
            mesh=mesh,
        )
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, err_msg=str(mesh.shape)
        )


@pytest.mark.slow
def test_flow_training_loss_decreases(flow_ddpm):
    import optax

    cfg, model, variables, diffusion, _ = flow_ddpm
    from r2dm_tpu.training import EMAConfig, init_train_state, make_train_step
    from r2dm_tpu.training.step import jit_train_step

    tx = optax.adam(2e-3)
    state = init_train_state(variables["params"], variables["buffers"], tx)
    step = jit_train_step(make_train_step(diffusion, tx, EMAConfig()))

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(np.tanh(rng.standard_normal((8, 16, 64, 2))), jnp.float32)
    losses = []
    for i in range(80):
        state, metrics = step(state, x0, jax.random.key(i), None)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # per-step loss is noisy (fresh t/eps each step; the velocity-matching
    # floor is the conditional variance of eps - x_0) — measured trajectory
    # on this seed: 1.38 -> ~1.1 over 80 steps
    assert np.mean(losses[-10:]) < 0.9 * np.mean(losses[:5]), losses


@pytest.mark.slow
def test_flow_train_cli_checkpoint_samples(tmp_path, monkeypatch):
    """timestep_type=flow end to end: train CLI -> checkpoint (config
    round-trips the flow family) -> setup_model -> euler sampling."""
    import sys

    from train import train
    from r2dm_tpu.config import parse_cli
    from r2dm_tpu.inference import setup_model

    out = tmp_path / "run"
    monkeypatch.setattr(sys, "argv", [
        "train.py",
        "--data.dataset", "synthetic",
        "--data.projection", "spherical-256",
        "--data.resolution", "16,128",
        "--model.base_channels", "8",
        "--model.channel_multiplier", "1,2,2,2",
        "--model.num_residual_blocks", "1,1,1,1",
        "--model.gn_num_groups", "4",
        "--model.attn_num_heads", "2",
        "--diffusion.timestep_type", "flow",
        "--training.batch_size_train", "8",
        "--training.num_steps", "3",
        "--training.lr_warmup_steps", "2",
        "--training.steps_save_image", "100000",
        "--training.steps_save_model", "100000",
        "--training.output_dir", str(out),
    ])
    train(parse_cli())
    ddpm, lidar_utils, cfg = setup_model(str(out / "checkpoint.msgpack"))
    assert isinstance(ddpm.diffusion, RectifiedFlow)
    x = ddpm.sample(batch_size=2, num_steps=4, seeds=[0, 1], mode="euler")
    assert x.shape == (2, 2, 16, 128)
    assert np.isfinite(np.asarray(x)).all()

    # reflow (2-rectification) consumes the checkpoint and emits another
    # loadable one that samples in 1-2 euler steps (tools/reflow.py)
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "reflow", Path(__file__).parent.parent / "tools" / "reflow.py"
    )
    reflow = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(reflow)
    out2 = str(tmp_path / "reflowed.msgpack")
    reflow.main([
        "--ckpt", str(out / "checkpoint.msgpack"), "--out", out2,
        "--num_pairs", "8", "--teacher_steps", "3", "--batch_size", "4",
        "--train_steps", "6", "--seed", "0",
    ])
    ddpm2, _, _ = setup_model(out2)
    assert isinstance(ddpm2.diffusion, RectifiedFlow)
    y = ddpm2.sample(batch_size=2, num_steps=1, seeds=[0, 1], mode="euler")
    assert y.shape == (2, 2, 16, 128)
    assert np.isfinite(np.asarray(y)).all()