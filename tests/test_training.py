"""Training stack tests: LR schedule parity, EMA schedule, jitted train step
convergence, and multi-device (8-CPU mesh) data/width parallelism."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu.config import TrainingConfig
from r2dm_tpu.diffusion import ContinuousTimeGaussianDiffusion
from r2dm_tpu.models.efficient_unet import EfficientUNet
from r2dm_tpu.parallel import make_mesh, shard_batch
from r2dm_tpu.training import (
    EMAConfig,
    cosine_schedule_with_warmup,
    ema_decay,
    init_train_state,
    jit_train_step,
    make_optimizer,
    make_train_step,
)

TINY = dict(
    in_channels=2,
    resolution=(16, 64),
    base_channels=8,
    channel_multiplier=(1, 2, 2, 2),
    num_residual_blocks=(1, 1, 1, 1),
    gn_num_groups=4,
    attn_num_heads=2,
    coords_encoding=None,
)


def reference_lr_lambda(step, warmup, total, num_cycles=0.5):
    """Exact reference lr_lambda (utils/training.py:14-22)."""
    if step < warmup:
        return step / max(1, warmup)
    progress = (step - warmup) / max(1, total - warmup)
    return max(0.0, 0.5 * (1.0 + math.cos(math.pi * num_cycles * 2.0 * progress)))


def test_cosine_warmup_schedule_parity():
    sched = cosine_schedule_with_warmup(1e-4, 10_000, 300_000)
    for step in [0, 1, 500, 9_999, 10_000, 150_000, 299_999, 300_000]:
        expected = 1e-4 * reference_lr_lambda(step, 10_000, 300_000)
        np.testing.assert_allclose(
            float(sched(step)), expected, rtol=1e-5, atol=1e-12, err_msg=str(step)
        )


def test_ema_decay_schedule():
    """ema_pytorch semantics: copy (decay 0) until update_after_step, then
    ramp 1-(1+epoch)^(-2/3) clamped to beta."""
    cfg = EMAConfig(beta=0.995)
    assert float(ema_decay(jnp.asarray(0), cfg)) == 0.0
    assert float(ema_decay(jnp.asarray(100), cfg)) == 0.0
    assert float(ema_decay(jnp.asarray(101), cfg)) == 0.0  # epoch=0 -> copy
    d = float(ema_decay(jnp.asarray(102), cfg))
    np.testing.assert_allclose(d, 1.0 - 2.0 ** (-2.0 / 3.0), rtol=1e-6)
    assert float(ema_decay(jnp.asarray(10_000_000), cfg)) == pytest.approx(0.995)


@pytest.fixture(scope="module")
def tiny_training():
    net = EfficientUNet(**TINY)
    variables = net.init(
        jax.random.key(0), jnp.zeros((1, 16, 64, 2)), jnp.zeros((1,))
    )
    ddpm = ContinuousTimeGaussianDiffusion(model=net, noise_schedule="cosine")
    cfg = TrainingConfig(lr=2e-3, lr_warmup_steps=5, num_steps=100)
    tx, _ = make_optimizer(cfg)
    state = init_train_state(
        variables["params"], variables.get("buffers", {}), tx
    )
    step_fn = make_train_step(ddpm, tx, EMAConfig(update_after_step=2, update_every=1))
    return state, step_fn


def test_train_step_reduces_loss(tiny_training):
    state, step_fn = tiny_training
    jit_fn = jax.jit(step_fn)
    x_0 = jnp.tile(
        jnp.linspace(-0.5, 0.5, 64)[None, None, :, None], (4, 16, 1, 2)
    )
    losses = []
    for i in range(30):
        state, metrics = jit_fn(state, x_0, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 30
    assert np.isfinite(losses).all()
    # denoising a constant-structure batch must improve quickly
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # EMA started copying then tracking
    ema_leaf = jax.tree.leaves(state.ema_params)[0]
    assert np.isfinite(np.asarray(ema_leaf)).all()


def test_train_step_with_dropout():
    """dropout > 0 must thread a dropout rng (training-mode stochasticity)
    and keep the loss finite; two different keys give different losses."""
    net = EfficientUNet(dropout=0.2, **TINY)
    variables = net.init(
        jax.random.key(0), jnp.zeros((1, 16, 64, 2)), jnp.zeros((1,))
    )
    ddpm = ContinuousTimeGaussianDiffusion(model=net, noise_schedule="cosine")
    cfg = TrainingConfig(lr=1e-3, lr_warmup_steps=2, num_steps=10)
    tx, _ = make_optimizer(cfg)
    state = init_train_state(variables["params"], variables.get("buffers", {}), tx)
    step_fn = jax.jit(make_train_step(ddpm, tx, EMAConfig(), dropout=0.2))
    x_0 = jnp.zeros((2, 16, 64, 2))
    _, m1 = step_fn(state, x_0, jax.random.key(1), None)
    _, m2 = step_fn(state, x_0, jax.random.key(2), None)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m1["loss"]) != float(m2["loss"])


def test_train_step_grad_bf16_policy():
    """grad_dtype=bf16 (bf16 cotangents, fp32 master params): the gradient
    direction must agree with the bf16-compute/fp32-param backward within
    bf16 rounding, params must stay fp32, and the step must still reduce
    loss. The policy requires a bf16-compute net (the training default,
    mixed_precision="bf16"): with fp32 compute the cast-to-bf16 params
    would feed fp32 convs and dtype-mismatch."""
    net = EfficientUNet(dtype=jnp.bfloat16, **TINY)
    variables = net.init(
        jax.random.key(0), jnp.zeros((1, 16, 64, 2)), jnp.zeros((1,))
    )
    ddpm = ContinuousTimeGaussianDiffusion(model=net, noise_schedule="cosine")
    # warmup 0: the warmup ramp makes the step-0 lr exactly 0 (reference
    # lr_lambda), which would zero both updates and void the comparison
    cfg = TrainingConfig(lr=2e-3, lr_warmup_steps=0, num_steps=100)
    tx, _ = make_optimizer(cfg)
    state = init_train_state(variables["params"], variables.get("buffers", {}), tx)
    fp32_fn = jax.jit(make_train_step(ddpm, tx, EMAConfig()))
    bf16_fn = jax.jit(
        make_train_step(ddpm, tx, EMAConfig(), grad_dtype=jnp.bfloat16)
    )
    x_0 = jnp.tile(
        jnp.linspace(-0.5, 0.5, 64)[None, None, :, None], (4, 16, 1, 2)
    )
    s32, m32 = fp32_fn(state, x_0, jax.random.key(0), None)
    s16, m16 = bf16_fn(state, x_0, jax.random.key(0), None)
    # same-key loss agrees to bf16 forward tolerance (zero-init out_conv
    # makes the prediction exactly 0 either way at step 0, so losses match
    # closely; grads differ by bf16 rounding only)
    np.testing.assert_allclose(
        float(m16["loss"]), float(m32["loss"]), rtol=2e-2
    )
    # params stay fp32 master copies
    for leaf in jax.tree.leaves(s16.params):
        assert leaf.dtype == jnp.float32
    # updated params agree within bf16-cotangent tolerance (lr 2e-3, one step)
    d32 = jax.tree.map(lambda a, b: np.asarray(a - b), s32.params, state.params)
    d16 = jax.tree.map(lambda a, b: np.asarray(a - b), s16.params, state.params)
    n32 = np.sqrt(sum(float((x * x).sum()) for x in jax.tree.leaves(d32)))
    n16 = np.sqrt(sum(float((x * x).sum()) for x in jax.tree.leaves(d16)))
    dot = sum(
        float((a * b).sum())
        for a, b in zip(jax.tree.leaves(d32), jax.tree.leaves(d16))
    )
    assert dot / (n32 * n16 + 1e-30) > 0.98, "update direction diverged"
    # and it still trains
    losses = []
    for i in range(20):
        state, metrics = bf16_fn(state, x_0, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_train_step_with_loss_mask(tiny_training):
    state, step_fn = tiny_training
    x_0 = jnp.zeros((2, 16, 64, 2))
    mask = jnp.ones_like(x_0).at[:, :8].set(0.0)
    state2, metrics = jax.jit(step_fn)(state, x_0, jax.random.key(0), mask)
    assert np.isfinite(float(metrics["loss"]))


def test_multichip_data_parallel_step(tiny_training):
    """8-device CPU mesh (4 data x 2 width): the full train step must compile
    and run with batch sharded over data and W sharded over width — the
    gradient psum and ring-conv halo exchanges are XLA-inserted."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    state, step_fn = tiny_training
    step0 = int(state.step)
    mesh = make_mesh((4, 2))
    jit_fn = jit_train_step(step_fn, mesh)
    x_0 = jax.random.normal(jax.random.key(7), (8, 16, 64, 2))
    batch = shard_batch(mesh, x_0)
    # deep-copy before device_put: the jitted step donates its input state,
    # and device_put may alias buffers with the (module-scoped) original
    state_sharded = jax.device_put(
        jax.tree.map(jnp.array, state),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    state2, metrics = jit_fn(state_sharded, batch, jax.random.key(1), None)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == step0 + 1

    # parity: the sharded step must match the single-device step bitwise-ish
    state_single, metrics_single = jax.jit(step_fn)(
        state, x_0, jax.random.key(1), None
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_single["loss"]), rtol=1e-5
    )
    a = jax.tree.leaves(state2.params)[0]
    b = jax.tree.leaves(state_single.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
