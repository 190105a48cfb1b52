"""Fused conv+FIR-resample ops (ops/fused_resample.py): exact-composition
parity vs the two-op pipeline, plus full-net and gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu.models import layers
from r2dm_tpu.models.efficient_unet import EfficientUNet
from r2dm_tpu.ops import fused_resample as fr
from r2dm_tpu.ops.resample import downsample2x, upsample2x


def _ring_conv(x, k, b):
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


@pytest.mark.parametrize("shape", [(2, 8, 16, 3), (1, 16, 32, 5)])
def test_conv_then_downsample_exact(shape):
    rng = np.random.default_rng(0)
    B, H, W, Ci = shape
    Co = 6
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)) * 0.5, jnp.float32)
    ref = downsample2x(_ring_conv(x, k, b))
    got = fr.conv_then_downsample(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("impl", ["polyphase", "dilated"])
@pytest.mark.parametrize("shape", [(2, 8, 16, 3), (1, 16, 32, 5)])
def test_upsample_then_conv_exact(shape, impl):
    rng = np.random.default_rng(1)
    B, H, W, Ci = shape
    Co = 6
    h = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)) * 0.5, jnp.float32)
    ref = _ring_conv(upsample2x(h), k, b)
    got = fr.upsample_then_conv(h, k, b, impl=impl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_fused_resample_differentiable():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 4)) * 0.3, jnp.float32)
    b = jnp.zeros((4,), jnp.float32)

    g = jax.grad(lambda k: jnp.sum(fr.conv_then_downsample(x, k, b) ** 2))(k)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0
    g = jax.grad(lambda k: jnp.sum(fr.upsample_then_conv(x, k, b) ** 2))(k)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_unet_fused_resample_parity(monkeypatch):
    """Full net with FUSED_RESAMPLE on == off, shared params."""
    kwargs = dict(
        in_channels=2, resolution=(16, 64), base_channels=8,
        channel_multiplier=(1, 2, 2, 2), num_residual_blocks=(1, 1, 1, 1),
        gn_num_groups=4, attn_num_heads=2, coords_encoding="fourier_features",
    )
    net = EfficientUNet(**kwargs)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 16, 64, 2)), jnp.float32
    )
    t = jnp.asarray([0.3, 2.1], jnp.float32)
    v = net.init(jax.random.key(4), x, t)
    v = jax.tree.map(
        lambda l: jax.random.normal(jax.random.key(l.size % 79), l.shape) * 0.1,
        v,
    )
    monkeypatch.setattr(layers, "FUSED_RESAMPLE", False)
    y_ref = net.apply(v, x, t)
    monkeypatch.setattr(layers, "FUSED_RESAMPLE", True)
    y = net.apply(v, x, t)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
