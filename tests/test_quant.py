"""W8A8 quantized ring-conv lane (ops/quant.py + layers.QUANT_CONV).

Checks (CPU): (1) the padadd-style s32 wrap corrections are bit-identical
to the materialized ring-pad int8 conv, (2) the dequantized output tracks
the fp conv within int8 error bounds, (3) the full EfficientUNet forward
under the flag runs and stays close to the fp forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu.models import layers
from r2dm_tpu.ops import quant


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_ring_wrap_exact_vs_materialized_pad(rng):
    B, H, W, C, F = 2, 6, 16, 12, 10
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, C, F)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((F,)), jnp.float32)

    got = quant.ring_conv_w8a8(x, k, b, out_dtype=jnp.float32)

    # naive: same quantization, materialized wrap pad, one int8 conv
    xq, xs = quant.act_qparams(x)
    kq, ks = quant.weight_qparams(k)
    xp = jnp.pad(xq, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
    y = jax.lax.conv_general_dilated(
        xp, kq, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    want = y.astype(jnp.float32) * (xs * ks) + b
    # integer parts are bit-identical; the fp epilogue is the same ops in
    # the same order, so exact equality is expected
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dequantized_tracks_fp_conv(rng):
    B, H, W, C, F = 2, 8, 32, 16, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, C, F)) * 0.1, jnp.float32)

    got = np.asarray(quant.ring_conv_w8a8(x, k, None, out_dtype=jnp.float32))
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
    want = np.asarray(
        jax.lax.conv_general_dilated(
            xp, k, (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel  # int8 rounding noise, not a broken lowering


def test_unet_forward_under_w8a8_flag(rng):
    from r2dm_tpu.models.efficient_unet import EfficientUNet

    net = EfficientUNet(
        in_channels=2,
        resolution=(16, 64),
        base_channels=8,
        channel_multiplier=(1, 2, 2, 2),
        num_residual_blocks=(1, 1, 1, 1),
        gn_num_groups=4,
        attn_num_heads=2,
        coords_encoding=None,
    )
    x = jnp.asarray(rng.standard_normal((2, 16, 64, 2)), jnp.float32)
    t = jnp.asarray([0.2, 0.8], jnp.float32)
    params = net.init(jax.random.key(0), x, t)
    # the output conv is zero-init (whole-net output would be identically
    # zero): re-sample every leaf so the comparison is non-vacuous
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.key(1), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [0.1 * jax.random.normal(k, p.shape, p.dtype) for k, p in zip(keys, leaves)],
    )

    ref = np.asarray(net.apply(params, x, t))
    assert np.linalg.norm(ref) > 0
    assert layers.QUANT_CONV is None
    layers.QUANT_CONV = "w8a8"
    try:
        got = np.asarray(net.apply(params, x, t))
    finally:
        layers.QUANT_CONV = None

    assert np.isfinite(got).all()
    # zero-init output convs keep absolute scales tiny; compare correlation
    # + relative error rather than allclose
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
    cos = float(
        (got.ravel() @ ref.ravel())
        / (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-12)
    )
    assert rel < 0.25 and cos > 0.97, (rel, cos)
