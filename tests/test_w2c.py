"""Width-pair-merged level-1 (ops/w2c.py) parity vs the NHWC path.

The W2C transform is an exact re-expression of the reference level-1 math
(models/efficient_unet.py:254-293 via our NHWC path, itself golden-tested);
these tests assert (a) kernel-expansion correctness per alignment, (b)
GroupNorm phase pooling, (c) full-network equality on shared params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu.models.efficient_unet import EfficientUNet
from r2dm_tpu.models.layers import (
    GroupNorm,
    ResidualBlock,
    RingConv,
    group_norm_coeffs,
)
from r2dm_tpu.ops import w2c


def _rand(key, shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


def _ring_conv_ref(x, kernel, bias):
    """Reference ring conv: wrap-pad W, zero-pad H, valid conv (NHWC)."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
    y = jax.lax.conv_general_dilated(
        xp, kernel, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


@pytest.mark.parametrize("align_in", ["aligned", "offset"])
def test_w2c_conv_matches_ring_conv(align_in):
    B, H, W, C, F = 2, 6, 16, 8, 12
    x = _rand(0, (B, H, W, C))
    kernel = _rand(1, (3, 3, C, F)) * 0.2
    bias = _rand(2, (F,)) * 0.1
    y_ref = _ring_conv_ref(x, kernel, bias)

    # merged input in the requested alignment
    if align_in == "aligned":
        xm = w2c.merge_width_pairs(x)
    else:
        xm = w2c.merge_width_pairs(jnp.roll(x, 1, axis=2))

    conv = RingConv(features=F, data_format="W2C", align_in=align_in)
    variables = {"params": {"conv": {"kernel": kernel, "bias": bias}}}
    ym = conv.apply(variables, xm)

    out_align = "offset" if align_in == "aligned" else "aligned"
    y = w2c.unmerge_width_pairs(ym, out_align)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_w2c_conv1x1_block_diagonal():
    B, H, W, C, F = 2, 4, 8, 6, 10
    x = _rand(3, (B, H, W, C))
    kernel = _rand(4, (1, 1, C, F))
    bias = _rand(5, (F,))
    y_ref = (
        jnp.einsum("bhwc,cf->bhwf", x, kernel[0, 0]) + bias
    )
    conv = RingConv(
        features=F, kernel_size=(1, 1), padding=0, data_format="W2C"
    )
    variables = {"params": {"conv": {"kernel": kernel, "bias": bias}}}
    ym = conv.apply(variables, w2c.merge_width_pairs(x))
    y = w2c.unmerge_width_pairs(ym, "aligned")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_group_norm_phases_pool_across_blocks():
    B, H, W, C, G = 2, 4, 16, 12, 3
    x = _rand(6, (B, H, W, C)) * 3.0 + 0.7
    a_ref, b_ref = group_norm_coeffs(x, G, 1e-6)
    am, bm = group_norm_coeffs(w2c.merge_width_pairs(x), G, 1e-6, phases=2)
    # merged coeffs are the original ones tiled over phases
    np.testing.assert_allclose(np.asarray(am), np.tile(np.asarray(a_ref), 2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bm), np.tile(np.asarray(b_ref), 2), rtol=1e-5, atol=1e-6)

    # and the full module output matches the NHWC GroupNorm
    gn = GroupNorm(num_groups=G, silu=True)
    v = gn.init(jax.random.key(7), x)
    y_ref = gn.apply(v, x)
    gnm = GroupNorm(num_groups=G, silu=True, data_format="W2C")
    ym = gnm.apply(v, w2c.merge_width_pairs(x))
    np.testing.assert_allclose(
        np.asarray(w2c.unmerge_width_pairs(ym, "aligned")),
        np.asarray(y_ref), atol=1e-5,
    )


@pytest.mark.parametrize("in_ch,out_ch", [(8, 8), (16, 8)])
def test_w2c_residual_block_parity(in_ch, out_ch):
    B, H, W = 2, 6, 16
    x = _rand(8, (B, H, W, in_ch))
    emb = _rand(9, (B, 24))
    ref = ResidualBlock(out_channels=out_ch, gn_num_groups=4)
    v = ref.init(jax.random.key(10), x, emb)
    # randomize (conv2 is zero-init -> would mask bugs)
    v = jax.tree.map(
        lambda l: jax.random.normal(jax.random.key(l.size % 97), l.shape) * 0.1,
        v,
    )
    y_ref = ref.apply(v, x, emb)

    blk = ResidualBlock(
        out_channels=out_ch, gn_num_groups=4, data_format="W2C",
        align_in="offset",
    )
    xm = w2c.merge_width_pairs(jnp.roll(x, 1, axis=2))  # offset layout
    ym = blk.apply(v, xm, emb)
    y = w2c.unmerge_width_pairs(ym, "offset")
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_layout_op_conv_impl_matches_reshape(dtype):
    """merge/unmerge lowered as identity-block convs (MXU space-to-depth)
    must equal the reshape formulation BITWISE in both alignments — on the
    v5e the reshape re-tiles at ~100-140 GB/s (probe_level1.py) while the
    conv moves the same bytes through the MXU ~5x faster."""
    x = _rand(20, (2, 4, 16, 6)).astype(dtype)
    old = w2c.LAYOUT_OP_IMPL
    try:
        w2c.LAYOUT_OP_IMPL = "reshape"
        m_ref = w2c.merge_width_pairs(x)
        u_refs = {
            a: w2c.unmerge_width_pairs(m_ref, a) for a in ("aligned", "offset")
        }
        w2c.LAYOUT_OP_IMPL = "conv"
        np.testing.assert_array_equal(
            np.asarray(w2c.merge_width_pairs(x), np.float32),
            np.asarray(m_ref, np.float32),
        )
        for a, u_ref in u_refs.items():
            np.testing.assert_array_equal(
                np.asarray(w2c.unmerge_width_pairs(m_ref, a), np.float32),
                np.asarray(u_ref, np.float32),
                err_msg=a,
            )
    finally:
        w2c.LAYOUT_OP_IMPL = old


def test_phase_concat_matches_channel_concat():
    B, H, W = 1, 2, 8
    a, b = _rand(11, (B, H, W, 4)), _rand(12, (B, H, W, 6))
    m = w2c.phase_concat(w2c.merge_width_pairs(a), w2c.merge_width_pairs(b))
    ref = jnp.concatenate([a, b], axis=-1)
    np.testing.assert_allclose(
        np.asarray(w2c.unmerge_width_pairs(m, "aligned")), np.asarray(ref)
    )


def test_setup_model_width_merge_knob():
    """The inference surface exposes the latency layout; outputs must match
    the default layout on the same checkpoint, and refinenet must reject."""
    from pathlib import Path

    from r2dm_tpu.config import Config, DataConfig, ModelConfig, asdict
    from r2dm_tpu.inference import setup_model

    g = np.load(Path(__file__).parent / "golden" / "tiny_unet_fourier_features.npz")
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    cfg = Config(
        data=DataConfig(resolution=(16, 64)),
        model=ModelConfig(
            base_channels=16, gn_num_groups=4, attn_num_heads=4,
            num_residual_blocks=(1, 1, 1, 1),
        ),
    )
    ckpt = {"cfg": asdict(cfg), "weights": sd, "global_step": 1}
    ddpm_a, _, _ = setup_model(ckpt, ema=False)
    ddpm_b, _, _ = setup_model(ckpt, ema=False, width_merge_l1=True)
    x = jnp.asarray(np.transpose(g["x"], (0, 2, 3, 1)))
    t = jnp.asarray(g["t"])
    ya = ddpm_a.diffusion.apply_fn(ddpm_a.variables, x, t)
    yb = ddpm_b.diffusion.apply_fn(ddpm_b.variables, x, t)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya), atol=2e-5)

    cfg_rn = Config(
        data=DataConfig(resolution=(16, 64)),
        model=ModelConfig(architecture="refinenet", base_channels=8,
                          channel_multiplier=(1, 2, 2, 2)),
    )
    with pytest.raises(ValueError, match="EfficientUNet-only"):
        from r2dm_tpu.inference import build_model

        build_model(cfg_rn, width_merge_l1=True)


@pytest.mark.parametrize("coords", [None, "fourier_features"])
def test_unet_width_merge_parity(coords):
    """Full-net: width_merge_l1=True equals the NHWC net on shared params."""
    kwargs = dict(
        in_channels=2,
        resolution=(16, 64),
        base_channels=8,
        channel_multiplier=(1, 2, 2, 2),
        num_residual_blocks=(2, 1, 1, 1),
        gn_num_groups=4,
        attn_num_heads=2,
        coords_encoding=coords,
    )
    net = EfficientUNet(**kwargs)
    netm = EfficientUNet(width_merge_l1=True, **kwargs)
    x = _rand(13, (2, 16, 64, 2))
    t = jnp.asarray([0.3, 2.1], jnp.float32)
    v = net.init(jax.random.key(14), x, t)
    vm = netm.init(jax.random.key(14), x, t)
    # identical parameter trees (shapes and paths) -> checkpoints interchange
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vm)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(vm)):
        assert a.shape == b.shape
    # randomize shared params (zero-init convs would mask level-1 bugs)
    v = jax.tree.map(
        lambda l: jax.random.normal(jax.random.key(l.size % 89), l.shape) * 0.1,
        v,
    )
    y = net.apply(v, x, t)
    ym = netm.apply(v, x, t)
    np.testing.assert_allclose(np.asarray(ym), np.asarray(y), atol=2e-4)
