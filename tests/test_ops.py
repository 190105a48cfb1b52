"""Golden-value tests for the ops layer vs the reference implementation.

Fixtures in tests/golden/*.npz were captured from /root/reference (torch CPU)
by tools/gen_goldens.py. Reference tensors are NCHW; ours are NHWC.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu.ops import (
    fir_resample,
    fourier_feature_frequencies,
    fourier_features,
    generate_polar_coords,
    get_hdl64e_linear_ray_angles,
    ring_pad,
    spherical_harmonics,
    timestep_embedding,
)

GOLDEN = Path(__file__).parent / "golden"


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


@pytest.fixture(scope="module")
def resample_golden():
    return np.load(GOLDEN / "resample.npz")


RESAMPLE_CASES = [
    ("down2", dict(down=2, ring=True)),
    ("up2", dict(up=2, ring=True)),
    ("down2_noring", dict(down=2, ring=False)),
    ("up2_noring", dict(up=2, ring=False)),
    ("up2_h", dict(up=2, ring=True, direction="h")),
    ("down2_w", dict(down=2, ring=True, direction="w")),
    ("up4", dict(up=4, ring=True)),
    ("down4", dict(down=4, ring=True)),
]


@pytest.mark.parametrize("name,kwargs", RESAMPLE_CASES)
def test_fir_resample_matches_reference(resample_golden, name, kwargs):
    x = nchw_to_nhwc(resample_golden["x"])
    expected = nchw_to_nhwc(resample_golden[name])
    got = np.asarray(fir_resample(jnp.asarray(x), **kwargs))
    assert got.shape == expected.shape, (name, got.shape, expected.shape)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "kwargs",
    [dict(up=2, ring=True), dict(down=2, ring=False), dict(up=4, ring=True)],
)
def test_fir_2d_fused_matches_separable(kwargs):
    """The 2-D depthwise lowering is an exact drop-in for the separable one
    (values AND gradients), so either FIR_2D_FUSED setting is safe."""
    import jax

    from r2dm_tpu.ops import resample as rs

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 5), dtype=np.float32))

    def run(fused):
        old = rs.FIR_2D_FUSED
        rs.FIR_2D_FUSED = fused
        rs.fir_resample.clear_cache()  # flag is read at trace time
        try:
            val, grad = jax.value_and_grad(
                lambda v: jnp.sum(jnp.sin(rs.fir_resample(v, **kwargs)))
            )(x)
            return float(val), np.asarray(grad)
        finally:
            rs.FIR_2D_FUSED = old
            rs.fir_resample.clear_cache()

    v_fused, g_fused = run(True)
    v_sep, g_sep = run(False)
    np.testing.assert_allclose(v_fused, v_sep, rtol=1e-6)
    np.testing.assert_allclose(g_fused, g_sep, rtol=1e-5, atol=1e-6)


def test_ring_pad_matches_reference():
    g = np.load(GOLDEN / "ops_misc.npz")
    x = nchw_to_nhwc(g["x"])
    expected = nchw_to_nhwc(g["pad_out"])
    got = np.asarray(ring_pad(jnp.asarray(x), 2, ring=True))
    np.testing.assert_allclose(got, expected, atol=0)


def test_ring_conv_matches_reference():
    from r2dm_tpu.models.layers import RingConv

    g = np.load(GOLDEN / "ops_misc.npz")
    x = nchw_to_nhwc(g["x"])
    kernel = np.transpose(g["conv_w"], (2, 3, 1, 0))
    variables = {"params": {"conv": {"kernel": kernel, "bias": g["conv_b"]}}}
    got = RingConv(features=10, ring=True).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), nchw_to_nhwc(g["conv_out"]), rtol=1e-5, atol=1e-5
    )


def test_adagn_matches_reference():
    from r2dm_tpu.models.layers import AdaGN

    g = np.load(GOLDEN / "ops_misc.npz")
    x = nchw_to_nhwc(g["x"])
    variables = {
        "params": {"proj": {"kernel": g["adagn_w"].T, "bias": g["adagn_b"]}}
    }
    got = AdaGN(num_groups=3, eps=1e-5).apply(
        variables, jnp.asarray(x), jnp.asarray(g["emb"])
    )
    np.testing.assert_allclose(
        np.asarray(got), nchw_to_nhwc(g["adagn_out"]), rtol=1e-4, atol=1e-5
    )


def test_sinusoidal_embedding_matches_reference():
    g = np.load(GOLDEN / "ops_misc.npz")
    got = np.asarray(timestep_embedding(jnp.asarray(g["t"]), 16))
    np.testing.assert_allclose(got, g["spe_out"], rtol=1e-5, atol=1e-6)


def test_polar_coords_matches_reference():
    g = np.load(GOLDEN / "encodings.npz")
    got = generate_polar_coords(16, 64)  # (H, W, 2)
    expected = np.transpose(g["coords"][0], (1, 2, 0))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_hdl64e_angles_matches_reference():
    g = np.load(GOLDEN / "encodings.npz")
    got = get_hdl64e_linear_ray_angles(16, 64)
    expected = np.transpose(g["hdl64e"][0], (1, 2, 0))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_spherical_harmonics_matches_reference():
    g = np.load(GOLDEN / "encodings.npz")
    coords = np.transpose(g["coords"][0], (1, 2, 0))
    got = np.asarray(spherical_harmonics(jnp.asarray(coords), levels=5))
    expected = np.transpose(g["sh_out"][0], (1, 2, 0))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_fourier_features_matches_reference():
    g = np.load(GOLDEN / "encodings.npz")
    coords = np.transpose(g["coords"][0], (1, 2, 0))
    freqs = fourier_feature_frequencies((16, 64))
    # reference stores freqs as conv weight (n,2,1,1)
    np.testing.assert_allclose(freqs, g["ff_freqs"][:, :, 0, 0], atol=0)
    got = np.asarray(fourier_features(jnp.asarray(coords), jnp.asarray(freqs)))
    expected = np.transpose(g["ff_out"][0], (1, 2, 0))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_group_norm_matches_torch_semantics():
    # closed-form check: per-group zero mean / unit var
    from r2dm_tpu.models.layers import group_norm

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 6, 8)).astype(np.float32) * 3 + 1
    y = np.asarray(group_norm(jnp.asarray(x), num_groups=2, eps=1e-6))
    yg = y.reshape(2, 4, 6, 2, 4)
    np.testing.assert_allclose(yg.mean(axis=(1, 2, 4)), 0.0, atol=1e-5)
    np.testing.assert_allclose(yg.var(axis=(1, 2, 4)), 1.0, rtol=1e-4, atol=1e-4)


def test_gn_act_follow_dtype_semantics():
    """GN_ACT_COMPUTE_DTYPE=None (default): the FMA+SiLU pass follows the
    activation dtype. fp32 inputs must be bit-identical to the forced-fp32
    path (golden parity is untouched); bf16 inputs must stay accurate even
    with |mean| >> std (the stats are still computed in fp32 — only the
    final normalize/affine math rounds in bf16)."""
    from r2dm_tpu.models import layers

    rng = np.random.default_rng(1)
    # moderate common-mode offset, the realistic post-conv regime
    # (|mean|/std of O(1)). NOTE the known limit of the bf16 pass: the
    # folded FMA y = x*a + b cancels b ~= -mean*gain/std against x*a, so
    # its error grows as |b| * 2^-8 — at |mean|/std >> 10 (never seen in
    # this model; in-model deviation measured ~1 ulp) fp32 would be needed.
    x32 = (rng.standard_normal((2, 4, 8, 8)) + 2.0).astype(np.float32)
    gain = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal(8).astype(np.float32))

    def gn(x, forced):
        old = layers.GN_ACT_COMPUTE_DTYPE
        layers.GN_ACT_COMPUTE_DTYPE = forced
        try:
            return np.asarray(
                layers._gn_act(x, 2, 1e-6, gain, shift, silu=True).astype(
                    jnp.float32
                )
            )
        finally:
            layers.GN_ACT_COMPUTE_DTYPE = old

    assert layers.GN_ACT_COMPUTE_DTYPE is None  # the shipped default
    # fp32 model: default == forced fp32, bitwise
    np.testing.assert_array_equal(
        gn(jnp.asarray(x32), None), gn(jnp.asarray(x32), jnp.float32)
    )
    # bf16 model: default == forced bf16, and within ~1 bf16 ulp of the
    # fp32-computed pass on the same bf16 input (stats stay fp32, so the
    # mean-offset cancellation does NOT blow up)
    xb = jnp.asarray(x32).astype(jnp.bfloat16)
    np.testing.assert_array_equal(gn(xb, None), gn(xb, jnp.bfloat16))
    ref = gn(xb, jnp.float32)
    got = gn(xb, None)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
