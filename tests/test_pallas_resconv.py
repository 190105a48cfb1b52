"""Fused act+ring-conv Pallas kernel (ops/pallas_resconv.py): parity vs the
XLA lowering (interpret mode on CPU) and the ResidualBlock integration gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu.models import layers
from r2dm_tpu.ops import pallas_resconv


def _ref(x, a, b, k, bias, act=True):
    if act:
        s = x * a[:, None, None, :] + b[:, None, None, :]
        s = s * jax.nn.sigmoid(s)
    else:
        s = x
    sp = jnp.pad(s, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
    y = jax.lax.conv_general_dilated(
        sp, k, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


@pytest.mark.parametrize("apply_act", [True, False])
@pytest.mark.parametrize("cin", [64, 128])
def test_fused_act_ringconv_parity(apply_act, cin):
    rng = np.random.default_rng(0)
    B, H, W, F = 2, 8, 64, 64
    x = jnp.asarray(rng.standard_normal((B, H, W, cin), np.float32))
    a = jnp.asarray(rng.standard_normal((B, cin), np.float32) * 0.5 + 1.0)
    b = jnp.asarray(rng.standard_normal((B, cin), np.float32) * 0.2)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, F), np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((F,), np.float32) * 0.1)
    y_ref = _ref(x, a, b, k, bias, apply_act)
    y = pallas_resconv.fused_act_ringconv(
        x, a, b, k, bias, apply_act=apply_act, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4)


def test_supported_gate():
    # ShapeDtypeStructs: supported() reads shape/dtype only (and big zeros
    # allocations would dominate the test's runtime)
    def spec(shape, dtype=jnp.bfloat16):
        return jax.ShapeDtypeStruct(shape, dtype)

    assert pallas_resconv.supported(spec((2, 64, 1024, 64)), 64)
    assert not pallas_resconv.supported(spec((2, 64, 1023, 64)), 64)  # odd W
    assert not pallas_resconv.supported(spec((2, 64, 1024, 34)), 64)  # lanes
    assert not pallas_resconv.supported(spec((2, 64, 1024, 64)), 34)
    # a merged image too large for VMEM residency must be rejected
    assert not pallas_resconv.supported(spec((1, 512, 4096, 64), jnp.float32), 64)


def test_residual_block_fused_path_matches_xla(monkeypatch):
    """ResidualBlock with USE_PALLAS_RESCONV (interpret) == the XLA path."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 64, 64), np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 24), np.float32))
    blk = layers.ResidualBlock(out_channels=64, gn_num_groups=8)
    v = blk.init(jax.random.key(0), x, emb)
    v = jax.tree.map(
        lambda l: jax.random.normal(jax.random.key(l.size % 83), l.shape) * 0.1,
        v,
    )
    y_ref = blk.apply(v, x, emb)
    monkeypatch.setattr(layers, "USE_PALLAS_RESCONV", True)
    monkeypatch.setattr(layers, "PALLAS_RESCONV_INTERPRET", True)
    y = blk.apply(v, x, emb)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4)
