"""Fused GroupNorm+SiLU Pallas kernel: interpret-mode parity vs fp32 math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu.models.layers import group_norm
from r2dm_tpu.ops.pallas_gn import fused_group_norm_silu, supported


@pytest.mark.parametrize("apply_silu", [True, False])
def test_interpret_parity(apply_silu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((2, 8, 32, 16), dtype=np.float32), jnp.bfloat16
    )
    gain = jnp.asarray(rng.standard_normal(16, dtype=np.float32))
    shift = jnp.asarray(rng.standard_normal(16, dtype=np.float32))
    y = fused_group_norm_silu(
        x, gain, shift, num_groups=4, eps=1e-6, apply_silu=apply_silu,
        interpret=True,
    )
    # fp32 reference (the kernel rounds to bf16 once at the end)
    ref = group_norm(x.astype(jnp.float32), 4, 1e-6, gain, shift)
    if apply_silu:
        ref = ref * jax.nn.sigmoid(ref)
    np.testing.assert_allclose(
        np.asarray(y, dtype=np.float32), np.asarray(ref),
        rtol=2e-2, atol=2e-2,
    )


def test_per_batch_affine():
    """(B, C) gain/shift (the AdaGN conditioning path) must apply per row."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((3, 4, 16, 8), dtype=np.float32), jnp.bfloat16
    )
    gain = jnp.asarray(rng.standard_normal((3, 8), dtype=np.float32))
    shift = jnp.asarray(rng.standard_normal((3, 8), dtype=np.float32))
    y = fused_group_norm_silu(
        x, gain, shift, num_groups=2, eps=1e-6, interpret=True
    )
    for b in range(3):
        ref = group_norm(
            x[b : b + 1].astype(jnp.float32), 2, 1e-6, gain[b], shift[b]
        )
        ref = ref * jax.nn.sigmoid(ref)
        np.testing.assert_allclose(
            np.asarray(y[b : b + 1], dtype=np.float32), np.asarray(ref),
            rtol=2e-2, atol=2e-2,
        )


def test_supported_gate():
    assert supported(jnp.zeros((1, 64, 1024, 64), jnp.bfloat16))
    assert not supported(jnp.zeros((1, 64, 1024, 64), jnp.float32))
    assert not supported(jnp.zeros((1, 256, 1024, 64), jnp.bfloat16))  # slab
