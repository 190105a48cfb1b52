"""Fused GroupNorm(+conditioning)+SiLU as a Pallas TPU kernel.

Motivation (round-1 profile): GroupNorm statistics + the normalize/SiLU
elementwise chain dominate the U-Net's non-conv time. The XLA lowering costs
2 reads + 1 write of the activation (fused stats pass, then FMA+SiLU pass);
this kernel holds one batch-row's slab resident in VMEM and does 1 read +
1 write: DMA in -> fp32 channel sums -> fold (group stats, affine, optional
AdaGN conditioning) into per-channel (a, b) -> y = silu(x*a + b) -> DMA out.

Applicable when the per-sample slab fits VMEM (H*W*C*2B <= ~10 MB — true for
every level of the 64x1024 config-H U-Net in bf16). Callers fall back to the
XLA path otherwise (models/layers.py gates on this).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-sample slab budget (bytes) for VMEM residency; half of the ~16 MB/core
MAX_SLAB_BYTES = 10 * 1024 * 1024


def supported(x: jnp.ndarray) -> bool:
    B, H, W, C = x.shape
    return (
        x.dtype == jnp.bfloat16
        and (H * W * C) * 2 <= MAX_SLAB_BYTES
        and C % 8 == 0
        and (H * W) % 8 == 0
    )


def _gn_silu_kernel(
    x_hbm, affine_ref, out_hbm, scratch, sem_in, sem_out,
    *, num_groups: int, eps: float, apply_silu: bool,
):
    """Per-grid-step: one batch row. affine_ref: (2, C) f32 rows (gain, shift)
    applied AFTER normalization: y = GN(x) * gain + shift."""
    b = pl.program_id(0)
    copy_in = pltpu.make_async_copy(x_hbm.at[b], scratch, sem_in)
    copy_in.start()
    copy_in.wait()

    xf = scratch[...].astype(jnp.float32)  # (HW, C)
    HW, C = xf.shape
    G = num_groups
    s1 = jnp.sum(xf, axis=0).reshape(G, C // G)
    s2 = jnp.sum(xf * xf, axis=0).reshape(G, C // G)
    cnt = HW * (C // G)
    mean = jnp.sum(s1, axis=1, keepdims=True) / cnt  # (G, 1)
    ex2 = jnp.sum(s2, axis=1, keepdims=True) / cnt
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)  # (G, 1)
    gain = affine_ref[0, 0, :].reshape(1, C).astype(jnp.float32)
    shift = affine_ref[0, 1, :].reshape(1, C).astype(jnp.float32)
    a = jnp.broadcast_to(inv, (G, C // G)).reshape(1, C) * gain
    bb = jnp.broadcast_to(-mean * inv, (G, C // G)).reshape(1, C) * gain + shift
    y = xf * a + bb
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    scratch[...] = y.astype(scratch.dtype)

    copy_out = pltpu.make_async_copy(scratch, out_hbm.at[b], sem_out)
    copy_out.start()
    copy_out.wait()


def fused_group_norm_silu(
    x: jnp.ndarray,
    gain: jnp.ndarray,
    shift: jnp.ndarray,
    num_groups: int,
    eps: float,
    apply_silu: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """silu((x - mean_g)/std_g * gain + shift) with per-(B, C) fp32
    gain/shift (broadcast (C,) accepted). x: (B, H, W, C) bf16."""
    B, H, W, C = x.shape
    if gain.ndim == 1:
        gain = jnp.broadcast_to(gain[None], (B, C))
    if shift.ndim == 1:
        shift = jnp.broadcast_to(shift[None], (B, C))
    affine = jnp.stack([gain, shift], axis=1).astype(jnp.float32)  # (B, 2, C)

    kernel = partial(
        _gn_silu_kernel, num_groups=num_groups, eps=eps, apply_silu=apply_silu
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H * W, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec((1, 2, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((H * W, C), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.reshape(B, H * W, C), affine)
    return out.reshape(B, H, W, C)
