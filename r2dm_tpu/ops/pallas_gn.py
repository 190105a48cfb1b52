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

STATUS (round-1 measurement, TPU v5e): 2x SLOWER than the XLA lowering in
the full U-Net (44.97 s vs 21.70 s for 256-step b32 sampling) — pulling the
norm out of XLA's producer/consumer fusion graph costs more than the saved
activation read, and the sequential per-batch DMA does not overlap compute.
Kept as an off-by-default reference kernel (USE_PALLAS_GN); the profitable
Pallas target here is a fused residual-block kernel (norm + SiLU + conv +
skip in one VMEM residency), not a standalone norm.
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
    p = max(1, 128 // C)  # pixel-packing factor used by the kernel
    lanes_ok = (128 % C == 0) if C < 128 else (C % 128 == 0)
    return (
        x.dtype == jnp.bfloat16
        and (H * W * C) * 2 <= MAX_SLAB_BYTES
        and C % 8 == 0
        and (H * W) % max(8, p) == 0
        and lanes_ok
    )


def _gn_silu_kernel(
    x_hbm, affine_ref, out_hbm, scratch, sem_in, sem_out,
    *, channels: int, num_groups: int, eps: float, apply_silu: bool,
):
    """Per-grid-step: one batch row of the packed (rows, p*C) view where
    p = 128//C pixels share a lane row (HBM slices need 128-aligned lanes).
    affine_ref: (1, 2, p*C) f32 (tiled gain, shift) applied AFTER
    normalization: y = GN(x) * gain + shift."""
    b = pl.program_id(0)
    copy_in = pltpu.make_async_copy(x_hbm.at[b], scratch, sem_in)
    copy_in.start()
    copy_in.wait()

    rows, Cp = scratch.shape
    C, G = channels, num_groups
    # chunked fp32 passes: the slab stays bf16 in VMEM; only ~2 MB of fp32
    # temporaries live at a time (whole-slab fp32 would blow scoped VMEM)
    chunk = min(rows, max(8, (2 * 1024 * 1024) // (Cp * 4)))
    while rows % chunk:
        chunk //= 2
    n_chunks = rows // chunk

    s1 = jnp.zeros((1, Cp), jnp.float32)
    s2 = jnp.zeros((1, Cp), jnp.float32)
    for i in range(n_chunks):
        part = scratch[pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        s1 = s1 + jnp.sum(part, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(part * part, axis=0, keepdims=True)
    # group combine via a one-hot membership matmul (Mosaic has no
    # lane-splitting reshape): lane j belongs to group (j % C) // (C // G)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Cp, G), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (Cp, G), 1)
    member = ((lane % C) // (C // G) == grp).astype(jnp.float32)  # (Cp, G)
    cnt = rows * (Cp // G)  # == H*W*C/G of the unpacked view
    mean_g = jnp.dot(s1, member, preferred_element_type=jnp.float32) / cnt  # (1, G)
    ex2_g = jnp.dot(s2, member, preferred_element_type=jnp.float32) / cnt
    var_g = jnp.maximum(ex2_g - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)  # (1, G)
    # broadcast back to lanes
    mean_c = jnp.dot(mean_g, member.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, member.T, preferred_element_type=jnp.float32)
    gain = affine_ref[0, 0, :].reshape(1, Cp).astype(jnp.float32)
    shift = affine_ref[0, 1, :].reshape(1, Cp).astype(jnp.float32)
    a = inv_c * gain
    bb = (-mean_c * inv_c) * gain + shift
    for i in range(n_chunks):
        part = scratch[pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = part * a + bb
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        scratch[pl.ds(i * chunk, chunk), :] = y.astype(scratch.dtype)

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
    # pack p pixels per 128-lane row so HBM slices stay lane-aligned
    p = max(1, 128 // C)
    rows = (H * W) // p
    Cp = C * p
    affine = jnp.stack(
        [jnp.tile(gain, (1, p)), jnp.tile(shift, (1, p))], axis=1
    ).astype(jnp.float32)  # (B, 2, Cp)

    kernel = partial(
        _gn_silu_kernel, channels=C, num_groups=num_groups, eps=eps,
        apply_silu=apply_silu,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, rows, Cp), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; manual DMA
            pl.BlockSpec((1, 2, Cp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((rows, Cp), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.reshape(B, rows, Cp), affine)
    return out.reshape(B, H, W, C)
