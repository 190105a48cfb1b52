"""Pallas TPU kernel: fused (affine+SiLU) + 3x3 ring convolution, lane-packed.

The level-1 U-Net convolutions have 64 output channels — half of the MXU's
128 lanes — capping XLA's lowering at ~44% MFU (ablation, batch 256). This
kernel recovers the lanes by width-pair packing INSIDE VMEM (no HBM-layout
cost, unlike the model-level W2C path): the (W, C) = (1024, 64) plane is
viewed as (512, 128) (a free reshape — the memory is identical), and the
3x3 ring conv becomes 6 matmuls of [H*512, 128] @ [128, 128] against the
block-expanded kernel (ops/w2c.py math, offset-pair taps) — 1.33x FLOPs at
~2x lane occupancy — plus the GroupNorm/AdaGN-SiLU prologue fused into the
conv's VMEM residency (one fewer full-activation HBM round trip).

Semantics (NHWC, behavior-matching the reference ResidualBlock inner ops,
models/efficient_unet.py:56-110 / models/ops.py:149-173):

    y = ring_conv3x3(silu(x * a + b), kernel) + bias      # apply_act=True
    y = ring_conv3x3(x, kernel) + bias                     # apply_act=False

with a, b per-(batch, channel) fp32 (the folded GN/AdaGN coefficients from
models/layers.group_norm_coeffs), zero H padding applied AFTER the
activation (matching Pad-inside-Conv2d), circular W padding.

Grid: (B,) — one image per step (level-1 image ≈ 8.7 MB bf16 merged, well
inside v5e VMEM); Mosaic double-buffers the HBM→VMEM streams across batch
steps. Per step: prologue + H-pad masking, build the offset-pair buffer O
(lane-half swap + ring roll; O is Wm-periodic so both W taps read it in
place), 6 tap matmuls accumulated in fp32.

Inference-gated (no VJP yet): enabled on the sampling/bench path via
models.layers.USE_PALLAS_RESCONV; the training path keeps the XLA lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import w2c


def supported(x: jnp.ndarray, features: int) -> bool:
    """Shapes this kernel handles: lane-aligned merged channels, and a
    merged image that comfortably fits VMEM alongside its tap buffers."""
    if x.ndim != 4:
        return False
    B, H, W, C = x.shape
    merged_bytes = (H + 2) * (W // 2) * 2 * C * x.dtype.itemsize
    return (
        W % 2 == 0
        and (2 * C) % 128 == 0
        and (2 * features) % 128 == 0
        and W // 2 >= 8
        and merged_bytes <= 24 * 1024 * 1024
    )


def _kernel(x_ref, ab_ref, km_ref, bias_ref, o_ref, *, apply_act, out_dtype):
    """One batch-element step.

    x_ref:   (1, H+2, Wm, 2C)  zero-padded rows 0 and H+1, merged layout
    ab_ref:  (1, 2, 2C)        fp32 prologue coeffs [a; b] for this batch
    km_ref:  (6, 2C, 2F)       expanded kernel, taps (kh, kw) flattened
    bias_ref:(1, 2F)
    o_ref:   (1, H, Wm, 2F)
    """
    Hp = x_ref.shape[1]  # H + 2
    Wm = x_ref.shape[2]
    C2 = x_ref.shape[3]
    F2 = km_ref.shape[2]
    C = C2 // 2
    H = Hp - 2

    x = x_ref[0]  # (H+2, Wm, 2C)
    if apply_act:
        a = ab_ref[0, 0].astype(jnp.float32)
        b = ab_ref[0, 1].astype(jnp.float32)
        s = x.astype(jnp.float32) * a + b
        s = (s * jax.nn.sigmoid(s)).astype(x.dtype)
        # zero H padding applies AFTER the activation (silu(b) != 0): mask
        # the two pad rows back to zero
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (Hp, 1, 1), 0)
        s = jnp.where((row_ids > 0) & (row_ids < Hp - 1), s, jnp.zeros_like(s))
    else:
        s = x  # pad rows are already zero

    # offset-pair buffer: O[h, w', :C] = flat s[h, 2w'-1] (ring wrap),
    # O[h, w', C:] = flat s[h, 2w'] — i.e. lane-half swap + ring roll
    o_lo = pltpu.roll(s[:, :, C:], 1, 1)
    o_hi = s[:, :, :C]
    O = jnp.concatenate([o_lo, o_hi], axis=2)  # (H+2, Wm, 2C)
    # second W tap reads O[w'+1]; O is Wm-periodic under the ring
    # (pltpu.roll requires a non-negative shift: Wm - 1 == -1 mod Wm)
    O2 = pltpu.roll(O, Wm - 1, 1)

    acc = jnp.zeros((H * Wm, F2), jnp.float32)
    for kh in range(3):
        acc += jnp.dot(
            O[kh : kh + H].reshape(H * Wm, C2),
            km_ref[2 * kh],
            preferred_element_type=jnp.float32,
        )
        acc += jnp.dot(
            O2[kh : kh + H].reshape(H * Wm, C2),
            km_ref[2 * kh + 1],
            preferred_element_type=jnp.float32,
        )
    acc += bias_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(H, Wm, F2).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("apply_act", "interpret"))
def fused_act_ringconv(
    x: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    apply_act: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = ring_conv3x3(silu(x*a + b), kernel) + bias, NHWC.

    x (B, H, W, C); a, b (B, C) fp32; kernel (3, 3, C, F) HWIO; bias (F,).
    """
    B, H, W, C = x.shape
    F = kernel.shape[-1]
    Wm = W // 2
    km = w2c.expand_kernel_3x3(kernel.astype(x.dtype))  # (3, 2, 2C, 2F)
    km = km.reshape(6, 2 * C, 2 * F)
    ab = jnp.stack([a, b], axis=1).astype(jnp.float32)  # (B, 2, C)
    ab = jnp.concatenate([ab, ab], axis=-1)  # tile over phases -> (B, 2, 2C)
    bias2 = jnp.tile(bias.astype(jnp.float32), 2)[None]  # (1, 2F)

    # merged view (free reshape) + one zero halo row top/bottom
    xm = x.reshape(B, H, Wm, 2 * C)
    xm = jnp.pad(xm, ((0, 0), (1, 1), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, apply_act=apply_act, out_dtype=x.dtype),
        out_shape=jax.ShapeDtypeStruct((B, H, Wm, 2 * F), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H + 2, Wm, 2 * C), lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, 2 * C), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (6, 2 * C, 2 * F), lambda bi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 2 * F), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, Wm, 2 * F), lambda bi: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(xm, ab, km, bias2)
    return out.reshape(B, H, W, F)
