"""Pallas TPU kernel: fused (affine+SiLU) + 3x3 ring convolution, lane-packed.

The level-1 U-Net convolutions have 64 output channels — half of the MXU's
128 lanes — capping XLA's lowering at ~44% MFU (ablation, batch 256). This
kernel recovers the lanes by width-pair packing INSIDE VMEM (no HBM-layout
cost, unlike the model-level W2C path): the (W, C) = (1024, 64) plane is
viewed as (512, 128) (a free reshape — the memory is identical), and the
3x3 ring conv becomes 6 matmuls of [ROWS*512, 128] @ [128, 128] against the
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

Grid: (B, H/ROWS). v5e scoped VMEM is 16 MB (measured: a whole 8.7 MB
level-1 image plus tap buffers overflows), so each step DMAs an
overlapping (ROWS+2)-row halo window from HBM manually (overlapping
windows are inexpressible with standard BlockSpecs) into a double-buffered
scratch — the next window's DMA is issued before computing the current one,
hiding the copy behind the 6 tap matmuls. Ring shifts are slice+concat
(Mosaic's vector rotate is 32-bit-only; bf16 data).

STATUS (round 2, measured on the v5e): NEGATIVE — correct on-chip
(max|err| 3e-3 bf16) but the integrated b256 forward is 2.0x SLOWER with
the kernel than XLA's lowering (4.08 vs 2.10 ms/img). The VMEM cost
decomposition: scoped VMEM is 16 MB, capping row blocks at 8 (4 for the
256-merged-channel concat conv); at that tile size the per-step fixed
costs — O/O2 buffer construction (3 VMEM copy passes), the fp32 prologue
intermediate, DMA issue/wait — total ~14 us against ~4 us of tap-matmul
compute. The MXU lane gain (44% -> ~75% potential) cannot repay that
data movement. Kept OFF (USE_PALLAS_RESCONV=False) as a documented
negative result with parity tests; revisit only on hardware with larger
VMEM or a Mosaic that fuses the shifts into matmul operand reads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import w2c

ROWS = 8  # output rows per grid step (halved for wide inputs, see _rows)


def _rows(C2: int) -> int:
    """Row-block size: scoped VMEM is 16 MB, so wide inputs (merged 256ch,
    e.g. the u_block1 concat conv) use half-height windows."""
    return ROWS if C2 <= 128 else ROWS // 2


def supported(x, features: int) -> bool:
    """Shapes this kernel handles: lane-aligned merged channels, H a
    multiple of the row block, VMEM-sized windows."""
    if len(x.shape) != 4:
        return False
    B, H, W, C = x.shape
    rows = _rows(2 * C)
    window_bytes = (rows + 2) * (W // 2) * 2 * C * x.dtype.itemsize
    return (
        W % 2 == 0
        and (2 * C) % 128 == 0
        and (2 * features) % 128 == 0
        and H % rows == 0
        and W // 2 >= 8
        and window_bytes <= 2 * 1024 * 1024  # x2 buffers + O/O2/s within 16M
    )


def _kernel(
    x_hbm, ab_ref, km_ref, bias_ref, o_ref, win, sem,
    *, rows, apply_act, out_dtype,
):
    """One (batch, row-block) step with double-buffered halo-window DMA.

    x_hbm:   (B, H+2, Wm, 2C) in HBM/ANY; rows 0 and H+1 are zero pads
    ab_ref:  (1, 2, 2C)   fp32 prologue coeffs [a; b] for this batch
    km_ref:  (6, 2C, 2F)  expanded kernel, taps (kh, kw) flattened
    bias_ref:(1, 2F)
    o_ref:   (1, rows, Wm, 2F)
    win:     (2, rows+2, Wm, 2C) VMEM scratch (double buffer)
    sem:     (2,) DMA semaphores
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    n_b = pl.num_programs(0)
    n_i = pl.num_programs(1)
    step = bi * n_i + i
    slot = jax.lax.rem(step, 2)
    next_slot = jax.lax.rem(step + 1, 2)
    Wm = o_ref.shape[2]
    C2 = km_ref.shape[1]
    F2 = km_ref.shape[2]
    C = C2 // 2

    def window_copy(b, blk, to_slot):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(blk * rows, rows + 2)],
            win.at[to_slot],
            sem.at[to_slot],
        )

    # warm-up: the very first step issues its own DMA
    @pl.when(step == 0)
    def _():
        window_copy(bi, i, slot).start()

    # prefetch the next window while this one computes
    nxt = step + 1
    @pl.when(nxt < n_b * n_i)
    def _():
        nb = nxt // n_i
        ni = jax.lax.rem(nxt, n_i)
        window_copy(nb, ni, next_slot).start()

    window_copy(bi, i, slot).wait()
    x = win[slot]  # (rows+2, Wm, 2C)

    if apply_act:
        a = ab_ref[0, 0].astype(jnp.float32)
        b = ab_ref[0, 1].astype(jnp.float32)
        s = x.astype(jnp.float32) * a + b
        s = (s * jax.nn.sigmoid(s)).astype(x.dtype)
        # zero H padding applies AFTER the activation (silu(b) != 0): mask
        # the global pad rows (window row 0 of the first block, row rows+1
        # of the last) back to zero
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
        valid = jnp.logical_and(
            jnp.logical_or(i > 0, row_ids > 0),
            jnp.logical_or(i < n_i - 1, row_ids < rows + 1),
        )
        s = jnp.where(valid, s, jnp.zeros_like(s))
    else:
        s = x  # pad rows are already zero

    # offset-pair buffer: O[h, w', :C] = flat s[h, 2w'-1] (ring wrap),
    # O[h, w', C:] = flat s[h, 2w'] — lane-half swap + ring shift, written
    # as slice+concat (Mosaic's rotate supports 32-bit element types only)
    p1 = s[:, :, C:]
    o_lo = jnp.concatenate([p1[:, Wm - 1 :, :], p1[:, : Wm - 1, :]], axis=1)
    O = jnp.concatenate([o_lo, s[:, :, :C]], axis=2)  # (rows+2, Wm, 2C)
    # second W tap reads O[w'+1]; O is Wm-periodic under the ring
    O2 = jnp.concatenate([O[:, 1:, :], O[:, :1, :]], axis=1)

    acc = jnp.zeros((rows * Wm, F2), jnp.float32)
    for kh in range(3):
        acc += jnp.dot(
            O[kh : kh + rows].reshape(rows * Wm, C2),
            km_ref[2 * kh],
            preferred_element_type=jnp.float32,
        )
        acc += jnp.dot(
            O2[kh : kh + rows].reshape(rows * Wm, C2),
            km_ref[2 * kh + 1],
            preferred_element_type=jnp.float32,
        )
    acc += bias_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(rows, Wm, F2).astype(out_dtype)


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

    rows = _rows(2 * C)
    out = pl.pallas_call(
        functools.partial(
            _kernel, rows=rows, apply_act=apply_act, out_dtype=x.dtype
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Wm, 2 * F), x.dtype),
        grid=(B, H // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # halo windows via DMA
            pl.BlockSpec(
                (1, 2, 2 * C), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (6, 2 * C, 2 * F), lambda bi, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2 * F), lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, Wm, 2 * F), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, Wm, 2 * C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xm, ab, km, bias2)
    return out.reshape(B, H, W, F)
