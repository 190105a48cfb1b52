"""W8A8 int8 quantized ring convolution (serving-lane experiment).

TPU v5e's MXU runs s8 x s8 -> s32 at 2x the bf16 peak (394.7 TOPS vs 197.4
TFLOP/s), so with the bf16 sampling path already at ~64% MFU and no single
hot spot left (CLAUDE.md round-3 attribution), a lower-precision numeric
lane is the only remaining >10% single-chip serving lever. This module
implements the quantized counterpart of ``layers._RingConv3x3``'s padadd
lowering:

  * weights:     symmetric per-output-channel s8, scale = absmax/127 —
                 quantized inside the jitted step from the fp32 params
                 (cost: one O(9*C*F) pass, noise vs the conv itself)
  * activations: symmetric per-tensor s8 with a DYNAMIC absmax scale
                 (diffusion activations change scale with timestep, so a
                 static calibration would need per-step tables; absmax is
                 one fused reduction over a tensor the conv reads anyway)
  * accumulate:  s32 on the MXU (exact: |sum| <= 9*C*127^2 < 2^31 for all
                 our channel counts), ring-wrap corrections included in s32
                 BEFORE the single dequant epilogue
  * epilogue:    y_s32 * (act_scale * w_scale[c]) + bias, cast to the
                 activation dtype (bf16)

The ring-wrap corrections reuse the SAME quantized tensors/scales, so the
lowering is bit-identical to conv(ring_pad(xq), wq) in integer arithmetic —
the padadd trick stays exact under quantization.

Behavior matched (at int8 precision): reference ops.Conv2d ring conv
(models/ops.py:149-173). Inference-only: round() kills gradients, so the
flag guarding this path (``layers.QUANT_CONV``) must stay off for training.

Status: gated OFF by default pending the device A/B (tools/probe_int8.py
gates; bench --int8 measures end-to-end; quality via the ddim_quality_check
harness with R2DM_TPU_INT8=1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-12


def weight_qparams(kernel: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric s8 quantization of an HWIO kernel.

    Returns ``(kernel_s8, scale_f32[F])`` with ``kernel ~= kernel_s8 *
    scale``. Runs on the fp32 master params inside the jitted step; XLA
    CSEs it across the 256 sampler steps' identical subgraphs where
    possible, and its cost is negligible either way."""
    k = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0 + _EPS
    kq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return kq, scale


def act_qparams(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-tensor symmetric s8 quantization of an activation."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf)) / 127.0 + _EPS
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def _conv_s8(x8, k8, padding):
    return jax.lax.conv_general_dilated(
        x8,
        k8,
        (1, 1),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def ring_conv_w8a8(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    out_dtype=None,
) -> jnp.ndarray:
    """3x3/stride-1 ring conv, W8A8 on the MXU's int8 path (NHWC).

    Integer part is exactly ``conv(ring_pad(xq), kq)``; the fp epilogue
    applies ``act_scale * w_scale`` per output channel and the bias."""
    out_dtype = out_dtype or x.dtype
    xq, xs = act_qparams(x)
    kq, ks = weight_qparams(kernel)

    W = x.shape[2]
    y = _conv_s8(xq, kq, ((1, 1), (1, 1)))
    # wrap corrections (layers._RingConv3x3 padadd lowering): column 0
    # misses x[.., W-1] through kernel column 0; column W-1 misses x[.., 0]
    # through kernel column 2 — added in s32 before the dequant epilogue
    corr_l = _conv_s8(xq[:, :, -1:, :], kq[:, 0:1], ((1, 1), (0, 0)))
    corr_r = _conv_s8(xq[:, :, 0:1, :], kq[:, 2:3], ((1, 1), (0, 0)))
    y = (
        y
        + jnp.pad(corr_l, ((0, 0), (0, 0), (0, W - 1), (0, 0)))
        + jnp.pad(corr_r, ((0, 0), (0, 0), (W - 1, 0), (0, 0)))
    )
    out = y.astype(jnp.float32) * (xs * ks)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
