"""Exact fusion of level-boundary convs with their FIR resamples.

The U-Net's down path runs ``downsample2x(ring_conv3x3(x))`` and the up path
``ring_conv3x3(upsample2x(h))`` (reference Block, models/efficient_unet.py:
113-185 with ops.Resample, models/ops.py:52-146). Both pairs are LINEAR with
no nonlinearity between, so they compose into ONE convolution:

  down:  y = FIR2x2_down(K * x)  ==  (F (x) F * K) * x  at stride 2
         — a 6x6 kernel, same FLOPs as the 3x3 at full resolution, but the
         separate depthwise FIR passes and the full-resolution intermediate
         tensor disappear (measured: the FIR passes are 7.7% of the b256
         U-Net forward on the v5e).
  up:    y = K * FIR2x2_up(h)   ==  (K (x) F') *_lhs-dilated h

Boundary semantics compose exactly too, with two 1-row corrections per op:
the W axis is circular (wrap-pad), and on the H axis the pipeline's
explicit zero margins differ from naive composition only where the inner
tensor's zero-pad rows overlap the outer kernel's support — row 0 and the
last row, each fixable by subtracting a small single-row convolution
(derivations in the function docstrings; parity vs the two-op pipeline is
asserted to fp32 exactness in tests/test_fused_resample.py).

Used by UNetBlock via RingConv(..., fused_resample="down"|"up") when
models.layers.FUSED_RESAMPLE is on (default). Pure jnp/lax — differentiable,
so the training path uses it too.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _fir_window(dtype) -> jnp.ndarray:
    return jnp.asarray(np.array([1.0, 3.0, 3.0, 1.0]) / 8.0, dtype)


def _composed_kernel(kernel: jnp.ndarray, scale: float) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> (6, 6, Ci, Co): full 2-D convolution of the conv
    kernel with the separable FIR window (one ``scale``d pass per axis)."""
    f = _fir_window(kernel.dtype) * scale
    out = jnp.zeros((6, 6) + kernel.shape[2:], kernel.dtype)
    for jh in range(4):
        for jw in range(4):
            out = out.at[jh : jh + 3, jw : jw + 3].add(f[jh] * f[jw] * kernel)
    return out


def _row_composed_kernel(k_row: jnp.ndarray, scale: float) -> jnp.ndarray:
    """(3, Ci, Co) W-kernel -> (1, 6, Ci, Co) FIR-composed W kernel."""
    f = _fir_window(k_row.dtype) * scale
    out = jnp.zeros((6,) + k_row.shape[1:], k_row.dtype)
    for jw in range(4):
        out = out.at[jw : jw + 3].add(f[jw] * k_row)
    return out[None]


def conv_then_downsample(
    x: jnp.ndarray, kernel: jnp.ndarray, bias
) -> jnp.ndarray:
    """== downsample2x(ring_conv3x3(x, kernel) + bias), in one conv.

    Composition: y[o] = sum_j f[j] z[2o+j-1] with z = K*x (+bias) gives a
    6-tap kernel C = f (*) K per axis, taps x[2o-2 .. 2o+3] -> wrap pad
    (2, 3) on W, zero pad (2, 3) on H, stride 2. H corrections: the FIR's
    margin zeroes z[-1]/z[H]; the composed conv instead derives them from
    x[0]/x[H-1] (+bias) through K's own zero H padding — subtract
    f[0]/f[3] times those single-row contributions, FIR-downsampled on W.
    """
    B, H, W, Ci = x.shape
    assert H % 2 == 0 and W % 2 == 0 and W >= 6, (H, W)
    C2 = _composed_kernel(kernel, 1.0)
    f = _fir_window(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 3), (0, 0)), mode="wrap")
    xp = jnp.pad(xp, ((0, 0), (2, 3), (0, 0), (0, 0)))
    y = lax.conv_general_dilated(xp, C2, (2, 2), ((0, 0), (0, 0)), dimension_numbers=_DN)
    if bias is not None:
        y = y + bias.astype(y.dtype)

    def z_row(row, k_row):  # 1-row ring-W conv with the (3, Ci, Co) W kernel
        rp = jnp.pad(row, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
        out = lax.conv_general_dilated(
            rp, k_row[None], (1, 1), ((0, 0), (0, 0)), dimension_numbers=_DN
        )
        return out + bias.astype(out.dtype) if bias is not None else out

    def fir_w_down(row):  # (B, 1, W, Co) -> (B, 1, W/2, Co), ring
        C = row.shape[-1]
        rp = jnp.pad(row, ((0, 0), (0, 0), (1, 2), (0, 0)), mode="wrap")
        k = jnp.tile(_fir_window(row.dtype).reshape(1, 4, 1, 1), (1, 1, 1, C))
        return lax.conv_general_dilated(
            rp, k, (1, 2), ((0, 0), (0, 0)), dimension_numbers=_DN,
            feature_group_count=C,
        )

    corr_top = (-f[0] * fir_w_down(z_row(x[:, 0:1], kernel[2]))).astype(y.dtype)
    corr_bot = (-f[3] * fir_w_down(z_row(x[:, H - 1 : H], kernel[0]))).astype(y.dtype)
    y = y.at[:, 0:1].add(corr_top)
    y = y.at[:, -1:].add(corr_bot)
    return y


def _merge_w_kernel(k6: jnp.ndarray) -> jnp.ndarray:
    """Remap a 6-W-tap composed kernel (..., 6, Ci, Co) to consume ALIGNED
    width-pair-merged input: slot (jm, phase) <- unmerged tap 2*jm + phase.
    (..., 6, Ci, Co) -> (..., 3, 2Ci, Co), fully dense (the stride-2 window
    start is even, so taps map 1:1 onto merged-column phase blocks)."""
    parts = []
    for jm in range(3):
        blocks = jnp.concatenate(
            [k6[..., 2 * jm, :, :], k6[..., 2 * jm + 1, :, :]], axis=-2
        )  # (..., 2Ci, Co)
        parts.append(blocks)
    return jnp.stack(parts, axis=-3)  # (..., 3, 2Ci, Co)


def conv_then_downsample_merged(
    xm: jnp.ndarray, kernel: jnp.ndarray, bias
) -> jnp.ndarray:
    """== conv_then_downsample(unmerge_width_pairs(xm, "aligned"), ...), with
    the unmerge composed away (VERDICT r3: the standalone unmerge re-tiles at
    ~100-145 GB/s whatever its lowering — tools/probe_level1.py).

    ``xm`` is the ALIGNED merged level-1 tensor (B, H, Wm, 2Ci). The fused
    conv+FIR-down window x[2o-2 .. 2o+3] has an even start, so its 6 W taps
    land exactly on the 3x2 phase slots of merged columns o-1..o+1 — a DENSE
    (6, 3, 2Ci, Co) kernel at stride (2, 1) with merged ring pad (1, 1):
    identical FLOPs to the NHWC composition, full 128-lane contraction.
    H boundary corrections as in conv_then_downsample, computed on merged
    single rows with the same slot mapping.
    """
    B, H, Wm, C2i = xm.shape
    Ci = C2i // 2
    assert kernel.shape[:3] == (3, 3, Ci), (kernel.shape, xm.shape)
    C2 = _composed_kernel(kernel, 1.0)  # (6, 6, Ci, Co); W taps on axis -3
    Km = _merge_w_kernel(C2)  # (6, 3, 2Ci, Co)
    f = _fir_window(jnp.float32)
    xp = jnp.pad(xm, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
    xp = jnp.pad(xp, ((0, 0), (2, 3), (0, 0), (0, 0)))
    y = lax.conv_general_dilated(
        xp, Km, (2, 1), ((0, 0), (0, 0)), dimension_numbers=_DN
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)

    def row_correction(row_m, k_row):
        """fir_w_down(z_row(row, k_row)) on a MERGED row: the 1-row analogue
        of the main conv with the row-composed 6-tap W kernel."""
        rc = _row_composed_kernel(k_row, 1.0)[0]  # (6, Ci, Co)
        Kr = _merge_w_kernel(rc)[None]  # (1, 3, 2Ci, Co)
        rp = jnp.pad(row_m, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
        out = lax.conv_general_dilated(
            rp, Kr, (1, 1), ((0, 0), (0, 0)), dimension_numbers=_DN
        )
        return out + bias.astype(out.dtype) if bias is not None else out

    corr_top = (-f[0] * row_correction(xm[:, 0:1], kernel[2])).astype(y.dtype)
    corr_bot = (-f[3] * row_correction(xm[:, H - 1 : H], kernel[0])).astype(y.dtype)
    y = y.at[:, 0:1].add(corr_top)
    y = y.at[:, -1:].add(corr_bot)
    return y


# Default lowering of the fused up composition (see upsample_then_conv):
# "polyphase" | "dilated" | "h_polyphase". Only used when FUSED_RESAMPLE
# includes "up" (models/layers.py) — measured numbers in NEXT.md.
UP_IMPL = "h_polyphase"


def upsample_then_conv(
    h: jnp.ndarray, kernel: jnp.ndarray, bias, impl: Optional[str] = None
) -> jnp.ndarray:
    """== ring_conv3x3(upsample2x(h), kernel) + bias, composed.

    Composition: Cu = K (*) F' per axis (F' = FIR x2 per-axis scale 2).
    Two exact lowerings:
      - "polyphase" (default): output phase (p, q) is a standard 3x3 ring
        conv of h with Cu[1-p::2, 1-q::2], interleaved by reshape — same
        FLOPs as the unfused conv, no dilated-conv zeros for XLA to waste
        work on.
      - "dilated": one lhs-dilation-2 conv with the full 6x6 Cu (measured
        slower on the v5e: XLA does not exploit the dilation zeros).
    H corrections (both): the outer conv zero-pads u = upsample2x(h) at
    rows -1 and 2H, while the composition computes their real values
    u[-1] = 2 f[3] Wup(h[0]) and u[2H] = 2 f[0] Wup(h[H-1]) — subtract
    those single-row contributions through K's edge rows.
    """
    impl = UP_IMPL if impl is None else impl
    B, H, W, Ci = h.shape
    Cu = _composed_kernel(kernel, 2.0)
    f = _fir_window(jnp.float32)
    if impl == "h_polyphase":
        # H phases as two stride-1 convs (the H interleave is a MAJOR-axis
        # row copy — cheap, unlike the W/C interleave of full "polyphase");
        # W stays lhs-dilated, so only the W-axis dilation zeros are wasted
        # (half of the full dilated variant's waste)
        Co = Cu.shape[-1]
        hp = jnp.pad(h, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="wrap")
        grid = [
            lax.conv_general_dilated(
                hp, Cu[1 - p :: 2], (1, 1), ((1, 1), (0, 0)),
                lhs_dilation=(1, 2), dimension_numbers=_DN,
            )[:, :, 1:-1]
            for p in range(2)
        ]
        # out[2t+p] = grid[p][t]
        y = jnp.stack(grid, axis=2).reshape(B, 2 * H, 2 * W, Co)
    elif impl == "polyphase":
        Co = Cu.shape[-1]
        hp = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
        grid = [
            [
                lax.conv_general_dilated(
                    hp, Cu[1 - p :: 2, 1 - q :: 2], (1, 1), ((1, 1), (0, 0)),
                    dimension_numbers=_DN,
                )
                for q in range(2)
            ]
            for p in range(2)
        ]
        y = jnp.stack([jnp.stack(r, axis=0) for r in grid], axis=0)
        # out[2t+p, 2w+q] = grid[p][q][t, w]
        y = jnp.transpose(y, (2, 3, 0, 4, 1, 5)).reshape(B, 2 * H, 2 * W, Co)
    else:
        assert impl == "dilated", impl
        hp = jnp.pad(h, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="wrap")
        hp = jnp.pad(hp, ((0, 0), (2, 2), (0, 0), (0, 0)))
        # VALID conv + slice instead of padding (-1, -1): identical values,
        # but negative padding on a dilated conv SIGABRTs XLA:CPU in the
        # gradient under GSPMD sharding (observed on the 8-device test mesh)
        y = lax.conv_general_dilated(
            hp, Cu, (1, 1), ((0, 0), (0, 0)), lhs_dilation=(2, 2),
            dimension_numbers=_DN,
        )[:, 1:-1, 1:-1]
    if bias is not None:
        y = y + bias.astype(y.dtype)

    def w_comp_row(row, k_row):  # (B, 1, W, Ci) -> (B, 1, 2W, Co), ring
        Cw = _row_composed_kernel(k_row, 2.0)
        rp = jnp.pad(row, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="wrap")
        return lax.conv_general_dilated(
            rp, Cw, (1, 1), ((0, 0), (0, 0)), lhs_dilation=(1, 2),
            dimension_numbers=_DN,
        )[:, :, 1:-1]

    corr_top = (w_comp_row(h[:, 0:1], kernel[0]) * (2.0 * f[3])).astype(y.dtype)
    corr_bot = (w_comp_row(h[:, H - 1 : H], kernel[2]) * (2.0 * f[0])).astype(y.dtype)
    y = y.at[:, 0:1].add(-corr_top)
    y = y.at[:, -1:].add(-corr_bot)
    return y


def upsample_then_conv_merged(
    h: jnp.ndarray, kernel: jnp.ndarray, bias
) -> jnp.ndarray:
    """== merge_width_pairs(upsample_then_conv(h, kernel, bias)) (ALIGNED),
    with the merge composed away.

    The W phases of the upsampled-then-convolved signal ARE the merged
    channel blocks, so the polyphase decomposition writes merged output
    directly: per output H phase p, ONE standard 3x3-window conv with the
    W-phase-blocked kernel (3, 3, Ci, 2Co) built from Cu = K (*) FIR'
    (q block = Cu[1-p::2, 1-q::2]); the two H phases then interleave along
    the MAJOR H axis (a fast row copy — unlike the W/C interleave transpose
    that made the NHWC polyphase lowering 15% slower, NEXT.md round 2).
    Same FLOPs as the unfused 3x3 at full resolution; H-margin corrections
    as in upsample_then_conv, W-polyphased onto merged rows.
    """
    B, H, Wm, Ci = h.shape
    Co = kernel.shape[-1]
    Cu = _composed_kernel(kernel, 2.0)  # (6, 6, Ci, Co)
    f = _fir_window(jnp.float32)
    hp = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")

    def phase_conv(p):
        # (3, 3, Ci, 2Co): W-phase q in the output channel block q
        Kp = jnp.concatenate(
            [Cu[1 - p :: 2, 1 - 0 :: 2], Cu[1 - p :: 2, 1 - 1 :: 2]], axis=-1
        )
        return lax.conv_general_dilated(
            hp, Kp, (1, 1), ((1, 1), (0, 0)), dimension_numbers=_DN
        )

    g0, g1 = phase_conv(0), phase_conv(1)  # (B, H, Wm, 2Co) each

    def w_comp_row_merged(row, k_row):
        """Merged-aligned W-up composition on one row: q block = phase q."""
        Cw = _row_composed_kernel(k_row, 2.0)[0]  # (6, Ci, Co)
        Kr = jnp.stack([Cw[1::2], Cw[0::2]], axis=0)  # (q, 3, Ci, Co)
        Kr = jnp.concatenate([Kr[0], Kr[1]], axis=-1)[None]  # (1, 3, Ci, 2Co)
        rp = jnp.pad(row, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
        return lax.conv_general_dilated(
            rp, Kr, (1, 1), ((0, 0), (0, 0)), dimension_numbers=_DN
        )

    corr_top = (w_comp_row_merged(h[:, 0:1], kernel[0]) * (2.0 * f[3])).astype(g0.dtype)
    corr_bot = (w_comp_row_merged(h[:, H - 1 : H], kernel[2]) * (2.0 * f[0])).astype(g1.dtype)
    g0 = g0.at[:, 0:1].add(-corr_top)
    g1 = g1.at[:, -1:].add(-corr_bot)
    # H interleave: out[2t] = g0[t], out[2t+1] = g1[t] (major-axis row copy)
    y = jnp.stack([g0, g1], axis=2).reshape(B, 2 * H, Wm, 2 * Co)
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 2)
    return y
