"""Width-pair ("W2C") transform: run 64-channel U-Net levels at full MXU width.

Motivation (TPU): the outermost U-Net level works on (B, 64, 1024, 64)
tensors. Convolutions with 64 output channels fill only half of the MXU's
128 lanes, capping them at <=50% MFU (round-1 profile: ~30% end-to-end while
the 128+-channel levels ran ~68%). This module folds pairs of adjacent
azimuth columns into channels — (B, H, W, C) -> (B, H, W/2, 2C) — so every
level-1 matmul has 128-wide outputs, like the deeper levels.

The transform is EXACT (not an approximation): a 3x3 ring convolution on the
original tensor equals a 3x2 convolution on the merged tensor with a
block-structured kernel built from the original weights (75% dense ->
1.33x FLOPs, repaid ~2x by full lane utilization).

Phase alignment. Two merged layouts appear:
  aligned:  m[w'] = (x[2w'],   x[2w'+1])   -- a plain reshape of x
  offset:   m[w'] = (x[2w'-1], x[2w'])     -- reshape of roll(x, +1, W)
A width-2 kernel maps aligned -> offset and offset -> aligned (derivation in
``expand_kernel_3x3``); with the SAME expanded kernel, only the padding side
differs. Since a residual block applies exactly two convs, its input and
output alignment agree and skip-adds need no shuffles; alignment simply
alternates conv-to-conv through the level.

Channel layout of a merged tensor is phase-blocked: [phase0 C | phase1 C]
(what ``reshape`` produces). GroupNorm statistics must pool a group's
channels across BOTH phases (they hold the same value multiset as the
original group) — see ``group_norm_coeffs(phases=2)`` in models/layers.py.

Used by EfficientUNet(width_merge_l1=True); behavior-parity with the
reference level (models/efficient_unet.py:254-293) is asserted by
tests/test_w2c.py against the NHWC path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Lowering of the merge/unmerge layout transforms:
#   "conv":    identity-block-kernel convolutions (space-to-depth on the
#              MXU). On the v5e the logical reshape is NOT free — XLA
#              re-tiles the (W, C) minor dims through scalar-ish copies at
#              ~100-140 GB/s (measured 30/43 ms per merge/unmerge at b256
#              level-1 shapes, tools/probe_level1.py), which single-handedly
#              erased the W2C conv win in round 2. The identity conv moves
#              the same bytes through the MXU data path instead. Exact for
#              bf16 AND fp32 (fp32 convs decompose into exact bf16x3 passes
#              against a kernel of ones).
#   "reshape": the straightforward lax.reshape (+roll for offset).
LAYOUT_OP_IMPL = "conv"

_DN = ("NHWC", "HWIO", "NHWC")


def _merge_kernel(C: int, dtype) -> jnp.ndarray:
    """(1, 2, C, 2C): tap p routes input channel c to output p*C + c."""
    eye = jnp.eye(C, dtype=dtype)
    z = jnp.zeros((C, C), dtype=dtype)
    tap0 = jnp.concatenate([eye, z], axis=-1)  # even column -> phase0 block
    tap1 = jnp.concatenate([z, eye], axis=-1)  # odd column  -> phase1 block
    return jnp.stack([tap0, tap1], axis=0)[None]  # (1, 2, C, 2C)


def merge_width_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/2, 2C), aligned layout."""
    B, H, W, C = x.shape
    assert W % 2 == 0, "width-pair merge needs even W"
    if LAYOUT_OP_IMPL == "conv":
        return jax.lax.conv_general_dilated(
            x, _merge_kernel(C, x.dtype), (1, 2), ((0, 0), (0, 0)),
            dimension_numbers=_DN,
        )
    return x.reshape(B, H, W // 2, 2 * C)


def unmerge_width_pairs(x: jnp.ndarray, alignment: str = "aligned") -> jnp.ndarray:
    """(B, H, W', 2C) -> (B, H, 2W', C). ``alignment`` names the merged
    layout; "offset" means m[w'] = (x[2w'-1], x[2w']) (one circular shift).
    """
    B, H, Wm, C2 = x.shape
    C = C2 // 2
    assert alignment in ("aligned", "offset"), alignment
    if LAYOUT_OP_IMPL == "conv":
        # depth-to-space as a width-2 conv on the 2x lhs-dilated input.
        # aligned: out[2w'] = phase0(m[w']), out[2w'+1] = phase1(m[w'])
        #   -> pad (1,1): out[v] = Kp1 . xd[v-1] + Kp0 . xd[v]
        # offset:  out[2w'] = phase1(m[w']), out[2w'+1] = phase0(m[w'+1])
        #   -> pad (0,2): out[v] = Kp1 . xd[v] + Kp0 . xd[v+1]; the final
        #      column (phase0 of the wrapped m[0]) lands on zero padding and
        #      is restored with a boundary correction (ring semantics of the
        #      roll in the reshape formulation)
        eye = jnp.eye(C, dtype=x.dtype)
        z = jnp.zeros((C, C), dtype=x.dtype)
        k_p0 = jnp.concatenate([eye, z], axis=0)  # (2C, C) select phase0
        k_p1 = jnp.concatenate([z, eye], axis=0)  # (2C, C) select phase1
        if alignment == "aligned":
            kernel = jnp.stack([k_p1, k_p0], axis=0)[None]  # (1, 2, 2C, C)
            pad_w = (1, 1)
        else:
            kernel = jnp.stack([k_p1, k_p0], axis=0)[None]
            pad_w = (0, 2)
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), ((0, 0), pad_w), lhs_dilation=(1, 2),
            dimension_numbers=_DN,
        )
        if alignment == "offset":
            # last output column wraps to phase0 of merged column 0
            corr = x[:, :, 0:1, :C]
            y = y + jnp.pad(corr, ((0, 0), (0, 0), (2 * Wm - 1, 0), (0, 0)))
        return y
    y = x.reshape(B, H, 2 * Wm, C)
    if alignment == "offset":
        y = jnp.roll(y, -1, axis=2)
    return y


def phase_concat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat two merged tensors of the SAME alignment so the result
    stays phase-blocked: [a_p0 | b_p0 | a_p1 | b_p1] == merge(concat(ua, ub))."""
    Ca, Cb = a.shape[-1] // 2, b.shape[-1] // 2
    return jnp.concatenate(
        [a[..., :Ca], b[..., :Cb], a[..., Ca:], b[..., Cb:]], axis=-1
    )


def expand_kernel_3x3(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) HWIO -> the merged (3, 2, 2C, 2F) kernel.

    Derivation (per output phase; K_d = original kernel column d+1):
      aligned in, offset out:  y[2w'-1] = K-1 x[2w'-2] + K0 x[2w'-1] + K1 x[2w']
                               y[2w']   = K-1 x[2w'-1] + K0 x[2w']   + K1 x[2w'+1]
        inputs live in m[w'-1] = (x[2w'-2], x[2w'-1]) and m[w'] = (x[2w'], x[2w'+1])
        -> width-2 kernel, taps {w'-1, w'} (left pad)
      offset in, aligned out:  y[2w'], y[2w'+1] from m[w'] = (x[2w'-1], x[2w'])
        and m[w'+1] = (x[2w'+1], x[2w'+2]) -> taps {w', w'+1} (right pad)
    Both cases yield the SAME block kernel (shift symmetry); blocks are
    indexed [in_phase, out_phase] with phase-blocked channel layout:
      tap 0: [[K-1, 0], [K0, K-1]]      tap 1: [[K1, K0], [0, K1]]
    """
    kh, kw, C, F = k.shape
    assert (kh, kw) == (3, 3), k.shape
    z = jnp.zeros_like(k[:, 0])  # (3, C, F)
    tap0 = jnp.concatenate(
        [
            jnp.concatenate([k[:, 0], z], axis=-1),  # in phase0 -> (out p0 | p1)
            jnp.concatenate([k[:, 1], k[:, 0]], axis=-1),  # in phase1
        ],
        axis=-2,
    )  # (3, 2C, 2F)
    tap1 = jnp.concatenate(
        [
            jnp.concatenate([k[:, 2], k[:, 1]], axis=-1),
            jnp.concatenate([z, k[:, 2]], axis=-1),
        ],
        axis=-2,
    )
    return jnp.stack([tap0, tap1], axis=1)  # (3, 2, 2C, 2F)


def expand_kernel_in(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) -> (3, 4, C, 2F): ring conv consuming UNMERGED NHWC input
    and producing ALIGNED merged output at stride (1, 2).

    out[w', p*F+f] = y[2w'+p] with y = ringconv3x3(x): taps x[2w'+p+d-1]
    (d = 0..2) -> a width-4 window starting at 2w'-1 (pad_lo 1), slot
    j = p + d: phase0 fills j 0..2, phase1 fills j 1..3 (75% dense, same
    useful FLOPs as the merged-input W2C conv). Composing the merge INTO the
    conv's strided fetch makes the standalone merge pass (a ~30 ms minor-dim
    re-tile at b256 level-1 shapes, tools/probe_level1.py) disappear.
    """
    kh, kw, C, F = k.shape
    assert (kh, kw) == (3, 3), k.shape
    z = jnp.zeros_like(k[:, 0])  # (3, C, F)
    taps = []
    for j in range(4):
        p0 = k[:, j] if j < 3 else z  # phase0 block: k tap d = j
        p1 = k[:, j - 1] if j >= 1 else z  # phase1 block: k tap d = j - 1
        taps.append(jnp.concatenate([p0, p1], axis=-1))  # (3, C, 2F)
    return jnp.stack(taps, axis=1)  # (3, 4, C, 2F)


def in_conv_merged(x: jnp.ndarray, k: jnp.ndarray, bias) -> jnp.ndarray:
    """== merge_width_pairs(ring_conv3x3(x, k) + bias) (ALIGNED), composed:
    one stride-(1,2) conv + two boundary-column ring corrections."""
    import jax.lax as lax

    B, H, W, C = x.shape
    k4 = expand_kernel_in(k).astype(x.dtype)
    y = lax.conv_general_dilated(
        x, k4, (1, 2), ((1, 1), (1, 1)), dimension_numbers=_DN
    )
    # wrap corrections: the zero pad at v=-1 stands in for x[W-1] (reaching
    # out[0] through phase0 slot j=0) and at v=W for x[0] (reaching
    # out[Wm-1] through phase1 slot j=3); k4's phase structure zeroes the
    # other block of each slice automatically
    corr_l = lax.conv_general_dilated(
        x[:, :, W - 1 :], k4[:, 0:1], (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=_DN,
    )
    corr_r = lax.conv_general_dilated(
        x[:, :, 0:1], k4[:, 3:4], (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=_DN,
    )
    Wm = W // 2
    y = y + jnp.pad(corr_l, ((0, 0), (0, 0), (0, Wm - 1), (0, 0)))
    y = y + jnp.pad(corr_r, ((0, 0), (0, 0), (Wm - 1, 0), (0, 0)))
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 2)
    return y


def expand_kernel_1x1(k: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, C, F) -> (1, 1, 2C, 2F) block-diagonal (alignment-preserving)."""
    _, _, C, F = k.shape
    z = jnp.zeros_like(k[0, 0])
    top = jnp.concatenate([k[0, 0], z], axis=-1)
    bot = jnp.concatenate([z, k[0, 0]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)[None, None]
