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

import jax.numpy as jnp


def merge_width_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/2, 2C), aligned layout (pure reshape)."""
    B, H, W, C = x.shape
    assert W % 2 == 0, "width-pair merge needs even W"
    return x.reshape(B, H, W // 2, 2 * C)


def unmerge_width_pairs(x: jnp.ndarray, alignment: str = "aligned") -> jnp.ndarray:
    """(B, H, W', 2C) -> (B, H, 2W', C). ``alignment`` names the merged
    layout; "offset" costs one circular roll (m was reshape(roll(x, +1)))."""
    B, H, Wm, C2 = x.shape
    y = x.reshape(B, H, 2 * Wm, C2 // 2)
    if alignment == "offset":
        y = jnp.roll(y, -1, axis=2)
    else:
        assert alignment == "aligned", alignment
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


def expand_kernel_1x1(k: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, C, F) -> (1, 1, 2C, 2F) block-diagonal (alignment-preserving)."""
    _, _, C, F = k.shape
    z = jnp.zeros_like(k[0, 0])
    top = jnp.concatenate([k[0, 0], z], axis=-1)
    bot = jnp.concatenate([z, k[0, 0]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)[None, None]
