"""FIR anti-aliased up/down-sampling (StyleGAN-style) for range images.

Behavior-matches the reference ``Resample`` module (models/ops.py:52-146):
margin padding (circular on W when ``ring``), zero-insertion upsampling,
crop, separable depthwise FIR filter, stride-crop downsampling.

TPU-native design: instead of materializing the zero-inserted tensor and
slicing (the reference's formulation), each axis is expressed as ONE
``lax.conv_general_dilated`` with ``lhs_dilation=up``, ``window_strides=down``
and (possibly negative) padding that reproduces the reference's margin/crop
index arithmetic exactly. XLA lowers this to a strided conv with no
intermediate buffers. Depthwise 1-D taps run on the VPU; the op is
bandwidth-bound and fuses with neighbors.

Derivation of the padding (per axis; u=up, d=down, k=taps, m=margin):
  reference crops the zero-inserted, margin-padded signal to
  [m*u - p0, (H+m)*u + p1) then applies a valid k-tap conv and takes [::d].
  On the lhs-dilated signal (length (H+2m-1)*u + 1) this equals conv padding
    lo = p0 - m*u,    hi = p1 + u - 1 - m*u
  with window_strides=d. p0/p1 follow models/ops.py:98-109.

Layout: NHWC.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .pad import ring_pad

# Lower direction="hw" resamples as ONE 2-D depthwise conv (rank-1 kernel)
# instead of two separable 1-D convs: exact same math, half the HBM
# round-trips (see the branch in fir_resample). False restores the
# separable lowering.
FIR_2D_FUSED = True


def _axis_params(k: int, up: int, down: int) -> tuple[int, int]:
    """p0/p1 pad sizes per reference models/ops.py:98-109."""
    if up > 1:
        p0 = (k - up + 1) // 2 + up - 1
        p1 = (k - up) // 2
    else:
        p0 = (k - down + 1) // 2
        p1 = (k - down) // 2
    return p0, p1


def _fir_1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    axis: int,  # 1 = H, 2 = W
    up: int,
    down: int,
    lo: int,
    hi: int,
) -> jnp.ndarray:
    """Depthwise 1-D FIR conv along H or W of an NHWC tensor."""
    C = x.shape[-1]
    k = kernel.shape[0]
    if axis == 1:
        rhs = jnp.tile(kernel.reshape(k, 1, 1, 1), (1, 1, 1, C))
        window_strides = (down, 1)
        lhs_dilation = (up, 1)
        padding = ((lo, hi), (0, 0))
    else:
        rhs = jnp.tile(kernel.reshape(1, k, 1, 1), (1, 1, 1, C))
        window_strides = (1, down)
        lhs_dilation = (1, up)
        padding = ((0, 0), (lo, hi))
    return lax.conv_general_dilated(
        x,
        rhs.astype(x.dtype),
        window_strides=window_strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


@partial(
    jax.jit,
    static_argnames=("up", "down", "window", "ring", "normalize", "direction"),
)
def fir_resample(
    x: jnp.ndarray,
    up: int | tuple[int, int] = 1,
    down: int | tuple[int, int] = 1,
    window: tuple[float, ...] = (1.0, 3.0, 3.0, 1.0),
    ring: bool = True,
    normalize: bool = True,
    direction: str = "hw",
) -> jnp.ndarray:
    """Anti-aliased resample of (B, H, W, C) by ``up``/``down`` per axis."""
    assert direction in ("h", "w", "hw")
    up = (up, up) if isinstance(up, int) else tuple(up)
    down = (down, down) if isinstance(down, int) else tuple(down)
    n_taps = len(window)

    if "h" in direction:
        k_h, up_h, down_h = n_taps, up[0], down[0]
    else:
        k_h = up_h = down_h = 1
    if "w" in direction:
        k_w, up_w, down_w = n_taps, up[1], down[1]
    else:
        k_w = up_w = down_w = 1

    kernel = jnp.asarray(window, dtype=jnp.float32)
    if normalize:
        kernel = kernel / kernel.sum()
    # 1-D kernel applied (possibly) twice; sqrt factor per application
    # matches models/ops.py:94.
    kernel = kernel * (up_h * up_w) ** 0.5

    ph0, ph1 = _axis_params(k_h, up_h, down_h)
    pw0, pw1 = _axis_params(k_w, up_w, down_w)
    margin = max(ph0, ph1, pw0, pw1)

    # margin pad: circular on W (if ring), zeros on H (models/ops.py:115-116)
    x = ring_pad(x, (margin, margin, margin, margin), ring=ring)

    h_lo = ph0 - margin * up_h
    h_hi = ph1 + up_h - 1 - margin * up_h
    w_lo = pw0 - margin * up_w
    w_hi = pw1 + up_w - 1 - margin * up_w

    if direction == "hw" and FIR_2D_FUSED:
        # ONE 2-D depthwise conv instead of two separable 1-D passes: the
        # rank-1 outer-product kernel is mathematically identical (up to one
        # fp reassociation in the tap products, computed here in fp32), but
        # halves the HBM round-trips. Standalone it is 1.75x faster (46.7 ->
        # 26.6 ms for the (256,32,512,128) up2, 115 -> 202 GB/s on v5e);
        # in-model the gain shrinks to +0.8% end-to-end (1.822 -> 1.808
        # ms/img-step, b256 32-step segment A/B) because XLA already
        # overlaps the separable passes in-graph — same isolated-probe
        # exaggeration as the conv MFU probes (CLAUDE.md round-3 notes).
        C = x.shape[-1]
        k2 = jnp.outer(kernel, kernel)
        rhs = jnp.tile(k2.reshape(k_h, k_w, 1, 1), (1, 1, 1, C))
        return lax.conv_general_dilated(
            x,
            rhs.astype(x.dtype),
            window_strides=(down_h, down_w),
            padding=((h_lo, h_hi), (w_lo, w_hi)),
            lhs_dilation=(up_h, up_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )
    if "h" in direction:
        x = _fir_1d(x, kernel, 1, up_h, down_h, h_lo, h_hi)
    else:
        x = x[:, margin : x.shape[1] - margin or None]
    if "w" in direction:
        x = _fir_1d(x, kernel, 2, up_w, down_w, w_lo, w_hi)
    else:
        x = x[:, :, margin : x.shape[2] - margin or None]
    return x


def upsample2x(x: jnp.ndarray, ring: bool = True) -> jnp.ndarray:
    """2x bilinear-FIR upsample, both axes (reference Resample(up=2))."""
    return fir_resample(x, up=2, ring=ring)


def downsample2x(x: jnp.ndarray, ring: bool = True) -> jnp.ndarray:
    """2x anti-aliased downsample, both axes (reference Resample(down=2))."""
    return fir_resample(x, down=2, ring=ring)
