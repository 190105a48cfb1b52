"""Ring (equirectangular-wrap) padding.

The LiDAR range image wraps horizontally (azimuth is periodic), so every conv
pads the W axis circularly and the H axis with zeros. Equivalent behavior to
the reference's ``Pad`` module (models/ops.py:32-49), expressed as a single
``jnp.pad`` so XLA can fuse it into the consumer conv.

Layout: NHWC (TPU-native), i.e. x has shape (B, H, W, C).
"""

from __future__ import annotations

import jax.numpy as jnp


def ring_pad(
    x: jnp.ndarray,
    padding: int | tuple[int, int, int, int],
    ring: bool = True,
    mode: str = "constant",
) -> jnp.ndarray:
    """Pad (B, H, W, C): W circularly (if ring) and H with ``mode``.

    ``padding`` is either a single int or (left, right, top, bottom),
    matching torch's F.pad quadruple order used by the reference.
    """
    if isinstance(padding, int):
        left = right = top = bottom = padding
    else:
        left, right, top, bottom = padding
    if left or right:
        w_mode = "wrap" if ring else mode
        x = jnp.pad(x, ((0, 0), (0, 0), (left, right), (0, 0)), mode=w_mode)
    if top or bottom:
        x = jnp.pad(x, ((0, 0), (top, bottom), (0, 0), (0, 0)), mode=mode)
    return x
