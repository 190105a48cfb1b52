"""Point-cloud rendering / visualization (pure jnp, NHWC).

Behavior-matches the reference ``utils/render.py``: pinhole BEV renderer
with soft z-buffer (:9-80), differentiable bilinear splatting rasterizer
(:83-142), 8-neighbor cross-product surface normals (:145-236), and a
colormap LUT (:239-247). Re-designed for XLA: the neighbor gathers are
static slices of a padded tensor, the splat is four batched
``.at[].add`` scatters (lowered to efficient TPU scatter), and everything
is jit-able with no host round-trips.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_Rt(
    roll: float = 0.0,
    pitch: float = 0.0,
    yaw: float = 0.0,
    x: float = 0.0,
    y: float = 0.0,
    z: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Extrinsics: R = Rz(yaw) @ Ry(pitch) @ Rx(roll), t = [x, y, z]
    (reference utils/render.py:9-29)."""

    def rx(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = math.cos(a), math.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    R = rz(yaw) @ ry(pitch) @ rx(roll)
    return (
        jnp.asarray(R[None], dtype=jnp.float32),
        jnp.asarray([[x, y, z]], dtype=jnp.float32),
    )


def bilinear_rasterizer(
    coords: jnp.ndarray, values: jnp.ndarray, out_shape: tuple[int, int]
) -> jnp.ndarray:
    """Differentiable splat: (B, N, 2) coords (h, w) + (B, N, C) values ->
    (B, H, W, C). Four-corner bilinear scatter-add
    (reference utils/render.py:83-142)."""
    B, N, C = values.shape
    H, W = out_shape
    h = coords[..., 0]
    w = coords[..., 1]

    h_t = jnp.floor(h)
    h_b = h_t + 1
    w_l = jnp.floor(w)
    w_r = w_l + 1

    h_t_safe = jnp.clip(h_t, 0.0, H - 1)
    h_b_safe = jnp.clip(h_b, 0.0, H - 1)
    w_l_safe = jnp.clip(w_l, 0.0, W - 1)
    w_r_safe = jnp.clip(w_r, 0.0, W - 1)

    wh_t = (h_b - h) * (h_t == h_t_safe)
    wh_b = (h - h_t) * (h_b == h_b_safe)
    ww_l = (w_r - w) * (w_l == w_l_safe)
    ww_r = (w - w_l) * (w_r == w_r_safe)

    # (4, B, N) weights and corner coordinates
    weights = jnp.stack([wh_t * ww_l, wh_t * ww_r, wh_b * ww_l, wh_b * ww_r])
    hs = jnp.stack([h_t_safe, h_t_safe, h_b_safe, h_b_safe])
    ws = jnp.stack([w_l_safe, w_r_safe, w_l_safe, w_r_safe])
    weights = weights * (weights >= 1e-3)  # stability gate (ref :120-123)
    idx = (ws + W * hs).astype(jnp.int32)  # (4, B, N)

    def splat_one(vals, weight4, idx4):
        out = jnp.zeros((H * W, C), vals.dtype)
        out = out.at[idx4.reshape(-1)].add(
            (vals[None] * weight4[..., None]).reshape(-1, C)
        )
        return out.reshape(H, W, C)

    return jax.vmap(splat_one, in_axes=(0, 1, 1))(values, weights, idx)


def render_point_clouds(
    points: jnp.ndarray,
    colors: Optional[jnp.ndarray] = None,
    size: int = 800,
    R: Optional[jnp.ndarray] = None,
    t: Optional[jnp.ndarray] = None,
    focal_length: float = 1.0,
) -> jnp.ndarray:
    """Pinhole render of (B, N, 3) points -> (B, size, size, C) image with a
    soft exp(-3 depth) z-buffer (reference utils/render.py:32-80)."""
    points = points * jnp.asarray([1.0, 1.0, -1.0])  # flip z (ref :40-41)
    B, N, _ = points.shape
    if colors is None:
        colors = jnp.ones((B, N, 3), points.dtype)
    if R is not None:
        points = points @ R
    if t is not None:
        points = points + t

    # intrinsics: fx = fy = focal_length, cx = cy = 0.5 (points in [-1, 1])
    zs = points[..., 2:3]
    uv = points[..., :2] / jnp.where(jnp.abs(zs) > 0, zs, 1.0)
    uv = uv * focal_length + 0.5

    uv = uv * size
    inside = (uv > 0) & (uv < size - 1)
    mask = inside[..., 0:1] & inside[..., 1:2]
    colors = colors * mask

    uv = size - uv
    depth = jnp.linalg.norm(points, axis=-1, keepdims=True)
    weight = jnp.exp(-3.0 * depth) * (depth > 1e-8)
    num = bilinear_rasterizer(uv, weight * colors, (size, size))
    den = bilinear_rasterizer(uv, weight, (size, size))
    return num / (den + 1e-8)


def estimate_surface_normal(
    points: jnp.ndarray, d: int = 2, mode: str = "closest"
) -> jnp.ndarray:
    """Surface normals of a coordinated point map (B, H, W, 3) by cross
    products over 8 neighbor pairs (reference utils/render.py:145-236):
    replicate-pad H, circular-pad W, neighbors at distance ``d``; 'closest'
    picks the pair minimizing summed distance to the anchor."""
    B, H, W, C = points.shape
    assert C == 3
    P = jnp.pad(points, ((0, 0), (d, d), (0, 0), (0, 0)), mode="edge")
    P = jnp.pad(P, ((0, 0), (0, 0), (d, d), (0, 0)), mode="wrap")

    offsets = [(-d, 0), (-d, d), (0, d), (d, d), (d, 0), (d, -d), (0, -d), (-d, -d)]

    def shift(dh, dw):
        return jax.lax.dynamic_slice(
            P, (0, d + dh, d + dw, 0), (B, H, W, C)
        )

    anchors = shift(0, 0)
    nbrs1 = jnp.stack([shift(dh, dw) for dh, dw in offsets], axis=1)  # (B,8,H,W,3)
    nbrs2 = jnp.stack(
        [shift(*offsets[(k + 2) % 8]) for k in range(8)], axis=1
    )

    v1 = nbrs1 - anchors[:, None]
    v2 = nbrs2 - anchors[:, None]
    if mode == "closest":
        diff = jnp.linalg.norm(v1, axis=-1) + jnp.linalg.norm(v2, axis=-1)
        i = jnp.argmin(diff, axis=1)  # (B,H,W)
        pick = jnp.take_along_axis(
            jnp.cross(v1, v2), i[:, None, :, :, None], axis=1
        )[:, 0]
        normals = pick
    elif mode == "mean":
        normals = jnp.cross(v1, v2).mean(axis=1)
    else:
        raise NotImplementedError(mode)
    return normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-8)


def _turbo_lut() -> np.ndarray:
    try:
        from matplotlib import cm

        return np.asarray(cm.turbo(np.linspace(0, 1, 256))[:, :3], np.float32)
    except ImportError:  # grayscale fallback
        g = np.linspace(0, 1, 256, dtype=np.float32)
        return np.stack([g, g, g], axis=1)


def colorize(x: jnp.ndarray, lut: Optional[np.ndarray] = None) -> jnp.ndarray:
    """[0,1] scalar map (B, H, W) or (B, H, W, 1) -> uint8 RGB (B, H, W, 3)
    via a 256-entry LUT (reference utils/render.py:239-247, default turbo)."""
    if x.ndim == 4:
        x = x[..., 0]
    lut = _turbo_lut() if lut is None else np.asarray(lut, np.float32)
    ids = jnp.clip((x * 256.0), 0, 255).astype(jnp.int32)
    rgb = jnp.asarray(lut)[ids]
    return jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)
