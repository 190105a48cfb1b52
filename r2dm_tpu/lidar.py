"""LiDAR range-image <-> physical-space conversions (JAX).

Behavior-matches the reference ``LiDARUtility`` (utils/lidar.py:23-120):
metric depth <-> normalized [0,1] images (log2 / inverse / linear formats),
[0,1] <-> [-1,1] scaling, back-projection to XYZ through per-pixel ray
angles, and the min/max depth validity mask. All ops are pure jnp and fuse
into neighboring computations under jit.

Layout: the utility is layout-aware. Our compute core is NHWC; the
reference API surface is NCHW — ``data_format`` picks the convention for
all methods ("NHWC" default here; the compat hub API constructs with
"NCHW" so reference user code ports unchanged).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .ops.encoding import get_hdl64e_linear_ray_angles


def nearest_exact_resize_hw(x: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-exact resize of (H, W, C): index = floor((i + 0.5) * in/out).

    Matches torch F.interpolate(mode="nearest-exact") used to resample ray
    angles to the model resolution (reference utils/lidar.py:42-47).
    """
    H, W = x.shape[:2]
    out_h, out_w = size
    rows = np.clip(np.floor((np.arange(out_h) + 0.5) * H / out_h), 0, H - 1)
    cols = np.clip(np.floor((np.arange(out_w) + 0.5) * W / out_w), 0, W - 1)
    return x[rows.astype(np.int64)][:, cols.astype(np.int64)]


class LiDARUtility:
    def __init__(
        self,
        resolution: tuple[int, int],
        depth_format: str,
        min_depth: float,
        max_depth: float,
        ray_angles: Optional[np.ndarray] = None,
        data_format: str = "NHWC",
    ):
        assert depth_format in ("log_depth", "inverse_depth", "depth")
        assert data_format in ("NHWC", "NCHW")
        self.resolution = tuple(resolution)
        self.depth_format = depth_format
        self.min_depth = float(min_depth)
        self.max_depth = float(max_depth)
        self.data_format = data_format
        if ray_angles is None:
            angles = get_hdl64e_linear_ray_angles(*resolution)  # (H, W, 2)
        else:
            angles = np.asarray(ray_angles, dtype=np.float32)
            if angles.ndim == 4:  # reference layout (1, 2, H, W)
                assert angles.shape[:2] == (1, 2)
                angles = np.transpose(angles[0], (1, 2, 0))
            assert angles.ndim == 3 and angles.shape[-1] == 2
        # resample to the working resolution (reference utils/lidar.py:42-47)
        angles = nearest_exact_resize_hw(angles, self.resolution)
        self.ray_angles = jnp.asarray(angles, dtype=jnp.float32)  # (H, W, 2)

    # ----------------------------------------------------------- helpers
    def _angles_for(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(phi, theta) shaped to broadcast against x's layout."""
        phi = self.ray_angles[..., 0]
        theta = self.ray_angles[..., 1]
        if self.data_format == "NHWC":
            return phi[None, :, :, None], theta[None, :, :, None]
        return phi[None, None], theta[None, None]

    @staticmethod
    def denormalize(x: jnp.ndarray) -> jnp.ndarray:
        """[-1, 1] -> [0, 1] (reference utils/lidar.py:49-52)."""
        return (x + 1.0) / 2.0

    @staticmethod
    def normalize(x: jnp.ndarray) -> jnp.ndarray:
        """[0, 1] -> [-1, 1] (reference utils/lidar.py:54-57)."""
        return x * 2.0 - 1.0

    def get_mask(self, metric: jnp.ndarray) -> jnp.ndarray:
        """1.0 where min_depth < depth < max_depth (utils/lidar.py:118-120)."""
        return (
            (metric > self.min_depth) & (metric < self.max_depth)
        ).astype(jnp.float32)

    # -------------------------------------------------------- conversions
    def convert_depth(
        self,
        metric: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        depth_format: Optional[str] = None,
    ) -> jnp.ndarray:
        """Metric depth -> normalized [0, 1] (reference utils/lidar.py:72-95)."""
        depth_format = depth_format or self.depth_format
        if mask is None:
            mask = self.get_mask(metric)
        if depth_format == "log_depth":
            normalized = jnp.log2(metric + 1.0) / np.log2(self.max_depth + 1.0)
        elif depth_format == "inverse_depth":
            normalized = self.min_depth / (metric + 1e-8)
        elif depth_format == "depth":
            normalized = metric / self.max_depth
        else:
            raise ValueError(depth_format)
        return jnp.clip(normalized, 0.0, 1.0) * mask

    def revert_depth(
        self, normalized: jnp.ndarray, depth_format: Optional[str] = None
    ) -> jnp.ndarray:
        """Normalized [0, 1] -> metric depth (reference utils/lidar.py:97-116)."""
        depth_format = depth_format or self.depth_format
        if depth_format == "log_depth":
            metric = jnp.exp2(normalized * np.log2(self.max_depth + 1.0)) - 1.0
        elif depth_format == "inverse_depth":
            metric = self.min_depth / (normalized + 1e-8)
        elif depth_format == "depth":
            metric = normalized * self.max_depth
        else:
            raise ValueError(depth_format)
        return metric * self.get_mask(metric)

    def to_xyz(self, metric: jnp.ndarray) -> jnp.ndarray:
        """Back-project metric depth through the ray angles; invalid depths
        are zeroed (reference utils/lidar.py:59-70).

        NHWC: (B, H, W, 1) -> (B, H, W, 3); NCHW: (B, 1, H, W) -> (B, 3, H, W).
        """
        assert metric.ndim == 4
        mask = self.get_mask(metric)
        phi, theta = self._angles_for(metric)
        x = metric * jnp.cos(phi) * jnp.cos(theta)
        y = metric * jnp.cos(phi) * jnp.sin(theta)
        z = metric * jnp.sin(phi)
        axis = -1 if self.data_format == "NHWC" else 1
        xyz = jnp.concatenate([x, y, z], axis=axis)
        return xyz * mask
