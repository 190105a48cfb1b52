"""Training observability: JSONL scalars (+ optional TensorBoard) and the
rich image panels the reference logs every 5k steps (train.py:220-245):
colorized depth / reflectance / mask and a surface-normal-shaded BEV render.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class MetricLogger:
    """Scalars -> metrics.jsonl; mirrors to torch TensorBoard if available
    (⇔ accelerate trackers, reference train.py:48,58-59)."""

    def __init__(self, out_dir: str, enabled: bool = True):
        self.enabled = enabled
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._tb = None
        if enabled:
            os.makedirs(out_dir, exist_ok=True)
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: dict) -> None:
        if not self.enabled:
            return
        rec = {"step": step, "time": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    def flush(self) -> None:
        """Drain buffered sinks (the JSONL is per-call append already);
        called before the host-RSS watchdog re-execs the process."""
        if self._tb is not None:
            self._tb.flush()


def _save_png(path: str, array: np.ndarray) -> None:
    """(H, W, 3) uint8 -> PNG via matplotlib (no extra deps)."""
    import matplotlib.image

    matplotlib.image.imsave(path, array)


def save_image_panels(
    out_dir: str,
    step: int,
    samples,  # (B, H, W, C) in [-1, 1]
    lidar_utils,
    channels: int,
    tag: str = "sample",
    max_images: int = 4,
) -> list[str]:
    """Reference log_images equivalent (train.py:220-245): depth (turbo),
    reflectance (plasma), mask (binary), BEV normal-shaded render."""
    import jax.numpy as jnp
    from matplotlib import cm

    from .. import render

    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    x = jnp.asarray(np.asarray(samples)[:max_images], jnp.float32)
    x = lidar_utils.denormalize(x)
    written = []

    def emit(name, rgb):
        tile = np.concatenate(list(np.asarray(rgb)), axis=0)  # stack rows
        path = os.path.join(img_dir, f"{step:08d}_{tag}_{name}.png")
        _save_png(path, tile)
        written.append(path)

    if channels >= 1:
        depth_n = x[..., 0:1]
        emit("depth", render.colorize(depth_n))
        metric = lidar_utils.revert_depth(depth_n)
        mask = (metric > lidar_utils.min_depth) & (metric < lidar_utils.max_depth)
        emit(
            "mask",
            render.colorize(
                mask[..., 0].astype(jnp.float32),
                np.asarray(cm.binary_r(np.linspace(0, 1, 256))[:, :3], np.float32),
            ),
        )
        xyz = lidar_utils.to_xyz(metric) / lidar_utils.max_depth * mask
        normal = -render.estimate_surface_normal(xyz)
        normal = lidar_utils.denormalize(normal)
        B, H, W, _ = xyz.shape
        bev = render.render_point_clouds(
            points=xyz.reshape(B, H * W, 3),
            colors=normal.reshape(B, H * W, 3),
            size=512,
            t=jnp.asarray([0.0, 0.0, 1.0]),
        )
        emit("bev", np.clip(np.asarray(bev) * 255, 0, 255).astype(np.uint8))
    if channels >= 2:
        emit(
            "reflectance",
            render.colorize(
                x[..., 1],
                np.asarray(cm.plasma(np.linspace(0, 1, 256))[:, :3], np.float32),
            ),
        )
    return written
