"""Re-encode the reference's scan-unfolding angle calibration tables.

The reference ships the per-pixel (elevation, azimuth) tables for its
"unfolding" projections as committed binary artifacts
(``data/{kitti_360,kitti_raw}/unfolding_angles.pth``, consumed at
``train.py:102-107``): for every pixel of the unfolded 64x2048 grid, the
average direction of the KITTI points that land there. Like the
odometry/category split tables (``r2dm_tpu/data/kitti_splits.py``), these
values are factual calibration DATA measured from the datasets — not
authored code — and cannot be derived without the raw scans. This tool
re-encodes them into this framework's format:

  python tools/import_unfolding_angles.py \
      --pth /path/to/reference/data/kitti_360/unfolding_angles.pth \
      --dataset kitti_360

writes ``r2dm_tpu/data/angles/<dataset>_unfolding_angles.npz`` holding an
``(H, W, 2)`` float32 array ``[elevation, azimuth]`` in radians — the same
layout ``tools/make_unfolding_angles.py`` produces when regenerating the
table from raw scans — consumed by ``r2dm_tpu.inference.model_coords`` for
``projection="unfolding-*"`` configs.

Validation: the source tensor must be ``(1, 2, H, W)`` float32 with
channel 0 = elevation (monotonically decreasing row means, HDL-64E fires
+3 deg down to -25 deg) and channel 1 = azimuth in ``[-pi, pi]``
(decreasing left to right) — the conventions of
``get_hdl64e_linear_ray_angles`` (reference ``utils/lidar.py:9-20``).
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np


def convert(pth_path: str) -> np.ndarray:
    import torch

    t = torch.load(pth_path, map_location="cpu", weights_only=True)
    arr = np.asarray(t, dtype=np.float32)
    if arr.ndim != 4 or arr.shape[:2] != (1, 2):
        raise ValueError(
            f"expected a (1, 2, H, W) angle tensor, got {arr.shape}"
        )
    angles = np.moveaxis(arr[0], 0, -1)  # (H, W, 2) [elevation, azimuth]
    validate(angles)
    return angles


def validate(angles: np.ndarray) -> None:
    elev, azim = angles[..., 0], angles[..., 1]
    if not (-0.6 < elev.min() and elev.max() < 0.2):
        raise ValueError(
            f"elevation out of the HDL-64E range: [{elev.min()}, {elev.max()}]"
        )
    row_means = elev.mean(axis=1)
    if not (np.diff(row_means) < 0).all():
        raise ValueError("elevation row means must decrease top to bottom")
    if not (-math.pi <= azim.min() and azim.max() <= math.pi):
        raise ValueError(
            f"azimuth out of [-pi, pi]: [{azim.min()}, {azim.max()}]"
        )
    # interior columns only: at the +-pi seam the measured azimuths wrap,
    # so a linear mean of the first/last column can sit below its inward
    # neighbour (observed in the kitti_raw table's column 0)
    col_means = azim.mean(axis=0)[1:-1]
    if not (np.diff(col_means) < 0).all():
        raise ValueError("azimuth column means must decrease left to right")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pth", required=True, help="reference unfolding_angles.pth")
    p.add_argument(
        "--dataset", required=True, choices=["kitti_360", "kitti_raw"]
    )
    p.add_argument(
        "--out_dir",
        default=os.path.join(
            os.path.dirname(__file__), "..", "r2dm_tpu", "data", "angles"
        ),
    )
    args = p.parse_args()

    angles = convert(args.pth)
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, f"{args.dataset}_unfolding_angles.npz")
    np.savez_compressed(out, angles=angles)
    print(
        f"wrote {out}: {angles.shape} float32, "
        f"elevation [{angles[..., 0].min():.4f}, {angles[..., 0].max():.4f}] rad, "
        f"azimuth [{angles[..., 1].min():.4f}, {angles[..., 1].max():.4f}] rad"
    )


if __name__ == "__main__":
    main()
