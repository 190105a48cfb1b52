"""Build the per-pixel (elevation, azimuth) angle table for scan-unfolding
projections.

The reference ships precomputed binary tables
(data/{kitti_360,kitti_raw}/unfolding_angles.pth, loaded at train.py:102-107)
whose provenance is the dataset itself: for every pixel of the unfolded
64x2048 grid, the average direction of the points that land there. This tool
recomputes the table from raw scans so no binary is copied:

  python tools/make_unfolding_angles.py --dataset kitti_360 \
      --data_root /path/to/data_3d_raw [--num_scans 500]

writes r2dm_tpu/data/angles/<dataset>_unfolding_angles.npz with an
(H, W, 2) float32 array [elevation, azimuth] in radians, consumed by
r2dm_tpu.inference.model_coords for projection="unfolding-*".
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from r2dm_tpu.data.datasets import KITTI360, KITTIRaw  # noqa: E402
from r2dm_tpu.data.projection import load_points_as_images  # noqa: E402


def main(args):
    cls = {"kitti_360": KITTI360, "kitti_raw": KITTIRaw}[args.dataset]
    ds = cls(args.data_root, split="train", projection=f"unfolding-{args.width}")
    H, W = 64, args.width
    # circular means via per-angle sin/cos accumulation
    acc_sin = np.zeros((H, W, 2), np.float64)
    acc_cos = np.zeros((H, W, 2), np.float64)
    count = np.zeros((H, W, 1), np.float64)

    step = max(1, len(ds) // args.num_scans)
    used = 0
    for i in range(0, len(ds), step):
        planes = load_points_as_images(
            ds.file_paths[i], scan_unfolding=True, H=H, W=W
        )
        xyz = planes[..., :3]
        depth = planes[..., 4]
        valid = depth > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            elevation = np.arcsin(np.where(valid, xyz[..., 2] / depth, 0.0))
            azimuth = np.arctan2(xyz[..., 1], xyz[..., 0])
        ang = np.stack([elevation, azimuth], axis=-1)
        v = valid[..., None]
        acc_sin += np.sin(ang) * v
        acc_cos += np.cos(ang) * v
        count += v
        used += 1
        if used % 50 == 0:
            print(f"{used} scans accumulated", flush=True)

    mean = np.arctan2(acc_sin, acc_cos)
    # fill empty pixels from the column/row-wise spherical grid fallback
    from r2dm_tpu.ops.encoding import get_hdl64e_linear_ray_angles

    fallback = get_hdl64e_linear_ray_angles(H, W).astype(np.float64)
    empty = count[..., 0] == 0
    mean[empty] = fallback[empty]

    out_dir = args.out_dir or os.path.join(
        os.path.dirname(__file__), "..", "r2dm_tpu", "data", "angles"
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{args.dataset}_unfolding_angles.npz")
    np.savez_compressed(path, angles=mean.astype(np.float32))
    print(f"wrote {path} from {used} scans ({int(empty.sum())} empty pixels)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", choices=["kitti_360", "kitti_raw"], required=True)
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--width", type=int, default=2048)
    parser.add_argument("--num_scans", type=int, default=500)
    parser.add_argument(
        "--out_dir", default=None,
        help="output dir (default r2dm_tpu/data/angles; consumers honor "
        "$R2DM_ANGLES_DIR)",
    )
    main(parser.parse_args())
