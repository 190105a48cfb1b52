"""Committed scan-unfolding angle tables (closes the last SURVEY 2.2 row).

``r2dm_tpu/data/angles/{kitti_360,kitti_raw}_unfolding_angles.npz``
re-encode the reference's committed calibration artifacts
(``data/*/unfolding_angles.pth``, consumed at reference ``train.py:102-107``)
via ``tools/import_unfolding_angles.py`` — factual per-pixel angle data
measured from the KITTI scans, category-equivalent to the split tables in
``data/kitti_splits.py`` (values re-encoded, no binary copied). These tests
pin the tables' invariants and the consuming path: ``model_coords`` must
resolve the table for unfolding configs and resize it with nearest-exact
semantics identical to the reference's ``F.interpolate`` call.
"""

import math
import os

import numpy as np
import pytest

ANGLES_DIR = os.path.join(
    os.path.dirname(__file__), "..", "r2dm_tpu", "data", "angles"
)
DATASETS = ["kitti_360", "kitti_raw"]


def _load(dataset):
    return np.load(
        os.path.join(ANGLES_DIR, f"{dataset}_unfolding_angles.npz")
    )["angles"]


@pytest.mark.parametrize("dataset", DATASETS)
def test_table_invariants(dataset):
    angles = _load(dataset)
    assert angles.shape == (64, 2048, 2)
    assert angles.dtype == np.float32
    elev, azim = angles[..., 0], angles[..., 1]
    # HDL-64E fires +3 deg down to -25 deg; rows ordered top to bottom
    assert -0.6 < elev.min() and elev.max() < 0.2
    assert (np.diff(elev.mean(axis=1)) < 0).all()
    # azimuth spans [-pi, pi], decreasing left to right (interior columns:
    # the +-pi seam wraps the measured mean of the first/last column)
    assert -math.pi <= azim.min() and azim.max() <= math.pi
    assert (np.diff(azim.mean(axis=0)[1:-1]) < 0).all()


@pytest.mark.parametrize("dataset", DATASETS)
def test_model_coords_resolves_unfolding_config(dataset):
    from r2dm_tpu.config import Config, DataConfig
    from r2dm_tpu.inference import model_coords

    cfg = Config(
        data=DataConfig(
            dataset=dataset, projection="unfolding-2048", resolution=(64, 1024)
        )
    )
    coords = model_coords(cfg)
    assert coords.shape == (64, 1024, 2)
    assert coords.dtype == np.float32
    # downsampled table keeps the calibration envelope
    full = _load(dataset)
    assert coords[..., 0].min() >= full[..., 0].min()
    assert coords[..., 0].max() <= full[..., 0].max()


@pytest.mark.parametrize("size", [(64, 1024), (32, 512), (64, 2048)])
def test_resize_matches_reference_interpolate(size):
    """model_coords' nearest-exact resize == the reference's consumption
    (train.py:104-107: F.interpolate(table, resolution, 'nearest-exact'))."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from r2dm_tpu.lidar import nearest_exact_resize_hw

    table = _load("kitti_360")
    ours = nearest_exact_resize_hw(table, size)
    theirs = F.interpolate(
        torch.from_numpy(np.moveaxis(table, -1, 0))[None],
        size=size,
        mode="nearest-exact",
    )[0]
    np.testing.assert_array_equal(ours, np.moveaxis(theirs.numpy(), 0, -1))
