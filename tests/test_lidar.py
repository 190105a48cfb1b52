"""LiDARUtility parity vs golden fixtures (tools/gen_goldens.py gen_lidar)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu.lidar import LiDARUtility, nearest_exact_resize_hw
from r2dm_tpu.ops.encoding import get_hdl64e_linear_ray_angles

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN / "lidar.npz")


@pytest.mark.parametrize("fmt", ["log_depth", "inverse_depth", "depth"])
def test_depth_conversions(g, fmt):
    util = LiDARUtility((16, 64), fmt, 1.45, 80.0, data_format="NCHW")
    metric = jnp.asarray(g["metric"])
    converted = util.convert_depth(metric)
    np.testing.assert_allclose(
        np.asarray(converted), g[f"{fmt}_converted"], rtol=1e-5, atol=1e-6
    )
    reverted = util.revert_depth(converted)
    np.testing.assert_allclose(
        np.asarray(reverted), g[f"{fmt}_reverted"], rtol=1e-4, atol=1e-4
    )


def test_to_xyz_and_mask(g):
    util = LiDARUtility((16, 64), "log_depth", 1.45, 80.0, data_format="NCHW")
    metric = jnp.asarray(g["metric"])
    np.testing.assert_allclose(
        np.asarray(util.ray_angles),
        np.transpose(g["ray_angles"][0], (1, 2, 0)),
        rtol=1e-6,
        atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(util.get_mask(metric)), g["mask"])
    np.testing.assert_allclose(
        np.asarray(util.to_xyz(metric)), g["xyz"], rtol=1e-4, atol=1e-4
    )


def test_nhwc_layout_consistency(g):
    """NHWC and NCHW instances must agree up to transpose."""
    nchw = LiDARUtility((16, 64), "log_depth", 1.45, 80.0, data_format="NCHW")
    nhwc = LiDARUtility((16, 64), "log_depth", 1.45, 80.0, data_format="NHWC")
    metric_nchw = jnp.asarray(g["metric"])
    metric_nhwc = jnp.transpose(metric_nchw, (0, 2, 3, 1))
    a = np.asarray(nchw.to_xyz(metric_nchw))
    b = np.asarray(nhwc.to_xyz(metric_nhwc))
    np.testing.assert_allclose(a, np.transpose(b, (0, 3, 1, 2)), atol=1e-6)


def test_normalize_roundtrip():
    x = jnp.linspace(0, 1, 11)
    np.testing.assert_allclose(
        np.asarray(LiDARUtility.denormalize(LiDARUtility.normalize(x))), x, atol=1e-7
    )


def test_nearest_exact_resize_matches_torch():
    """Downsample the (64, 2048) HDL-64E grid to (64, 1024) and compare
    against torch's F.interpolate(mode='nearest-exact') — the resampling used
    by the reference trainer (train.py:102-107, utils/lidar.py:42-47)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    angles = get_hdl64e_linear_ray_angles(64, 2048)  # (H, W, 2)
    ours = nearest_exact_resize_hw(angles, (64, 1024))
    t = torch.from_numpy(np.transpose(angles, (2, 0, 1))[None])
    ref = F.interpolate(t, size=(64, 1024), mode="nearest-exact")[0].numpy()
    np.testing.assert_allclose(ours, np.transpose(ref, (1, 2, 0)), atol=0)

    ours_up = nearest_exact_resize_hw(angles[:16, :64], (32, 128))
    t2 = torch.from_numpy(np.transpose(angles[:16, :64], (2, 0, 1))[None])
    ref_up = F.interpolate(t2, size=(32, 128), mode="nearest-exact")[0].numpy()
    np.testing.assert_allclose(ours_up, np.transpose(ref_up, (1, 2, 0)), atol=0)


def test_reference_ray_angle_constructor_layout(g):
    """(1, 2, H, W) reference-layout ray_angles must be accepted."""
    util = LiDARUtility(
        (16, 64), "log_depth", 1.45, 80.0,
        ray_angles=g["ray_angles"], data_format="NCHW",
    )
    np.testing.assert_allclose(
        np.asarray(util.ray_angles),
        np.transpose(g["ray_angles"][0], (1, 2, 0)),
        atol=1e-7,
    )
