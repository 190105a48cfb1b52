"""RefineNet parity vs the reference golden (tools/gen_goldens.py)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from r2dm_tpu.models.refinenet import LiDARGenRefineNet, bilinear_align_corners
from r2dm_tpu.utils.torch_import import refinenet_variables_from_reference

GOLDEN = Path(__file__).parent / "golden"


def test_refinenet_forward_parity():
    g = np.load(GOLDEN / "tiny_refinenet.npz")
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    variables = refinenet_variables_from_reference(sd)
    net = LiDARGenRefineNet(
        in_channels=2, resolution=(16, 64), base_channels=8,
        channel_multiplier=(1, 2, 2, 2),
    )
    x = jnp.asarray(np.transpose(g["x"], (0, 2, 3, 1)))
    y = net.apply(variables, x, None)
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(g["y"], (0, 2, 3, 1)), rtol=1e-3, atol=1e-4
    )


def test_refinenet_param_tree_matches_init():
    g = np.load(GOLDEN / "tiny_refinenet.npz")
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    imported = refinenet_variables_from_reference(sd)
    net = LiDARGenRefineNet(
        in_channels=2, resolution=(16, 64), base_channels=8,
        channel_multiplier=(1, 2, 2, 2),
    )
    fresh = net.init(jax.random.key(0), jnp.zeros((1, 16, 64, 2)), None)
    fresh_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(fresh)
    }
    imp_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(imported)
    }
    assert fresh_paths == imp_paths


def test_bilinear_align_corners_matches_torch():
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 32, 3)).astype(np.float32)
    ours = np.asarray(bilinear_align_corners(jnp.asarray(x), (16, 64)))
    ref = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(16, 64),
        mode="bilinear", align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
