"""Rendering parity vs reference goldens (tools/gen_goldens.py gen_render)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from r2dm_tpu.render import (
    bilinear_rasterizer,
    colorize,
    estimate_surface_normal,
    make_Rt,
    render_point_clouds,
)

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN / "render.npz")


def test_bilinear_rasterizer(g):
    out = bilinear_rasterizer(
        jnp.asarray(g["coords"]), jnp.asarray(g["values"]), (32, 32)
    )
    # reference returns NCHW
    np.testing.assert_allclose(
        np.asarray(out), g["rast"].transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_surface_normals(g):
    pts = jnp.asarray(g["pts"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    ours = estimate_surface_normal(pts, d=2, mode="closest")
    np.testing.assert_allclose(
        np.asarray(ours), g["normals"].transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-3
    )
    ours_mean = estimate_surface_normal(pts, d=1, mode="mean")
    np.testing.assert_allclose(
        np.asarray(ours_mean),
        g["normals_mean"].transpose(0, 2, 3, 1),
        rtol=1e-3,
        atol=1e-3,
    )


def test_make_Rt(g):
    R, t = make_Rt(pitch=np.pi / 4, yaw=np.pi / 8, z=0.8)
    np.testing.assert_allclose(np.asarray(R), g["R"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), g["t_vec"], atol=1e-7)


def test_render_point_clouds(g):
    bev = render_point_clouds(
        jnp.asarray(g["points_flat"]),
        jnp.asarray(g["colors"]),
        size=64,
        R=jnp.asarray(g["R"]),
        t=jnp.asarray(g["t_vec"]),
    )
    np.testing.assert_allclose(
        np.asarray(bev), g["bev"].transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-3
    )


def test_colorize(g):
    out = colorize(jnp.asarray(g["scalar"]))
    ref = g["colorized"].transpose(0, 2, 3, 1)  # NCHW uint8 -> NHWC
    np.testing.assert_array_equal(np.asarray(out), ref)
