"""Reverse interop: exporting OUR weights to a reference-loadable .pth.

Two layers of proof for r2dm_tpu/utils/torch_import.py::export_unet_state_dict
(the inverse of the import shim):

1. exact inversion — importing a captured reference state_dict (the
   tests/golden fixtures) and exporting it back reproduces every
   translated tensor bit-for-bit;
2. the LIVE reference network (torch CPU, /root/reference read-only)
   accepts the exported dict and its forward matches the golden output —
   i.e. a model trained here really runs reference-side
   (reference utils/inference.py:27-29 load path).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from r2dm_tpu.utils.torch_import import (
    _DROP,
    convert_unet_state_dict,
    export_refinenet_state_dict,
    export_unet_state_dict,
    refinenet_variables_from_reference,
    variables_from_reference,
)

GOLDEN = Path(__file__).parent / "golden"


def load_case(name):
    g = np.load(GOLDEN / f"{name}.npz")
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    return g, sd


@pytest.mark.parametrize(
    "cenc", ["fourier_features", "spherical_harmonics", "polar_coordinates"]
)
def test_export_inverts_import_exactly(cenc):
    _, sd = load_case(f"tiny_unet_{cenc}")
    variables = variables_from_reference(sd)
    out = export_unet_state_dict(variables)

    translated = {k: v for k, v in sd.items() if not _DROP.search(k)}
    assert set(out) == {f"model.{k}" for k in translated}
    for k, v in translated.items():
        np.testing.assert_array_equal(
            out[f"model.{k}"], np.asarray(v, np.float32), err_msg=k
        )


def test_export_then_import_roundtrip():
    """export -> convert re-derives the identical flax tree (leaf-wise)."""
    import jax

    _, sd = load_case("tiny_unet_fourier_features")
    variables = variables_from_reference(sd)
    params2, buffers2 = convert_unet_state_dict(
        export_unet_state_dict(variables)
    )
    flat1 = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat2 = jax.tree_util.tree_flatten_with_path(params2)[0]
    assert [p for p, _ in flat1] == [p for p, _ in flat2]
    for (p, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p))
    np.testing.assert_array_equal(
        np.asarray(variables["buffers"]["coords"]), buffers2["coords"]
    )


def test_refinenet_export_inverts_import_exactly():
    _, sd = load_case("tiny_refinenet")
    variables = refinenet_variables_from_reference(sd)
    out = export_refinenet_state_dict(variables)

    translated = {k: v for k, v in sd.items() if not _DROP.search(k)}
    assert set(out) == {f"model.{k}" for k in translated}
    for k, v in translated.items():
        np.testing.assert_array_equal(
            out[f"model.{k}"], np.asarray(v, np.float32), err_msg=k
        )


@pytest.mark.slow
@pytest.mark.skipif(
    not Path("/root/reference").exists(), reason="reference not mounted"
)
def test_live_reference_accepts_refinenet_export():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from models.refinenet import LiDARGenRefineNet as RefNet

    g, sd = load_case("tiny_refinenet")
    variables = refinenet_variables_from_reference(sd)
    out = export_refinenet_state_dict(variables)

    net = RefNet(
        in_channels=2, resolution=(16, 64), base_channels=8,
        channel_multiplier=(1, 2, 2, 2),
    )
    sd_t = {
        k[len("model."):]: torch.from_numpy(np.array(v, copy=True))
        for k, v in out.items()
    }
    missing, unexpected = net.load_state_dict(sd_t, strict=False)
    assert unexpected == [], unexpected
    assert all(_DROP.search(k) for k in missing), missing

    net.eval()
    with torch.no_grad():
        y = net(torch.from_numpy(g["x"]), None)
    np.testing.assert_allclose(y.numpy(), g["y"], rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.skipif(
    not Path("/root/reference").exists(), reason="reference not mounted"
)
def test_live_reference_accepts_export():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from models.efficient_unet import EfficientUNet as RefUNet

    g, sd = load_case("tiny_unet_fourier_features")
    variables = variables_from_reference(sd)
    out = export_unet_state_dict(variables)

    net = RefUNet(
        in_channels=2,
        resolution=(16, 64),
        base_channels=16,
        temb_channels=None,
        channel_multiplier=(1, 2, 4, 8),
        num_residual_blocks=(1, 1, 1, 1),
        gn_num_groups=4,
        gn_eps=1e-6,
        attn_num_heads=4,
        coords_encoding="fourier_features",
        ring=True,
    )
    sd_t = {
        k[len("model."):]: torch.from_numpy(np.array(v, copy=True))
        for k, v in out.items()
    }
    missing, unexpected = net.load_state_dict(sd_t, strict=False)
    assert unexpected == [], unexpected
    # only construction-time constants may be absent from the export
    assert all(_DROP.search(k) for k in missing), missing

    net.eval()
    with torch.no_grad():
        y = net(torch.from_numpy(g["x"]), torch.from_numpy(g["t"]))
    np.testing.assert_allclose(
        y.numpy(), g["y"], rtol=1e-5, atol=1e-6
    )
