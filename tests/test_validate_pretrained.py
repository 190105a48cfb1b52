"""End-to-end test of tools/validate_pretrained.py with SYNTHETIC weights.

Builds a real reference-architecture checkpoint (torch CPU, random weights)
via the read-only /root/reference oracle, saves it as a .pth, and asserts the
validation chain passes every stage — so the harness is proven before any
released checkpoint is downloadable (VERDICT round 1, item 5).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


def _make_synthetic_ckpt(tmp_path: Path) -> Path:
    """Reference-layout {cfg, weights, ema_weights} .pth with random params."""
    sys.path.insert(0, str(REF))
    from models.efficient_unet import EfficientUNet as RefUNet

    from r2dm_tpu.config import Config, DataConfig, ModelConfig, asdict

    cfg = Config(
        data=DataConfig(resolution=(16, 64)),
        model=ModelConfig(
            base_channels=16,
            gn_num_groups=4,
            attn_num_heads=4,
            num_residual_blocks=(1, 1, 1, 1),
        ),
    )
    torch.manual_seed(0)
    net = RefUNet(
        in_channels=2,
        resolution=tuple(cfg.data.resolution),
        base_channels=cfg.model.base_channels,
        temb_channels=cfg.model.temb_channels,
        channel_multiplier=tuple(cfg.model.channel_multiplier),
        num_residual_blocks=tuple(cfg.model.num_residual_blocks),
        gn_num_groups=cfg.model.gn_num_groups,
        gn_eps=cfg.model.gn_eps,
        attn_num_heads=cfg.model.attn_num_heads,
        coords_encoding=cfg.model.coords_encoding,
        ring=True,
    )
    # randomize so zero-init convs don't mask import bugs
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    sd = {f"model.{k}": v for k, v in net.state_dict().items()}
    ckpt = {"cfg": asdict(cfg), "weights": sd, "ema_weights": sd, "global_step": 1}
    path = tmp_path / "synthetic-r2dm.pth"
    torch.save(ckpt, path)
    return path


@pytest.mark.slow
def test_validate_pretrained_all_stages(tmp_path):
    ckpt = _make_synthetic_ckpt(tmp_path)
    env = dict(os.environ)
    # force the child onto host CPU: the axon sitecustomize registers the
    # remote TPU whenever these are set (see __graft_entry__.py)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "validate_pretrained.py"),
            str(ckpt),
            "--sample_steps",
            "4",
            "--json",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["ok"], report
    assert set(report["stages"]) == {"import", "ref-parity", "sample", "metrics"}
    for name, r in report["stages"].items():
        assert r["ok"], (name, r)
