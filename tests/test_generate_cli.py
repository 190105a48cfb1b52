"""generate.py end-to-end smoke: previews + the --video path (which must
degrade gracefully when imageio is absent — VERDICT r1 item 8)."""

import argparse
import sys
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    from r2dm_tpu.checkpoint import save_checkpoint
    from r2dm_tpu.config import Config, DataConfig, ModelConfig, asdict
    from r2dm_tpu.inference import build_model, model_coords

    cfg = Config(
        data=DataConfig(resolution=(16, 64)),
        model=ModelConfig(
            base_channels=8,
            channel_multiplier=(1, 2, 2, 2),
            num_residual_blocks=(1, 1, 1, 1),
            gn_num_groups=4,
            attn_num_heads=2,
        ),
    )
    model = build_model(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 64, 2)), jnp.zeros((1,))
    )
    variables = {
        **variables,
        "buffers": {"coords": jnp.asarray(model_coords(cfg))},
    }
    path = tmp_path_factory.mktemp("ckpt") / "tiny.msgpack"
    save_checkpoint(str(path), asdict(cfg), variables, ema_weights=variables, step=1)
    return str(path)


@pytest.mark.slow
@pytest.mark.parametrize("video", [False, True])
def test_generate_cli(tiny_ckpt, tmp_path, monkeypatch, video):
    monkeypatch.chdir(tmp_path)
    from generate import main

    main(
        argparse.Namespace(
            ckpt=tiny_ckpt,
            mode="ddpm",
            batch_size=2,
            sampling_steps=3,
            seed=0,
            video=video,
        )
    )
    assert Path("samples_img.png").exists()
    assert Path("samples_bev.png").exists()
    try:
        import imageio

        imageio.get_writer(str(tmp_path / "probe.mp4"), mode="I", fps=60).close()
        have_video_backend = True
    except Exception:  # noqa: BLE001 — imageio missing or no ffmpeg plugin
        have_video_backend = False
    if video and have_video_backend:
        assert Path("samples.mp4").exists()
    elif video:
        # without a video backend --video falls back to a PNG frame sequence
        frames = sorted(Path("samples_frames").glob("frame_*.png"))
        assert len(frames) == 4  # steps+1 snapshots for a 3-step chain
    img = np.asarray(__import__("matplotlib.image", fromlist=["imread"]).imread(
        "samples_img.png"
    ))
    assert img.size > 0


@pytest.mark.slow
def test_generate_cli_int8_lane(tiny_ckpt, tmp_path, monkeypatch):
    """--int8 serving lane: the W8A8 ring-conv flag flows through the CLI
    and produces finite previews (quant exactness is in test_quant.py)."""
    monkeypatch.chdir(tmp_path)
    from generate import main
    from r2dm_tpu.models import layers

    try:
        main(
            argparse.Namespace(
                ckpt=tiny_ckpt,
                mode="ddim",
                batch_size=2,
                sampling_steps=2,
                seed=0,
                video=False,
                int8=True,
            )
        )
        assert layers.QUANT_CONV == "w8a8"  # the flag actually engaged
    finally:
        layers.QUANT_CONV = None
    assert Path("samples_img.png").exists()
    assert Path("samples_bev.png").exists()
