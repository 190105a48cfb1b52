"""completion_demo.py end-to-end smoke on the synthetic dataset (tiny model,
2-step RePaint; reference completion_demo.py:18-167)."""

import argparse
import sys
from pathlib import Path

import pytest


def test_few_step_preset():
    """--few_step fills the measured interactive config (8x4x1 + bf16 + W2C)
    without clobbering explicit user overrides (VERDICT r4 item 3)."""
    sys.path.insert(0, "/root/repo")
    from completion_demo import apply_few_step_preset

    a = apply_few_step_preset(
        argparse.Namespace(num_steps=32, num_resample_steps=16, jump_length=1)
    )
    assert (a.num_steps, a.num_resample_steps, a.jump_length) == (8, 4, 1)
    assert a.bf16 and a.latency_layout

    b = apply_few_step_preset(
        argparse.Namespace(num_steps=16, num_resample_steps=2, jump_length=1)
    )
    assert (b.num_steps, b.num_resample_steps) == (16, 2)


@pytest.mark.slow
def test_completion_demo_cli(tmp_path, monkeypatch):
    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    from r2dm_tpu.checkpoint import save_checkpoint
    from r2dm_tpu.config import Config, DataConfig, ModelConfig, asdict
    from r2dm_tpu.inference import build_model, model_coords

    cfg = Config(
        data=DataConfig(
            resolution=(16, 64), dataset="synthetic", projection="spherical-64"
        ),
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
    ckpt = tmp_path / "tiny.msgpack"
    save_checkpoint(str(ckpt), asdict(cfg), variables, ema_weights=variables, step=1)

    monkeypatch.chdir(tmp_path)
    from completion_demo import main

    main(
        argparse.Namespace(
            ckpt=str(ckpt),
            data_root=None,
            num_steps=2,
            num_resample_steps=1,
            jump_length=1,
            seed=0,
            sample_id=0,
            rangenet_tar=None,
        )
    )
    outs = list(Path(".").glob("completion_*.png"))
    assert outs, "completion figure not written"
    assert outs[0].stat().st_size > 0
