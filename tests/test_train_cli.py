"""End-to-end train.py smoke: synthetic data, a few steps, checkpoint +
resume (the resume path is our addition; the reference has none —
SURVEY.md §5)."""

import sys

import numpy as np
import pytest


def _argv(out_dir, extra):
    return [
        "train.py",
        "--data.dataset", "synthetic",
        "--data.projection", "spherical-256",
        "--data.resolution", "16,128",
        "--model.base_channels", "8",
        "--model.channel_multiplier", "1,2,2,2",
        "--model.num_residual_blocks", "1,1,1,1",
        "--model.gn_num_groups", "4",
        "--model.attn_num_heads", "2",
        "--training.batch_size_train", "8",
        "--training.lr_warmup_steps", "2",
        # keep sampling/image logging out of the fast test
        "--training.steps_save_image", "100000",
        "--training.steps_save_model", "100000",
        "--training.output_dir", str(out_dir),
    ] + extra


@pytest.mark.slow
def test_train_cli_and_resume(tmp_path, monkeypatch):
    sys.path.insert(0, "/root/repo")
    from train import train
    from r2dm_tpu.config import parse_cli
    from r2dm_tpu.checkpoint import load_checkpoint

    out = tmp_path / "run"
    monkeypatch.setattr(
        sys, "argv", _argv(out, ["--training.num_steps", "3"])
    )
    train(parse_cli())
    ckpt = load_checkpoint(str(out / "checkpoint.msgpack"))
    assert ckpt["global_step"] == 3
    leaves = [np.asarray(x) for x in _tree_leaves(ckpt["weights"])]
    assert all(np.isfinite(l).all() for l in leaves)

    monkeypatch.setattr(
        sys,
        "argv",
        _argv(
            out,
            [
                "--training.num_steps", "5",
                "--training.resume", str(out / "checkpoint.msgpack"),
            ],
        ),
    )
    train(parse_cli())
    ckpt2 = load_checkpoint(str(out / "checkpoint.msgpack"))
    assert ckpt2["global_step"] == 5


def _tree_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _tree_leaves(v)
    else:
        yield tree
