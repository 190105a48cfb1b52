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


@pytest.mark.slow
def test_train_preemption_checkpoint(tmp_path):
    """SIGTERM mid-run (TPU preemption) checkpoints and exits 0; the
    checkpoint resumes. The reference has no recovery story (SURVEY.md §5)."""
    import os
    import signal
    import subprocess
    import time

    from r2dm_tpu.checkpoint import load_checkpoint

    out = tmp_path / "run"
    env = dict(os.environ)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(var, None)  # never dial the real chip from the child
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/r2dm_tpu_test_jax_cache"
    )
    proc = subprocess.Popen(
        [sys.executable] + _argv(out, ["--training.num_steps", "100000"]),
        cwd="/root/repo",
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        # wait until at least one step has logged (step 1 logs immediately)
        deadline = time.time() + 600
        metrics = out / "metrics.jsonl"
        while time.time() < deadline:
            if metrics.exists() and metrics.stat().st_size > 0:
                break
            if proc.poll() is not None:
                raise AssertionError(f"train exited early:\n{proc.stdout.read()}")
            time.sleep(1)
        else:
            raise AssertionError("no training step within 600s")
        proc.send_signal(signal.SIGTERM)
        stdout, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, stdout
    assert "preempted at step" in stdout, stdout

    ckpt_path = out / "checkpoint.msgpack"
    ckpt = load_checkpoint(str(ckpt_path))
    stopped_at = ckpt["global_step"]
    assert 1 <= stopped_at < 100000

    # the preemption checkpoint resumes (in-process: fast, shares the cache)
    import importlib

    from r2dm_tpu.config import parse_cli

    train_mod = importlib.import_module("train")
    old_argv = sys.argv
    sys.argv = _argv(
        out,
        [
            "--training.num_steps", str(stopped_at + 2),
            "--training.resume", str(ckpt_path),
        ],
    )
    try:
        train_mod.train(parse_cli())
    finally:
        sys.argv = old_argv
    assert load_checkpoint(str(ckpt_path))["global_step"] == stopped_at + 2


def test_host_rss_helpers(monkeypatch):
    """Fast coverage of the RSS-watchdog plumbing: the reader returns a
    sane value and the re-exec argv keeps the config while pinning
    --training.resume to the new checkpoint (both '--flag v' and
    '--flag=v' spellings)."""
    sys.path.insert(0, "/root/repo")
    import train as train_mod

    rss = train_mod._host_rss_gb()
    assert 0.0 < rss < 64.0  # this test process is MBs..GBs, never 64 GB

    calls = {}
    monkeypatch.setattr(
        train_mod.os, "execv", lambda exe, argv: calls.setdefault("argv", argv)
    )
    monkeypatch.setattr(
        sys, "argv", ["train.py", "--training.num_steps", "9"]
    )
    train_mod._restart_self("/ckpt/a.msgpack")
    assert calls["argv"][1:] == [
        "train.py", "--training.num_steps", "9",
        "--training.resume", "/ckpt/a.msgpack",
    ]

    calls.clear()
    monkeypatch.setattr(
        sys,
        "argv",
        ["train.py", "--training.resume", "/old.msgpack",
         "--training.resume=/older.msgpack", "--training.num_steps", "9"],
    )
    train_mod._restart_self("/ckpt/b.msgpack")
    assert calls["argv"][1:] == [
        "train.py", "--training.resume", "/ckpt/b.msgpack",
        "--training.num_steps", "9",
    ]


@pytest.mark.slow
def test_train_rss_watchdog_restarts_and_completes(tmp_path):
    """Host-RSS watchdog e2e: with a limit every process exceeds, the CLI
    run checkpoints + re-execs itself every 50 steps and still completes
    the full step count across execs (the axon h2d staging leak would
    otherwise OOM any long run — measured ~21 MB leaked per b32 step)."""
    import os
    import subprocess

    from r2dm_tpu.checkpoint import load_checkpoint

    out = tmp_path / "run"
    env = dict(os.environ)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(var, None)  # never dial the real chip from the child
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/r2dm_tpu_test_jax_cache"
    )
    proc = subprocess.run(
        [sys.executable]
        + _argv(
            out,
            [
                "--training.num_steps", "120",
                "--training.max_host_rss_gb", "0.05",
            ],
        ),
        cwd="/root/repo",
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout
    restarts = proc.stdout.count("restarting the process")
    assert restarts == 2, proc.stdout  # at steps 50 and 100
    assert proc.stdout.count("resumed from") == 2, proc.stdout
    assert load_checkpoint(str(out / "checkpoint.msgpack"))["global_step"] == 120
