"""Multi-process (multi-host) data-parallel training, end to end.

The reference's distributed story is single-node DDP via accelerate
(train.py:45-53); ours is jax.distributed + a global mesh. This test runs
REAL multi-process JAX: two coordinated processes with 4 CPU devices each
against a single-process 8-device reference, training the same tiny
synthetic config — the per-host loader slices (data/loader.py:63-66) must
assemble into the same global batch (parallel/mesh.py shard_batch's
make_array_from_process_local_data path), so step metrics and the final
checkpoint must match.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARGS = [
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
    "--training.num_steps", "2",
    "--training.steps_save_image", "100000",
    "--training.steps_save_model", "2",
]


def _child_env(n_local_devices: int, extra: dict) -> dict:
    env = dict(os.environ)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(var, None)  # never dial the real chip from children
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices} "
        # the Gloo context init defaults to a ~30 s rendezvous window; on
        # this 1-CPU box the two children can reach their first collective
        # with minutes of compile skew (cold cache), so widen it
        "--xla_cpu_collective_timeout_seconds=600"
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra)
    return env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(out_dir, n_local_devices, extra_env, timeout=420):
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "train.py")]
        + ARGS[1:]
        + ["--training.output_dir", str(out_dir)],
        env=_child_env(n_local_devices, extra_env),
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def _first_loss(out_dir) -> float:
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        rec = json.loads(f.readline())
    assert rec["step"] == 1
    return float(rec["loss"])


def _flat_leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _flat_leaves(tree[k], prefix + "/" + str(k))
    else:
        yield prefix, np.asarray(tree)


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    single_dir = tmp_path / "single"
    multi_dir = tmp_path / "multi"

    p = _run(single_dir, 8, {})
    out, _ = p.communicate(timeout=420)
    assert p.returncode == 0, out[-3000:]

    port = _free_port()
    procs = [
        _run(
            multi_dir,
            4,
            {
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(pid),
            },
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    np.testing.assert_allclose(
        _first_loss(multi_dir), _first_loss(single_dir), rtol=1e-5
    )

    from r2dm_tpu.checkpoint import load_checkpoint

    ck_s = load_checkpoint(str(single_dir / "checkpoint.msgpack"))
    ck_m = load_checkpoint(str(multi_dir / "checkpoint.msgpack"))
    assert ck_s["global_step"] == ck_m["global_step"] == 2
    for (ks, vs), (km, vm) in zip(
        _flat_leaves(ck_s["weights"]), _flat_leaves(ck_m["weights"])
    ):
        assert ks == km
        np.testing.assert_allclose(vs, vm, rtol=1e-5, atol=1e-6, err_msg=ks)
