"""Train-gate behavior of the quality protocol scripts.

tools/{flow,ddim}_quality_check.sh guard their expensive training stage with
a ``.train_done`` marker.  Interrupted long runs (SIGTERM preemption, the RSS
watchdog, a backend outage) leave a RESUMABLE checkpoint; the gate must
resume it — a round-5 10k-step on-device run was preempted at step 6300 and
rerunning the old gate would have deleted it — while still retraining from
scratch when the stored ``training.num_steps`` target does not match the
request (the cosine LR schedule keys on it).

Runs the REAL bash scripts end-to-end through the gate (tiny 16x128/base-8
model on CPU, ``R2DM_QUALITY_TRAIN_ONLY=1`` stops before the sample/eval
legs).  Reference protocol being guarded: training toward the quality
numbers of /root/reference/train.py + evaluate.py.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMALL_ARGS = [
    "--data.projection", "spherical-256",
    "--data.resolution", "16,128",
    "--model.base_channels", "8",
    "--model.channel_multiplier", "1,2,2,2",
    "--model.num_residual_blocks", "1,1,1,1",
    "--model.gn_num_groups", "4",
    "--model.attn_num_heads", "2",
]


def _env():
    env = dict(os.environ)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(var, None)  # never dial the real chip from children
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["R2DM_QUALITY_TRAIN_ONLY"] = "1"  # stop after the train gate
    return env


def _ckpt_step(work) -> int:
    code = (
        "from r2dm_tpu.checkpoint import load_checkpoint;"
        f"print(load_checkpoint('{work}/ckpt/checkpoint.msgpack')['global_step'])"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=_env(), cwd=REPO,
        capture_output=True, text=True, check=True,
    )
    return int(out.stdout.strip().splitlines()[-1])


def _run_script(script, work, smoke_var):
    env = _env()
    env[smoke_var] = "1"
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "tools", script), str(work), "8"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    return proc.stdout + proc.stderr


@pytest.mark.slow
@pytest.mark.parametrize(
    "script,smoke_var,extra_train_args",
    [
        ("flow_quality_check.sh", "R2DM_FLOWQ_SMOKE",
         ["--diffusion.timestep_type", "flow"]),
        ("ddim_quality_check.sh", "R2DM_DDIMQ_SMOKE", []),
    ],
)
def test_train_gate_resumes_preempted_checkpoint(
    tmp_path, script, smoke_var, extra_train_args
):
    work = tmp_path / "work"
    work.mkdir()

    # Simulate a 60-step run preempted at step 20: train a COMPLETE 20-step
    # run (deterministic — no signal timing), then rewrite the stored target
    # to the smoke gate's 60.  Identical state to a graceful preemption.
    subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--data.dataset", "synthetic",
         "--training.num_steps", "20",
         "--training.batch_size_train", "8",
         "--training.steps_save_model", "20",
         "--training.steps_save_image", "1000000",
         *extra_train_args, *SMALL_ARGS,
         "--training.output_dir", str(work / "ckpt")],
        env=_env(), cwd=REPO, capture_output=True, text=True,
        timeout=600, check=True,
    )
    cfg_path = work / "ckpt" / "training_config.json"
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["num_steps"] = 60
    cfg_path.write_text(json.dumps(cfg))

    # Gate must RESUME (not retrain): 20 -> 60.
    out = _run_script(script, work, smoke_var)
    assert "resuming preempted training" in out, out[-3000:]
    assert (work / "ckpt" / ".train_done").exists()
    assert _ckpt_step(work) == 60

    # A stored target that mismatches the request must retrain from scratch.
    (work / "ckpt" / ".train_done").unlink()
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["num_steps"] = 999
    cfg_path.write_text(json.dumps(cfg))
    out = _run_script(script, work, smoke_var)
    assert "resuming preempted training" not in out, out[-3000:]
    assert (work / "ckpt" / ".train_done").exists()
    assert _ckpt_step(work) == 60

    # With .train_done present the gate must not touch the checkpoint.
    out = _run_script(script, work, smoke_var)
    assert "resuming preempted training" not in out, out[-3000:]
    assert _ckpt_step(work) == 60
