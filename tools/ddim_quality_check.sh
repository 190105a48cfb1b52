#!/bin/bash
# Relative-quality check for the few-step serving modes (VERDICT r2 #6):
# train a short synthetic run, sample the SAME seeds with 256-step DDPM,
# 32-step DDIM, and 32-step DPM-Solver++(2M), evaluate all against the
# cached synthetic real set with
# random extractors, and report the FRD/FPD gap. Random-extractor numbers
# are NOT comparable to the paper — only the few-step-vs-256 GAP on identical
# seeds/extractors is meaningful (pipeline-relative quality).
#
# Caching is validated, not filename-based: the trained checkpoint counts
# only with a .train_done marker (a preemption checkpoint from an aborted
# run is never used AS-IS — it bit a round-4 run — but one matching the
# requested num_steps target is resumed rather than retrained); a sample
# dir counts
# only when its meta.json matches the requested N/steps/mode; evaluate is
# skipped when an eval JSON newer than the sample dir's meta exists.
#
# Usage: bash tools/ddim_quality_check.sh [workdir] [num_samples]
#
# R2DM_DDIMQ_SMOKE=1 shrinks every knob (16x128/base-8 model, toy step
# counts, CPU-pinned) so the SAME script path — train gate, meta-validated
# sample cache, eval-skip logic, summary table — runs end-to-end in CI
# before a device window is spent on it (mirrors flow_quality_check.sh).
# R2DM_QUALITY_TRAIN_STEPS overrides the 600-step default (use a FRESH
# workdir — the .train_done gate keys on the directory, not the count).
# R2DM_QUALITY_TRAIN_ARGS appends raw train.py flags (e.g.
# "--training.lr_warmup_steps 1000": the config default is the reference's
# 10k-step warmup, which a short run never exits — the LR would stay in the
# ramp and the checkpoint would under-train at any step count).
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/r2dm_ddim_quality}
N=${2:-64}
mkdir -p "$WORK"

if [ "${R2DM_DDIMQ_SMOKE:-}" = "1" ]; then
  # smoke mode is a CPU verification of the SCRIPT; pin the host platform
  # (this box's sitecustomize otherwise dials the real TPU)
  export JAX_PLATFORMS=cpu
  unset PALLAS_AXON_POOL_IPS PALLAS_AXON_REMOTE_COMPILE
  TRAIN_STEPS=60; TRAIN_BATCH=8; SAMPLE_BATCH=8
  SPECS="8 ddpm|4 ddim|4 dpmpp_2m"
  SMALL_ARGS="--data.projection spherical-256 --data.resolution 16,128 \
    --model.base_channels 8 --model.channel_multiplier 1,2,2,2 \
    --model.num_residual_blocks 1,1,1,1 --model.gn_num_groups 4 \
    --model.attn_num_heads 2"
else
  TRAIN_STEPS=${R2DM_QUALITY_TRAIN_STEPS:-600}; TRAIN_BATCH=32; SAMPLE_BATCH=64
  SPECS="256 ddpm|32 ddim|32 dpmpp_2m"
  SMALL_ARGS=""
fi

if [ ! -f "$WORK/ckpt/.train_done" ]; then
  # A preempted run (SIGTERM/RSS-watchdog/backend outage) leaves a RESUMABLE
  # checkpoint — continue it instead of retraining from scratch, but only if
  # it was trained toward the same step target (the cosine LR schedule keys
  # on num_steps; a mismatched resume would silently train on the wrong
  # ramp). Anything else is dropped and retrained.
  RESUME_ARGS=""
  if [ -f "$WORK/ckpt/checkpoint.msgpack" ] && \
     python - "$WORK" "$TRAIN_STEPS" <<'PYEOF'
import json, sys
work, target = sys.argv[1], int(sys.argv[2])
try:
    cfg = json.load(open(f"{work}/ckpt/training_config.json"))
    sys.exit(0 if cfg["training"]["num_steps"] == target else 1)
except Exception:
    sys.exit(1)
PYEOF
  then
    RESUME_ARGS="--training.resume $WORK/ckpt/checkpoint.msgpack"
    echo "resuming preempted training from $WORK/ckpt/checkpoint.msgpack"
  else
    rm -rf "$WORK/ckpt"  # no (usable) prior checkpoint: fresh run
  fi
  python train.py \
    --data.dataset synthetic \
    --training.num_steps "$TRAIN_STEPS" \
    --training.batch_size_train "$TRAIN_BATCH" \
    --training.steps_save_model "$TRAIN_STEPS" \
    --training.steps_save_image 1000000 \
    $SMALL_ARGS ${R2DM_QUALITY_TRAIN_ARGS:-} $RESUME_ARGS \
    --training.output_dir "$WORK/ckpt"
  # train.py exits 0 on preemption BY DESIGN (pod-maintenance semantics),
  # so verify the checkpoint actually reached the final step before
  # marking it reusable
  python -c "
from r2dm_tpu.checkpoint import load_checkpoint
import sys
step = load_checkpoint('$WORK/ckpt/checkpoint.msgpack')['global_step']
sys.exit(0 if step >= $TRAIN_STEPS else 1)
" || { echo "checkpoint preempted before step $TRAIN_STEPS; rerun to retrain" >&2; exit 1; }
  touch "$WORK/ckpt/.train_done"
fi

# R2DM_QUALITY_TRAIN_ONLY=1 stops after the train gate: pre-train (or finish
# a preempted) checkpoint in one device window, run the eval legs later.
# Also what the CI test of the resume gate hooks (tests/test_quality_scripts.py).
if [ "${R2DM_QUALITY_TRAIN_ONLY:-}" = "1" ]; then
  echo "train gate done (R2DM_QUALITY_TRAIN_ONLY=1): $WORK/ckpt"
  exit 0
fi

IFS='|' read -ra SPEC_LIST <<< "$SPECS"
TAGS=""
for spec in "${SPEC_LIST[@]}"; do
  set -- $spec
  steps=$1; mode=$2
  TAGS="$TAGS ${mode}${steps}"
  out="$WORK/samples_${mode}${steps}"
  meta="{\"n\": $N, \"steps\": $steps, \"mode\": \"$mode\"}"
  if [ ! -f "$out/meta.json" ] || [ "$(cat "$out/meta.json")" != "$meta" ]; then
    rm -rf "$out"
    python sample_and_save.py \
      --ckpt "$WORK/ckpt/checkpoint.msgpack" \
      --output_dir "$out" --num_samples "$N" --batch_size "$SAMPLE_BATCH" \
      --num_steps "$steps" --mode "$mode"
    printf '%s' "$meta" > "$out/meta.json"
  fi
  # skip evaluate when a result newer than this sample set already exists
  if [ -z "$(find "$WORK" -maxdepth 1 -name "samples_${mode}${steps}_*.json" \
             -newer "$out/meta.json" -print -quit)" ]; then
    python evaluate.py \
      --ckpt "$WORK/ckpt/checkpoint.msgpack" \
      --sample_dir "$out" --allow_random_extractors
  fi
done

python - "$WORK" "$N" $TAGS <<'EOF'
import json, sys, glob, os
work, n_expected = sys.argv[1], int(sys.argv[2])
tags = sys.argv[3:]  # SPECS order: full-chain anchor first, then few-step rows
def newest(tag):
    # pick the latest eval JSON, then VERIFY it matches the sample dir's
    # current meta.json (n) — settings drift between runs must fail loudly,
    # not silently feed a stale row into the table (VERDICT r4 item 7;
    # same validation as flow_quality_check.sh)
    meta = json.load(open(f"{work}/samples_{tag}/meta.json"))
    assert meta["n"] == n_expected, (tag, meta, n_expected)
    files = sorted(glob.glob(f"{work}/samples_{tag}_*.json"))
    assert files, f"no eval json for {tag}"
    newer = [f for f in files
             if os.path.getmtime(f) >= os.path.getmtime(f"{work}/samples_{tag}/meta.json")]
    assert newer, f"eval jsons for {tag} all predate its meta.json (stale)"
    ev = json.load(open(newer[-1]))
    got = ev.get("info", {}).get("#fake")
    assert got == meta["n"], f"{tag}: eval ran on {got} samples, meta says {meta['n']}"
    return ev
evals = {t: newest(t) for t in tags}
rows = {}
for grp in ("img", "pts", "bev"):
    for k in evals[tags[0]].get(grp, {}):
        rows[f"{grp}.{k}"] = {t: round(float(evals[t][grp][k]), 4) for t in tags}
print(json.dumps({"few_step_vs_full_chain_random_extractors": rows}, indent=2))
EOF
