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
# run must NOT be reused — this bit a round-4 run); a sample dir counts
# only when its meta.json matches the requested N/steps/mode; evaluate is
# skipped when an eval JSON newer than the sample dir's meta exists.
#
# Usage: bash tools/ddim_quality_check.sh [workdir] [num_samples]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/r2dm_ddim_quality}
N=${2:-64}
mkdir -p "$WORK"

if [ ! -f "$WORK/ckpt/.train_done" ]; then
  rm -rf "$WORK/ckpt"  # drop partial/preempted checkpoints
  python train.py \
    --data.dataset synthetic \
    --training.num_steps 600 \
    --training.batch_size_train 32 \
    --training.steps_save_model 600 \
    --training.steps_save_image 1000000 \
    --training.output_dir "$WORK/ckpt"
  # train.py exits 0 on preemption BY DESIGN (pod-maintenance semantics),
  # so verify the checkpoint actually reached the final step before
  # marking it reusable
  python -c "
from r2dm_tpu.checkpoint import load_checkpoint
import sys
step = load_checkpoint('$WORK/ckpt/checkpoint.msgpack')['global_step']
sys.exit(0 if step >= 600 else 1)
" || { echo 'checkpoint preempted before step 600; rerun to retrain' >&2; exit 1; }
  touch "$WORK/ckpt/.train_done"
fi

for spec in "256 ddpm" "32 ddim" "32 dpmpp_2m"; do
  set -- $spec
  steps=$1; mode=$2
  out="$WORK/samples_${mode}${steps}"
  meta="{\"n\": $N, \"steps\": $steps, \"mode\": \"$mode\"}"
  if [ ! -f "$out/meta.json" ] || [ "$(cat "$out/meta.json")" != "$meta" ]; then
    rm -rf "$out"
    python sample_and_save.py \
      --ckpt "$WORK/ckpt/checkpoint.msgpack" \
      --output_dir "$out" --num_samples "$N" --batch_size 64 \
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

python - "$WORK" <<'EOF'
import json, sys, glob, pathlib
work = sys.argv[1]
def newest(tag):
    files = sorted(glob.glob(f"{work}/samples_{tag}_*.json"))
    assert files, f"no eval json for {tag}"
    return json.load(open(files[-1]))
a = newest("ddpm256")
b = newest("ddim32")
c = newest("dpmpp_2m32")
rows = {}
for grp in ("img", "pts", "bev"):
    for k, v256 in a.get(grp, {}).items():
        rows[f"{grp}.{k}"] = {
            "ddim32": round(float(b[grp][k]), 4),
            "dpmpp32": round(float(c[grp][k]), 4),
            "ddpm256": round(float(v256), 4),
        }
print(json.dumps({"few_step_vs_ddpm256_random_extractors": rows}, indent=2))
EOF
