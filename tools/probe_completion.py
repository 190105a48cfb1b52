"""Interactive completion (RePaint) latency probe — JSONL per case.

Times ``DDPM.repaint`` end-to-end on a real checkpoint at serving-relevant
grid sizes (the reference's completion path, completion_demo.py /
continuous_time.py:260-317, has no latency story at all; this probe is the
number an interactive "complete this scan" deployment plans around).

Protocol follows the repo timing rules (CLAUDE.md): warm-up dispatch first,
then reps timed syncing on a transferred SCALAR only; the sample batch is
transferred untimed afterwards for the finiteness sanity check.

Usage:
  python tools/probe_completion.py --ckpt ckpt/checkpoint.msgpack \
      --batch 1 --grids 8x4x1,16x2x1 --reps 5
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/r2dm_tpu_jax_cache")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument(
        "--grids", default="8x4x1",
        help="comma-separated TxRxJ RePaint grids (net calls = T*R*J)",
    )
    p.add_argument("--reps", type=int, default=5)
    p.add_argument(
        "--mask", default="beams25",
        choices=["beams25", "beams50", "points10"],
        help="corruption pattern (completion_demo.py masks)",
    )
    p.add_argument(
        "--latency_layout", action="store_true",
        help="width-pair-merged level 1 (W2C) — the measured small-batch "
        "latency layout (see CLAUDE.md)",
    )
    p.add_argument(
        "--bf16", action="store_true",
        help="bf16 network compute — the serving fast path (generate.py "
        "--bf16); diffusion/schedule math stays fp32 either way",
    )
    args = p.parse_args(argv)

    from r2dm_tpu.inference import setup_model

    ddpm, lidar_utils, cfg = setup_model(
        args.ckpt,
        dtype=jnp.bfloat16 if args.bf16 else None,
        width_merge_l1=args.latency_layout,
    )
    H, W = cfg.data.resolution
    B = args.batch

    rng = np.random.default_rng(0)
    mask = np.zeros((B, H, W, 2), np.float32)
    if args.mask == "beams25":
        mask[:, ::4] = 1.0
    elif args.mask == "beams50":
        mask[:] = (rng.uniform(size=(B, H, 1, 1)) < 0.5).astype(np.float32)
    else:
        mask[:] = (rng.uniform(size=(B, H, W, 1)) < 0.1).astype(np.float32)
    mask = jnp.asarray(mask)
    # a plausible known scan: zeros (mid-range) where masked-in
    known = jnp.zeros((B, H, W, 2), jnp.float32)

    for grid in args.grids.split(","):
        t_steps, r_steps, j_len = (int(v) for v in grid.split("x"))
        # net fwds/image: every outer step runs r_steps reverse passes of
        # j_len sub-steps each, except the final step's single pass
        # (base.py repaint early-break); forward re-noises are net-free
        calls = ((t_steps - 1) * r_steps + 1) * j_len

        def run(seed):
            return ddpm.repaint(
                known, mask, num_steps=t_steps,
                num_resample_steps=r_steps, jump_length=j_len,
                key=jax.random.key(seed), data_format="NHWC",
            )

        x = run(0)  # compile + warm
        float(jnp.sum(x))
        ts = []
        for r in range(args.reps):
            t0 = time.time()
            x = run(1 + r)
            float(jnp.sum(x))
            ts.append(time.time() - t0)
        xn = np.asarray(x)  # untimed sanity transfer
        assert np.isfinite(xn).all(), "non-finite completion"
        dt = statistics.median(ts)
        rec = {
            "grid": grid,
            "layout": "W2C" if args.latency_layout else "NHWC",
            "dtype": "bf16" if args.bf16 else "fp32",
            "mask": args.mask,
            "batch": B,
            "resolution": f"{H}x{W}",
            "net_calls_per_image": calls,
            "ms_per_scan": round(1e3 * dt / B, 3),
            "scans_per_s": round(B / dt, 3),
            "trial_spread_ms": round(1e3 * (max(ts) - min(ts)), 3),
            "reps": args.reps,
            "family": type(ddpm.diffusion).__name__,
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
