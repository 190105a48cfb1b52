"""Device probe: few-step rectified-flow serving throughput (euler/midpoint).

The flow family (diffusion/flow.py, beyond-reference — the reference
authors' own follow-up R2Flow, arXiv 2412.02241) exists for 1-8 step
serving after reflow. This probe measures the end-to-end throughput of the
full jitted ODE chain (`RectifiedFlow.sample`, one lax.scan) at config-H
64x1024 on one chip, for K in {1, 2, 4, 8} euler steps and 1 midpoint step
(2 net calls, 2nd order), batch 256 by default.

Throughput is weight-independent (same conv graph as the DDPM headline:
229.4 GFLOP/net-call), so random weights are used; QUALITY at these step
counts is the separate tools/flow_quality_check.sh protocol.

Timing: scalar-sync protocol (CLAUDE.md) — reps queue asynchronously with
fresh seeds, one 4-byte transfer syncs the trial; median of 3 trials.
Prints one JSON line per case plus a summary line comparing against the
256-step DDPM headline cost.

Usage: python tools/probe_flow_serving.py [--batch 256] [--reps 8]
"""

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

GFLOP_PER_CALL = 229.4  # measured U-Net fwd cost (bench.py docstring)
V5E_PEAK_TFLOPS = 197.0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=8)
    # smoke-mode knobs (CPU plumbing check; MFU numbers only mean anything
    # at the config-H defaults on the chip)
    p.add_argument("--base", type=int, default=None)
    p.add_argument("--resolution", type=str, default=None, help="HxW")
    p.add_argument(
        "--cases", type=str, default="euler-1,euler-2,euler-4,euler-8,midpoint-1",
        help="comma-separated mode-steps cases to run (e.g. 'euler-1'); "
        "trims compile cost when only one point is needed",
    )
    p.add_argument(
        "--latency_layout", action="store_true",
        help="width-pair-merged level 1 (W2C, ops/w2c.py) — the measured "
        "small-batch latency layout (+18%% on DDPM at b32; same parameter "
        "tree, exact math). Pair with --batch 32.",
    )
    p.add_argument(
        "--ddpm_ms_per_img", type=float, default=None,
        help="measured 256-step DDPM per-image cost in ms (e.g. from the "
        "bench headline: 1000*batch/img_per_s/batch). When given, the "
        "summary reports a real measured speedup; otherwise only the "
        "call-count ratio is printed.",
    )
    args = p.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/r2dm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from r2dm_tpu import Config
    from r2dm_tpu.inference import build_diffusion, build_model, model_coords

    cfg = Config()
    cfg.diffusion.timestep_type = "flow"
    if args.base is not None:
        cfg.model.base_channels = args.base
    if args.resolution is not None:
        h, w = args.resolution.split("x")
        cfg.data.resolution = (int(h), int(w))
    H, W = cfg.data.resolution
    model = build_model(
        cfg, dtype=jnp.bfloat16, width_merge_l1=args.latency_layout
    )
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, H, W, 2)), jnp.zeros((1,))
    )
    rng = np.random.default_rng(0)
    variables = {
        "params": jax.tree.map(
            lambda l: jnp.asarray(
                rng.standard_normal(l.shape, dtype=np.float32) * 0.05
            ),
            variables["params"],
        ),
        "buffers": {"coords": jnp.asarray(model_coords(cfg))},
    }
    diffusion = build_diffusion(cfg, model)

    cases = []
    for tok in args.cases.split(","):
        mode, steps = tok.strip().rsplit("-", 1)
        cases.append((mode, int(steps)))
    results = {}
    for mode, steps in cases:
        fn = jax.jit(
            lambda v, k, mode=mode, steps=steps: diffusion.sample(
                v, k, batch_size=args.batch, num_steps=steps, mode=mode
            )
        )
        x = fn(variables, jax.random.key(0))
        float(jnp.sum(x[0, 0, 0]))  # compile + first dispatch
        xn = np.asarray(x[:2], dtype=np.float32)
        assert np.isfinite(xn).all(), f"{mode}-{steps}: non-finite samples"
        trials = []
        for trial in range(3):
            t0 = time.time()
            tot = jnp.zeros(())
            for r in range(args.reps):
                x = fn(variables, jax.random.key(1 + trial * args.reps + r))
                tot = tot + jnp.sum(x[0, 0, 0])
            float(tot)  # one scalar transfer syncs the queued reps
            trials.append((time.time() - t0) / args.reps)
        dt = statistics.median(trials)
        calls = steps * (2 if mode == "midpoint" else 1)
        img_s = args.batch / dt
        rec = {
            "case": f"{mode}-{steps}",
            "layout": "W2C" if args.latency_layout else "NHWC",
            "net_calls": calls,
            "ms_per_image": round(1e3 * dt / args.batch, 4),
            "ms_per_image_call": round(1e3 * dt / (args.batch * calls), 4),
            "img_per_s": round(img_s, 2),
            "mfu": round(
                img_s * calls * GFLOP_PER_CALL / 1e3 / V5E_PEAK_TFLOPS, 4
            ),
            "trial_spread_ms": round(
                1e3 * (max(trials) - min(trials)) / args.batch, 4
            ),
        }
        results[rec["case"]] = rec
        print(json.dumps(rec), flush=True)

    # NOTE: 256 * euler-1 ms_per_image_call is a CALL-COUNT ratio, not a
    # measurement of the actual DDPM chain (which carries per-step schedule
    # math / scan overhead the flow step lacks) — for euler-1 it is 256.0
    # by construction. A real speedup needs the measured DDPM headline,
    # passed via --ddpm_ms_per_img (from bench.py's img/s).
    if "euler-1" in results:
        summary = {
            "summary": "flow few-step vs 256-call DDPM chain (same net)",
            "batch": args.batch,
            "euler1_img_per_s": results["euler-1"]["img_per_s"],
            "call_count_ratio_vs_256": round(
                256 * results["euler-1"]["ms_per_image_call"]
                / results["euler-1"]["ms_per_image"], 1
            ),
        }
        if args.ddpm_ms_per_img is not None:
            summary["measured_speedup_vs_ddpm256"] = round(
                args.ddpm_ms_per_img / results["euler-1"]["ms_per_image"], 1
            )
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
