"""Headline benchmark: 256-step DDPM sampling throughput, 64x1024, 1 chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Protocol: batch 256, 256 DDPM steps, continuous-time cosine schedule,
config-H EfficientUNet (2x64x1024), bf16 network compute / fp32 diffusion
math, randomly-initialized weights (throughput is weight-independent).

Batch size: throughput (img/s/chip) improves monotonically with batch up to
the HBM limit on this chip — measured per-image sampling cost 3.15 ms (b32),
2.22 (b128), 2.09 (b256), flat at b384 — so the throughput protocol uses
b256. (The QUALITY protocol's batch stays 64 in sample_and_save.py, matching
the reference eval; batch does not change the sample distribution.)

Execution: the chain runs as 8 compiled 32-step scan segments
(diffusion.sample_segment — bit-identical to the single-scan sampler, same
key-split sequence). Chunking matters on this environment: a single
256-step b256 dispatch (~137 s) reliably CRASHES the axon-tunneled TPU
worker (execution watchdog), while 32-step (~17 s) dispatches are stable;
segment dispatches queue asynchronously so the chunking adds no measurable
overhead (chunked == monolithic per-step cost at b128 where both run).

Methodology: 1 warmup chain (compile) + timed trials with fresh keys; value
= median, spread reported as (min, max, stdev). Trials are synced by
transferring a SCALAR reduction — transferring the full batch through the
tunnel (~64 MB) inside the timed region added 5-20% noise (the round-1
variance source); block_until_ready alone is unreliable here. With scalar
sync the trial spread is <0.1%, so few trials suffice; the count adapts to
a wall-clock budget ($R2DM_BENCH_BUDGET_S, default 460 s) because one
trial costs ~137 s and the driver's bench timeout is finite. A persistent
XLA compile cache (/tmp) makes warm re-runs skip the ~2-10 min compile.
Sample sanity (finite, non-degenerate) is asserted on a 2-image slice of
the warmup chain, outside the timed region.

MFU = achieved TFLOP/s / chip peak, using the measured U-Net cost of
229.4 GFLOP/forward (jax cost analysis, conv+matmul FLOPs only) x 256 steps
= 58.73 TFLOP/image against a v5e bf16 dense peak of 197 TFLOP/s. See
BASELINE.md "Physics ceiling": 100% MFU at this protocol = 3.36 img/s/chip.

vs_baseline: ratio against an ESTIMATED reference-on-A100 throughput, since
the reference repo publishes no numbers (BASELINE.md). Estimate: 58.73
TFLOP/image; A100 fp16 dense peak 312 TFLOP/s at an assumed 30% MFU (torch
inductor) -> ~1.6 img/s.
"""

import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

TFLOP_PER_IMAGE = 58.73  # 229.4 GFLOP/fwd x 256 steps (see docstring)
V5E_PEAK_TFLOPS = 197.0  # bf16 dense
BASELINE_A100_IMG_PER_S = 1.6  # estimated, see docstring
BATCH = 256
STEPS = 256
CHUNK = 32  # dispatch length: long single dispatches crash the tunnel worker
MAX_TRIALS = 4
MIN_TRIALS = 1


def main():
    budget_s = float(os.environ.get("R2DM_BENCH_BUDGET_S", "460"))
    t_start = time.time()
    # persistent compile cache: warm re-runs skip the XLA compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/r2dm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from r2dm_tpu import Config
    from r2dm_tpu.diffusion.base import as_typed_key, normal, split_key
    from r2dm_tpu.inference import build_diffusion, build_model, model_coords

    cfg = Config()
    model = build_model(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 64, 1024, 2)), jnp.zeros((1,))
    )
    rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda l: jnp.asarray(rng.standard_normal(l.shape, dtype=np.float32) * 0.05),
        variables["params"],
    )
    variables = {
        "params": params,
        "buffers": {"coords": jnp.asarray(model_coords(cfg))},
    }
    diffusion = build_diffusion(cfg, model)

    seg = jax.jit(diffusion.sample_segment)  # (variables, x, key, ts_seg)
    ts = jnp.linspace(1.0, 0.0, STEPS + 1, dtype=jnp.float32)

    def chain(seed: int):
        """Full 256-step reverse chain == diffusion.sample(key) exactly."""
        key = as_typed_key(jax.random.key(seed))
        key, sub = split_key(key)
        x = normal(sub, (BATCH, *diffusion.sampling_shape))
        for lo in range(0, STEPS, CHUNK):
            x, key = seg(variables, x, key, ts[lo : lo + CHUNK + 1])
        return x

    # compile + warmup; sanity on a 2-image slice (untimed transfer)
    x = chain(0)
    float(jnp.sum(x))
    xn = np.asarray(x[:2], dtype=np.float32)
    assert np.isfinite(xn).all() and xn.std() > 0.1, "degenerate samples"
    del x

    times = []
    for trial in range(MAX_TRIALS):
        t0 = time.time()
        float(jnp.sum(chain(trial + 1)))
        times.append(time.time() - t0)
        done = len(times) >= MIN_TRIALS
        projected = time.time() - t_start + statistics.median(times)
        if done and projected > budget_s:
            break

    dt = statistics.median(times)
    img_per_sec = BATCH / dt
    mfu = img_per_sec * TFLOP_PER_IMAGE / V5E_PEAK_TFLOPS

    print(
        json.dumps(
            {
                "metric": "sampling_throughput_256step_64x1024",
                "value": round(img_per_sec, 4),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_sec / BASELINE_A100_IMG_PER_S, 4),
                "mfu": round(mfu, 4),
                "batch": BATCH,
                "steps": STEPS,
                "chunk": CHUNK,
                "seconds_median": round(dt, 3),
                "seconds_min": round(min(times), 3),
                "seconds_max": round(max(times), 3),
                "seconds_stdev": round(statistics.stdev(times), 4) if len(times) > 1 else 0.0,
                "trials": len(times),
                "device": str(jax.devices()[0]),
                "baseline_note": (
                    "vs estimated reference-on-A100 1.6 img/s (no published "
                    "numbers; see BASELINE.md, incl. the 3.36 img/s 100%-MFU "
                    "single-chip ceiling at this protocol)"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
