"""Headline benchmark: 256-step DDPM sampling throughput, 64x1024, 1 chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Protocol (BASELINE.md "Full-quality sampling" config): batch 32, 256 DDPM
steps, continuous-time cosine schedule, config-H EfficientUNet (2x64x1024),
bf16 network compute / fp32 diffusion math, randomly-initialized weights
(throughput is weight-independent). The entire reverse chain is one
jax.lax.scan -> a single device dispatch.

Methodology: 1 warmup (compile) + >=5 timed trials with fresh seeds; value =
median, spread reported as (min, max, stdev). Each trial is synced by a
device->host copy of the result (block_until_ready alone is unreliable
through the axon tunnel). MFU = achieved TFLOP/s / chip peak, using the
measured U-Net cost of 229.4 GFLOP/forward (jax cost analysis, conv+matmul
FLOPs only) x 256 steps = 58.73 TFLOP/image against a v5e bf16 dense peak of
197 TFLOP/s. See BASELINE.md "Physics ceiling" for what this implies about
the reachable throughput at this protocol.

vs_baseline: ratio against an ESTIMATED reference-on-A100 throughput, since
the reference repo publishes no numbers (BASELINE.md). Estimate: 58.73
TFLOP/image; A100 fp16 dense peak 312 TFLOP/s at an assumed 30% MFU (torch
inductor) -> ~1.6 img/s.
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

TFLOP_PER_IMAGE = 58.73  # 229.4 GFLOP/fwd x 256 steps (see docstring)
V5E_PEAK_TFLOPS = 197.0  # bf16 dense
BASELINE_A100_IMG_PER_S = 1.6  # estimated, see docstring
NUM_TRIALS = 6


def main():
    from r2dm_tpu import Config, DDPM
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
    variables = {"params": params, "buffers": {"coords": jnp.asarray(model_coords(cfg))}}
    ddpm = DDPM(build_diffusion(cfg, model), variables, cfg)

    batch, steps = 32, 256
    # compile / warmup (sync via host copy, not block_until_ready: axon quirk)
    x = ddpm.sample(batch_size=batch, num_steps=steps, seeds=list(range(batch)))
    np.asarray(x)

    times = []
    xn = None
    for trial in range(NUM_TRIALS):
        t0 = time.time()
        x = ddpm.sample(
            batch_size=batch,
            num_steps=steps,
            seeds=list(range(trial + 1, trial + batch + 1)),
        )
        xn = np.asarray(x, dtype=np.float32)
        times.append(time.time() - t0)

    assert np.isfinite(xn).all() and xn.std() > 0.1, "degenerate samples"

    dt = statistics.median(times)
    img_per_sec = batch / dt
    mfu = img_per_sec * TFLOP_PER_IMAGE / V5E_PEAK_TFLOPS

    print(
        json.dumps(
            {
                "metric": "sampling_throughput_256step_64x1024",
                "value": round(img_per_sec, 4),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_sec / BASELINE_A100_IMG_PER_S, 4),
                "mfu": round(mfu, 4),
                "batch": batch,
                "steps": steps,
                "seconds_median": round(dt, 3),
                "seconds_min": round(min(times), 3),
                "seconds_max": round(max(times), 3),
                "seconds_stdev": round(statistics.stdev(times), 3),
                "trials": NUM_TRIALS,
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
