"""Headline benchmark: 256-step DDPM sampling throughput, 64x1024, 1 chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Protocol (BASELINE.md "Full-quality sampling" config): batch 32, 256 DDPM
steps, continuous-time cosine schedule, config-H EfficientUNet (2x64x1024),
bf16 network compute / fp32 diffusion math, randomly-initialized weights
(throughput is weight-independent). The entire reverse chain is one
jax.lax.scan -> a single device dispatch.

vs_baseline: ratio against an ESTIMATED reference-on-A100 throughput, since
the reference repo publishes no numbers (BASELINE.md). Estimate: measured
fwd cost 229 GFLOP/image-call x 256 steps = 58.7 TFLOP/image; A100 fp16
dense peak 312 TFLOP/s at an assumed 30% MFU (torch inductor) -> ~1.6
img/s. north-star target is vs_baseline >= 5.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


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
    # compile (block via host copy: block_until_ready alone is unreliable
    # through the axon tunnel)
    x = ddpm.sample(batch_size=batch, num_steps=steps, seeds=list(range(batch)))
    np.asarray(x)
    # timed runs with fresh seeds; sync via device->host copy; take best
    times = []
    xn = None
    for trial in range(2):
        t0 = time.time()
        x = ddpm.sample(
            batch_size=batch,
            num_steps=steps,
            seeds=list(range(trial + 1, trial + batch + 1)),
        )
        xn = np.asarray(x, dtype=np.float32)
        times.append(time.time() - t0)
    dt = min(times)
    img_per_sec = batch / dt

    assert np.isfinite(xn).all() and xn.std() > 0.1, "degenerate samples"

    baseline_a100_est = 1.6  # img/s, see module docstring
    print(
        json.dumps(
            {
                "metric": "sampling_throughput_256step_64x1024",
                "value": round(img_per_sec, 4),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_sec / baseline_a100_est, 4),
                "batch": batch,
                "steps": steps,
                "seconds": round(dt, 2),
                "device": str(jax.devices()[0]),
                "baseline_note": "vs estimated reference-on-A100 1.6 img/s (no published numbers; see BASELINE.md)",
            }
        )
    )


if __name__ == "__main__":
    main()
