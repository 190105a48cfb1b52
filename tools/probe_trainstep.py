"""On-chip A/B probe for train-step throughput (VERDICT r2 item 2).

Measures the full jitted train step (loss+grads+AdamW+EMA) at config H for a
set of ablations, scalar-sync timed (CLAUDE.md). Within-session A/Bs only —
cross-day environment drift is ~10%.

Usage: python tools/probe_trainstep.py --cases base,nol1 [--batch 32]
Cases:
  base    : training default (W2C level 1)
  nhwc    : width_merge_l1 off
  nol1    : num_residual_blocks=(0,3,3,3) — attributes level-1 share
  gnbf16  : GN/AdaGN FMA+SiLU forced to bf16 (flag A/B; fwd numerics
            change by one bf16 rounding)
  gnfp32  : GN/AdaGN FMA+SiLU forced to fp32 (the pre-round-3 behavior;
            every other case runs the shipping default
            GN_ACT_COMPUTE_DTYPE=None = activation dtype)
  rematl1 : remat level-1 residual blocks (recompute in backward)
  gradbf16      : bf16-cotangent policy (step.py grad_dtype=bf16 — bf16
                  backward, fp32 master params + Adam state), W2C layout
  gradbf16_nhwc : same with width_merge_l1 off (VERDICT r3 item 4 asks
                  for the A/B on both layouts)
Prints one JSON line per case.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def time_step(jit_fn, state, x_0, reps: int = 8) -> float:
    key = jax.random.key(0)
    state, m = jit_fn(state, x_0, key, None)  # compile + warm
    float(m["loss"])
    t0 = time.time()
    for i in range(reps):
        state, m = jit_fn(state, x_0, jax.random.key(i + 1), None)
    float(m["loss"])  # scalar sync
    return (time.time() - t0) / reps


def build(case: str, batch: int):
    from r2dm_tpu.config import Config, TrainingConfig
    from r2dm_tpu.diffusion import ContinuousTimeGaussianDiffusion
    from r2dm_tpu.inference import build_model, model_coords
    from r2dm_tpu.models import layers
    from r2dm_tpu.training import (
        EMAConfig,
        init_train_state,
        jit_train_step,
        make_optimizer,
        make_train_step,
    )

    cfg = Config()
    width_merge = case not in ("nhwc", "gradbf16_nhwc")
    kwargs = {}
    if case == "nol1":
        from dataclasses import replace

        cfg = replace(
            cfg, model=replace(cfg.model, num_residual_blocks=(0, 3, 3, 3))
        )
    if case == "rematl1":
        kwargs["remat_level1"] = True
    model = build_model(cfg, dtype=jnp.bfloat16, width_merge_l1=width_merge)
    if kwargs.get("remat_level1"):
        model = model.clone(remat_level1=True)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 64, 1024, 2)), jnp.zeros((1,))
    )
    variables = {
        **variables,
        "buffers": {"coords": jnp.asarray(model_coords(cfg))},
    }
    ddpm = ContinuousTimeGaussianDiffusion(model=model, noise_schedule="cosine")
    tx, _ = make_optimizer(TrainingConfig(lr=1e-4, lr_warmup_steps=10, num_steps=1000))
    state = init_train_state(variables["params"], variables["buffers"], tx)
    grad_dtype = (
        jnp.bfloat16 if case in ("gradbf16", "gradbf16_nhwc") else None
    )
    step_fn = make_train_step(ddpm, tx, EMAConfig(), grad_dtype=grad_dtype)
    x_0 = jax.random.normal(jax.random.key(1), (batch, 64, 1024, 2))
    return jax.jit(step_fn), state, x_0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=str, default="base,nol1")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/r2dm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from r2dm_tpu.models import layers

    gn_default = layers.GN_ACT_COMPUTE_DTYPE  # shipping default (None)
    for case in args.cases.split(","):
        case = case.strip()
        if case == "gnbf16":
            layers.GN_ACT_COMPUTE_DTYPE = jnp.bfloat16
        elif case == "gnfp32":
            layers.GN_ACT_COMPUTE_DTYPE = jnp.float32
        else:
            layers.GN_ACT_COMPUTE_DTYPE = gn_default
        try:
            jit_fn, state, x_0 = build(case, args.batch)
            dt = time_step(jit_fn, state, x_0, args.reps)
            print(
                json.dumps(
                    {
                        "case": case,
                        "batch": args.batch,
                        "ms_per_step": round(dt * 1e3, 1),
                        "img_per_s": round(args.batch / dt, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report per-case OOM/compile errors
            print(json.dumps({"case": case, "error": repr(e)[:300]}), flush=True)
        finally:
            layers.GN_ACT_COMPUTE_DTYPE = gn_default


if __name__ == "__main__":
    main()
