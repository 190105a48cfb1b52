"""Integrated sampling A/B: time a 32-step b256 segment across model configs.

The headline bench (bench.py) is 8 such segments; one segment at the
protocol batch is the cheapest faithful proxy for end-to-end throughput
(same compiled graph, same per-step cost). Scalar-sync timed (CLAUDE.md).

Usage: python tools/probe_sampling.py --configs nhwc,w2c [--batch 256]
Configs: nhwc (serving default), w2c (width_merge_l1), nhwc_up_* (up-fusion
lowerings), and any of those + "_gnbf16" (bf16 GN FMA+SiLU pass).
Attribution configs (library-default GN, NHWC): base, abl_nol1 / nol2 /
nol3 / nol4 (zero resblocks at that level), abl_noattn (attention blocks
as identity), abl_nocoords (no coordinate encoding) — the share of a
component is (base - ablated) / base.
Prints one JSON line per config with per-image per-step cost and the
implied 256-step img/s/chip.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 32


def run(config: str, batch: int, reps: int) -> dict:
    from r2dm_tpu import Config
    from r2dm_tpu.diffusion.base import as_typed_key, normal, split_key
    from r2dm_tpu.inference import build_diffusion, build_model, model_coords
    from r2dm_tpu.models import layers
    from r2dm_tpu.ops import fused_resample as frs

    layers.FUSED_RESAMPLE = "down"
    if config.startswith("nhwc_up_"):
        layers.FUSED_RESAMPLE = "both"
        frs.UP_IMPL = config[len("nhwc_up_") :]  # h_polyphase | polyphase | dilated
    abl = None
    if config == "base" or config.startswith("abl_"):
        # attribution configs: library-default GN (follow activation dtype)
        layers.GN_ACT_COMPUTE_DTYPE = None
        config_base = "nhwc"
        abl = config[len("abl_") :] if config.startswith("abl_") else None
    elif config.endswith("_gnbf16"):
        # bf16 GN FMA+SiLU pass (now the follow-dtype default; measured here
        # +10.6% at b256): stats stay fp32, only the normalize/affine math
        # rounds once more before the (already bf16) conv.
        layers.GN_ACT_COMPUTE_DTYPE = jnp.bfloat16
        config_base = config[: -len("_gnbf16")]
    else:
        # pin fp32 so the un-suffixed configs stay a true A/B baseline even
        # though the library default now follows the bf16 activation dtype
        layers.GN_ACT_COMPUTE_DTYPE = jnp.float32
        config_base = config

    cfg = Config()
    if abl in ("nol1", "nol2", "nol3", "nol4"):
        n = [3, 3, 3, 3]
        n[int(abl[-1]) - 1] = 0
        cfg.model.num_residual_blocks = tuple(n)
    elif abl == "skeleton":
        # boundary convs + FIR resamples + sampler glue only: no resblocks,
        # no attention, no coord encoding — the floor under every ablation
        cfg.model.num_residual_blocks = (0, 0, 0, 0)
        cfg.model.coords_encoding = None
        if not hasattr(layers.SelfAttentionBlock, "_orig_call"):
            layers.SelfAttentionBlock._orig_call = (
                layers.SelfAttentionBlock.__call__
            )
        layers.SelfAttentionBlock.__call__ = lambda self, x: x
    elif abl == "nocoords":
        cfg.model.coords_encoding = None
    elif abl == "noattn":
        # attention blocks as identity (resblocks/resamples untouched);
        # restored for later configs in this process via _orig_call
        if not hasattr(layers.SelfAttentionBlock, "_orig_call"):
            layers.SelfAttentionBlock._orig_call = (
                layers.SelfAttentionBlock.__call__
            )
        layers.SelfAttentionBlock.__call__ = lambda self, x: x
    elif abl is not None:
        raise ValueError(f"unknown ablation: {abl}")
    if abl not in ("noattn", "skeleton") and hasattr(
        layers.SelfAttentionBlock, "_orig_call"
    ):
        layers.SelfAttentionBlock.__call__ = layers.SelfAttentionBlock._orig_call
    model = build_model(
        cfg, dtype=jnp.bfloat16, width_merge_l1=(config_base == "w2c")
    )
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 64, 1024, 2)), jnp.zeros((1,))
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
    seg = jax.jit(diffusion.sample_segment)
    ts = jnp.linspace(1.0, 0.0, STEPS + 1, dtype=jnp.float32)

    key = as_typed_key(jax.random.key(1))
    key, sub = split_key(key)
    x = normal(sub, (batch, *diffusion.sampling_shape))
    x, key = seg(variables, x, key, ts)  # compile + warm
    float(jnp.sum(x[0, 0, 0, :1]))
    trials = []
    for _ in range(reps):
        t0 = time.time()
        x, key = seg(variables, x, key, ts)
        float(jnp.sum(x[0, 0, 0, :1]))
        trials.append(time.time() - t0)
    dt = float(np.median(trials))
    ms_img_step = dt / STEPS / batch * 1e3
    return {
        "config": config,
        "batch": batch,
        "seg_seconds": round(dt, 3),
        "spread": round((max(trials) - min(trials)) / dt, 4),
        "ms_per_img_step": round(ms_img_step, 4),
        "implied_256step_img_per_s": round(1.0 / (ms_img_step * 256 / 1e3), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default="nhwc,w2c")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/r2dm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for config in args.configs.split(","):
        print(json.dumps(run(config.strip(), args.batch, args.reps)), flush=True)


if __name__ == "__main__":
    main()
