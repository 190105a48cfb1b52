"""Device probe: int8 vs bf16 conv throughput at the U-Net's hot shapes.

Motivation: TPU v5e's MXU has 2x int8 peak over bf16 (394.7 TOPS vs 197.4
TFLOP/s). The bf16 serving path sits at ~64% MFU with near-uniform
efficiency (CLAUDE.md round-3 attribution), so the only remaining >10%
serving lever on one chip is a lower-precision numeric lane. This probe
answers the GATING question before any W8A8 lane is built: does XLA:TPU
lower an s8xs8->s32 `conv_general_dilated` onto the MXU's int8 path at our
shapes, and what is the realized speedup vs the same-shape bf16 conv —
including the dynamic-quantization overhead (absmax + scale + round) a real
lane would pay per activation?

Cases per level L1..L4 of config H (efficient_unet.py shapes):
  conv_bf16      3x3 same-channel bf16 conv (today's hot op)
  conv_int8      3x3 s8 x s8 -> s32 conv, preferred_element_type=int32
  conv_int8_deq  int8 conv + per-channel dequant scale + bf16 cast epilogue
  quant_dyn      dynamic per-tensor quantization of the activation alone
                 (absmax reduce -> scale -> round -> s8 cast): the per-op
                 overhead a dynamic-quant lane pays

plus an MXU anchor: 4096^2 matmul in bf16 vs int8 (pure-compute ceiling
check, no conv lowering in the way).

Timing: scalar-sync protocol (CLAUDE.md) — queued dispatches, one 4-byte
transfer at the end. Usage: python tools/probe_int8.py [--batch 256]
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

# (channels, height, width) per level at config H 64x1024 (base 64, x1,2,4,8)
LEVELS = {
    "l1": (64, 64, 1024),
    "l2": (128, 32, 512),
    "l3": (256, 16, 256),
    "l4": (512, 8, 128),
}
DN = ("NHWC", "HWIO", "NHWC")


def timeit_chain(fn, x, k, reps):
    """Equal-shape chain with input donation; median of 3 trials."""
    x = fn(x, k)
    float(jnp.ravel(x)[0])
    trials = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            x = fn(x, k)
        float(jnp.ravel(x)[0])
        trials.append((time.time() - t0) / reps)
    return float(np.median(trials))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--cases", type=str, default="", help="comma filter")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/r2dm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    want = [c for c in args.cases.split(",") if c]

    B = args.batch
    results = {}

    def emit(name, seconds, flops):
        results[name] = seconds
        line = {
            "case": name,
            "ms": round(seconds * 1e3, 4),
            "tflops": round(flops / seconds / 1e12, 2),
        }
        print(json.dumps(line), flush=True)

    # --- MXU anchors -------------------------------------------------------
    if not want or "anchor" in want:
        n = 4096
        kb = jax.jit(lambda: jax.random.normal(jax.random.key(1), (n, n), jnp.bfloat16))()
        xb = jax.jit(lambda: jax.random.normal(jax.random.key(2), (n, n), jnp.bfloat16))()
        mm_bf16 = jax.jit(
            lambda x, k: jnp.dot(x, k).astype(jnp.bfloat16), donate_argnums=(0,)
        )
        emit("anchor_mm_bf16", timeit_chain(mm_bf16, xb, kb, args.reps), 2 * n**3)

        ki = jax.jit(lambda: (jax.random.normal(jax.random.key(1), (n, n)) * 10).astype(jnp.int8))()
        xi = jax.jit(lambda: (jax.random.normal(jax.random.key(2), (n, n)) * 10).astype(jnp.int8))()
        mm_int8 = jax.jit(
            lambda x, k: jax.lax.dot_general(
                x, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.int8),
            donate_argnums=(0,),
        )
        emit("anchor_mm_int8", timeit_chain(mm_int8, xi, ki, args.reps), 2 * n**3)

    # --- per-level convs ---------------------------------------------------
    rng = np.random.default_rng(0)
    for lvl, (C, H, W) in LEVELS.items():
        if want and lvl not in want:
            continue
        flops = 2 * B * H * W * 9 * C * C

        xb = jax.jit(
            lambda C=C, H=H, W=W: jax.random.normal(
                jax.random.key(0), (B, H, W, C), jnp.bfloat16
            )
        )()
        kb = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)

        conv_bf16 = jax.jit(
            lambda x, k: jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN
            ),
            donate_argnums=(0,),
        )
        emit(f"{lvl}_conv_bf16", timeit_chain(conv_bf16, xb, kb, args.reps), flops)

        xi = jax.jit(
            lambda C=C, H=H, W=W: (
                jax.random.normal(jax.random.key(0), (B, H, W, C)) * 20
            ).astype(jnp.int8)
        )()
        ki = jnp.asarray(
            np.clip(rng.standard_normal((3, 3, C, C)) * 30, -127, 127), jnp.int8
        )

        def conv_i8(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=DN, preferred_element_type=jnp.int32,
            )
            # wrap back to s8 so the chain donates equal shapes
            return (y >> 8).astype(jnp.int8)

        try:
            emit(f"{lvl}_conv_int8",
                 timeit_chain(jax.jit(conv_i8, donate_argnums=(0,)), xi, ki, args.reps),
                 flops)
        except Exception as e:  # unsupported lowering is itself the answer
            print(json.dumps({"case": f"{lvl}_conv_int8", "error": repr(e)[:200]}),
                  flush=True)

        # int8 conv with the dequant epilogue a real lane needs: s32 ->
        # * (act_scale * per-channel w_scale) -> bf16
        wscale = jnp.asarray(rng.uniform(0.5, 2.0, (C,)), jnp.float32)

        # fresh s8 activation: xi was donated into the conv_int8 chain
        xi = jax.jit(
            lambda C=C, H=H, W=W: (
                jax.random.normal(jax.random.key(4), (B, H, W, C)) * 20
            ).astype(jnp.int8)
        )()

        def conv_i8_deq(x, k, ws=wscale):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=DN, preferred_element_type=jnp.int32,
            )
            yd = (y.astype(jnp.float32) * (ws * (1.0 / 127.0))).astype(jnp.bfloat16)
            # re-quantize so the chain stays s8 (models back-to-back quant convs)
            s = 127.0 / (jnp.max(jnp.abs(yd).astype(jnp.float32)) + 1e-8)
            return jnp.round(yd.astype(jnp.float32) * s).astype(jnp.int8)

        try:
            emit(f"{lvl}_conv_int8_deq",
                 timeit_chain(jax.jit(conv_i8_deq, donate_argnums=(0,)), xi, ki,
                              args.reps),
                 flops)
        except Exception as e:
            print(json.dumps({"case": f"{lvl}_conv_int8_deq", "error": repr(e)[:200]}),
                  flush=True)

        # dynamic per-tensor quantization overhead alone (bf16 -> s8).
        # NB: xb was DONATED into the conv_bf16 chain above (its buffer is
        # deleted) — materialize a fresh activation for this case.
        xq = jax.jit(
            lambda C=C, H=H, W=W: jax.random.normal(
                jax.random.key(3), (B, H, W, C), jnp.bfloat16
            )
        )()

        def quant(x):
            s = 127.0 / (jnp.max(jnp.abs(x).astype(jnp.float32)) + 1e-8)
            return jnp.round(x.astype(jnp.float32) * s).astype(jnp.int8)

        q = jax.jit(quant)
        q(xq); float(jnp.ravel(q(xq))[0])
        trials = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(args.reps):
                o = q(xq)
            float(jnp.ravel(o)[0])
            trials.append((time.time() - t0) / args.reps)
        emit(f"{lvl}_quant_dyn", float(np.median(trials)), flops * 0 + 1)

    # --- summary -----------------------------------------------------------
    summary = {}
    for lvl in LEVELS:
        b = results.get(f"{lvl}_conv_bf16")
        i = results.get(f"{lvl}_conv_int8")
        d = results.get(f"{lvl}_conv_int8_deq")
        if b and i:
            summary[lvl] = {
                "int8_speedup": round(b / i, 3),
                "int8_deq_speedup": round(b / d, 3) if d else None,
            }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
