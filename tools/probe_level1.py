"""Device probes for the level-1 (64-channel, 64x1024) conv bottleneck.

Round-2 ablation attributed 32% of the U-Net forward to level-1 resblocks at
~44% conv MFU, hypothesizing MXU lane waste (64 output channels = half the
128 MXU lanes). This probe separates the two candidate explanations on the
real chip:

  * LANE-BOUND:   t(conv 64->128) ~= t(conv 64->64)   (the extra 64 output
                  channels ride in otherwise-idle lanes for free)
  * FLOP/MEMORY-BOUND: t(conv 64->128) ~= 2x t(conv 64->64) (the MXU is
                  already fully scheduled; time scales with useful work)

plus roofline anchors: a pure elementwise HBM pass over the same tensor
(memory floor), the GN+SiLU pass, and the in-model ring conv.

Timing: scalar-sync protocol (CLAUDE.md) — K queued dispatches, one 4-byte
scalar transfer at the end; per-dispatch time = total / K.

Usage: python tools/probe_level1.py [--batch 256] [--reps 30]
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


def timeit(fn, args, reps: int, warmup: int = 3) -> float:
    """Median-of-3 of (reps queued dispatches, scalar-synced) / reps.

    Queue depth is capped at 2: every queued dispatch holds its (up to
    4.3 GB) output buffer live, so an unbounded queue OOMs 16G HBM on the
    big-output cases. The every-2 scalar sync is amortized noise (<1 ms
    against 20-35 ms dispatches)."""
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(out[0, 0, 0, :1]))  # keep the warmup queue depth at 1
    trials = []
    for _ in range(3):
        t0 = time.time()
        for i in range(reps):
            out = fn(*args)
            if i % 2 == 1:
                float(jnp.sum(out[0, 0, 0, :1]))
        float(jnp.sum(out[0, 0, 0, :1]))
        trials.append((time.time() - t0) / reps)
    return float(np.median(trials))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--cases", type=str, default="", help="comma filter")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/r2dm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, W = args.batch, args.height, args.width
    rng = np.random.default_rng(0)

    def mk(c):
        # generate ON-DEVICE: a host-side b256 x 128ch array is ~8 GB and
        # would stream through the axon tunnel for minutes
        return jax.jit(
            lambda: jax.random.normal(jax.random.key(0), (B, H, W, c), jnp.bfloat16)
        )()

    def mkk(ci, co):
        return jnp.asarray(
            rng.standard_normal((3, 3, ci, co), dtype=np.float32) * 0.05,
            jnp.bfloat16,
        )

    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
        )

    # equal-shape convs chain with input donation (out = conv(out)): only
    # two activation buffers ever live, so 128ch-in/128ch-out at b256
    # (4.3 GB each) fits 16G HBM
    conv_chain = jax.jit(
        lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
        ),
        donate_argnums=(0,),
    )

    # the EXACT W2C ring-conv of layers._RingConvW2C at level-1 shapes:
    # merged x (B, H, W/2, 128), expanded 3x2 kernel, offset alignment,
    # boundary-column correction (ops/w2c.py)
    def w2c_conv(x, km):
        Wm = x.shape[2]
        y = jax.lax.conv_general_dilated(
            x, km, (1, 1), ((1, 1), (0, 1)), dimension_numbers=dn
        )
        corr = jax.lax.conv_general_dilated(
            x[:, :, 0:1, :], km[:, 1:2], (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=dn,
        )
        return y + jnp.pad(corr, ((0, 0), (0, 0), (Wm - 1, 0), (0, 0)))

    w2c_chain = jax.jit(w2c_conv, donate_argnums=(0,))

    def timeit_kernel_chain(fn, x, k, reps: int) -> float:
        x = fn(x, k)
        float(jnp.sum(x[0, 0, 0, :1]))
        trials = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(reps):
                x = fn(x, k)
            float(jnp.sum(x[0, 0, 0, :1]))
            trials.append((time.time() - t0) / reps)
        return float(np.median(trials))

    def timeit_chained(x, k, reps: int) -> float:
        x = conv_chain(x, k)  # compile + warm
        float(jnp.sum(x[0, 0, 0, :1]))
        trials = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(reps):
                x = conv_chain(x, k)
            float(jnp.sum(x[0, 0, 0, :1]))
            trials.append((time.time() - t0) / reps)
        return float(np.median(trials))

    @jax.jit
    def elementwise(x):
        return x * jnp.bfloat16(1.0009765625) + jnp.bfloat16(0.001)

    @jax.jit
    def gn_silu(x):
        from r2dm_tpu.models.layers import group_norm_coeffs

        a, b = group_norm_coeffs(x, 8, 1e-6)
        y = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
        y = y * jax.nn.sigmoid(y)
        return y.astype(x.dtype)

    hbm_bytes = {  # read + write, bf16
        "elementwise_64ch": 2 * B * H * W * 64 * 2,
        "gn_silu_64ch": (2 + 1) * B * H * W * 64 * 2,  # stats read + fma r/w
    }
    # (name, kind, width, c_in, c_out) — inputs are allocated per case and
    # freed between cases (eager allocation of every input OOMs 16G HBM)
    case_specs = [
        ("elementwise_64ch", "ew", W, 64, 0),
        ("gn_silu_64ch", "gn", W, 64, 0),
        ("conv_64_to_64", "conv", W, 64, 64),
        ("conv_64_to_128", "conv", W, 64, 128),
        ("conv_128_to_64", "conv", W, 128, 64),
        ("conv_128_to_128", "conv", W, 128, 128),
        # W-halved, C-doubled: the W2C shape at conv granularity (same
        # activation bytes; dense 3x3 on the merged tensor as an upper
        # bound on the packing benefit)
        ("conv_w512_128_to_128", "conv", W // 2, 128, 128),
        # the exact in-model W2C ring conv (3x2 expanded kernel + wrap fix)
        ("conv_w2c_exact", "w2c", W // 2, 128, 128),
        # polyphase-composition candidates (generic conv: kernel/stride/pad)
        # level-boundary DOWN: fused conv+FIR as NHWC stride-2 6x6 ...
        ("conv_down_nhwc", "convg", W, 64, 128),
        # ... vs consuming MERGED input: stride-(2,1) 6x3 at W/2, same FLOPs
        ("conv_down_merged", "convg", W // 2, 128, 128),
        # level-boundary UP merged-out conv: dense 3x3 128->256 at W/2
        ("conv_up_merged", "convg", W // 2, 128, 256),
        # layout transforms at the level boundaries (merge/unmerge)
        ("w2c_merge", "merge", W, 64, 0),
        ("w2c_unmerge", "unmerge", W // 2, 128, 0),
        # BATCH-pack instead of W-pack: g images' 64 channels share the 128
        # (or 256) lanes via feature_group_count=g — unlike W2C block
        # kernels this has ZERO FLOP overhead. Same useful work as
        # conv_64_to_64 (B images of 3x3 64->64); compare ms directly.
        ("conv_grouped_2x64", "grp2", W, 128, 128),
        ("conv_grouped_4x64", "grp4", W, 256, 256),
    ]
    if args.cases:
        keep = set(args.cases.split(","))
        case_specs = [c for c in case_specs if c[0] in keep]
    results = {}
    for name, kind, w_eff, ci, co in case_specs:
        x = mk(ci) if w_eff == W else jax.jit(
            lambda: jax.random.normal(jax.random.key(0), (B, H, w_eff, ci), jnp.bfloat16)
        )()
        if kind == "convg":
            spec = {
                # (kh, kw, stride_h, stride_w, pad) per candidate
                "conv_down_nhwc": (6, 6, 2, 2, ((2, 2), (2, 2))),
                "conv_down_merged": (6, 3, 2, 1, ((2, 2), (1, 1))),
                "conv_up_merged": (3, 3, 1, 1, ((1, 1), (1, 1))),
            }[name]
            kh, kw, sh, sw, pad = spec
            k = jnp.asarray(
                rng.standard_normal((kh, kw, ci, co), dtype=np.float32) * 0.05,
                jnp.bfloat16,
            )
            g_fn = jax.jit(
                lambda x, k, sh=sh, sw=sw, pad=pad: jax.lax.conv_general_dilated(
                    x, k, (sh, sw), pad, dimension_numbers=dn
                )
            )
            dt = timeit(g_fn, (x, k), args.reps)
            out_h = (H + pad[0][0] + pad[0][1] - kh) // sh + 1
            out_w = (w_eff + pad[1][0] + pad[1][1] - kw) // sw + 1
            flops = 2 * kh * kw * ci * co * B * out_h * out_w
            print(
                json.dumps(
                    {
                        "case": name,
                        "ms": round(dt * 1e3, 3),
                        "tflops": round(flops / dt / 1e12, 1),
                        "mfu": round(flops / dt / 1e12 / 197.0, 3),
                    }
                ),
                flush=True,
            )
            results[name] = dt
            del x, k
            continue
        if kind == "w2c":
            from r2dm_tpu.ops import w2c as w2c_ops

            km = jax.jit(w2c_ops.expand_kernel_3x3)(mkk(64, 64))  # (3,2,128,128)
            dt = timeit_kernel_chain(w2c_chain, x, km, args.reps)
            x = None
            a = (km,)
            flops = 2 * 6 * 128 * 128 * B * H * w_eff  # 6-tap expanded kernel
            print(
                json.dumps(
                    {
                        "case": name,
                        "ms": round(dt * 1e3, 3),
                        "tflops": round(flops / dt / 1e12, 1),
                        "mfu": round(flops / dt / 1e12 / 197.0, 3),
                        "note": "replaces one 64->64 ring conv (23.3 ms NHWC)",
                    }
                ),
                flush=True,
            )
            results[name] = dt
            del a
            continue
        if kind in ("grp2", "grp4"):
            g = int(kind[-1])
            x = jax.jit(
                lambda ci=ci: jax.random.normal(
                    jax.random.key(0), (B // g, H, W, ci), jnp.bfloat16
                )
            )()
            k = jnp.asarray(
                rng.standard_normal((3, 3, 64, 64 * g), dtype=np.float32) * 0.05,
                jnp.bfloat16,
            )
            g_fn = jax.jit(
                lambda x, k, g=g: jax.lax.conv_general_dilated(
                    x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                    feature_group_count=g,
                )
            )
            dt = timeit(g_fn, (x, k), args.reps)
            flops = 2 * 9 * 64 * 64 * B * H * W  # useful work only
            print(
                json.dumps(
                    {
                        "case": name,
                        "ms": round(dt * 1e3, 3),
                        "tflops": round(flops / dt / 1e12, 1),
                        "mfu": round(flops / dt / 1e12 / 197.0, 3),
                        "note": "same useful work as conv_64_to_64",
                    }
                ),
                flush=True,
            )
            results[name] = dt
            del x, k
            continue
        if kind in ("merge", "unmerge"):
            from r2dm_tpu.ops import w2c as w2c_ops

            fn = jax.jit(
                w2c_ops.merge_width_pairs
                if kind == "merge"
                else lambda t: w2c_ops.unmerge_width_pairs(t, "offset")
            )
            dt = timeit(fn, (x,), args.reps)
            print(
                json.dumps(
                    {
                        "case": name,
                        "ms": round(dt * 1e3, 3),
                        "gb_per_s": round(2 * B * H * W * 64 * 2 / dt / 1e9, 1),
                    }
                ),
                flush=True,
            )
            results[name] = dt
            del x
            continue
        if kind == "conv" and ci == co:
            k = mkk(ci, co)
            dt = timeit_chained(x, k, args.reps)
            x = None  # donated away
            a = (k,)
        else:
            a = (x,) if kind != "conv" else (x, mkk(ci, co))
            fn = {"ew": elementwise, "gn": gn_silu, "conv": conv}[kind]
            dt = timeit(fn, a, args.reps)
        flops = 2 * 9 * ci * co * B * H * w_eff if co else 0
        rec = {
            "case": name,
            "ms": round(dt * 1e3, 3),
            "tflops": round(flops / dt / 1e12, 1) if flops else None,
            "mfu": round(flops / dt / 1e12 / 197.0, 3) if flops else None,
        }
        if name in hbm_bytes:
            rec["gb_per_s"] = round(hbm_bytes[name] / dt / 1e9, 1)
        results[name] = dt
        print(json.dumps(rec), flush=True)
        del x, a

    r = results
    if "conv_64_to_64" in r and "conv_64_to_128" in r:
        print(
            json.dumps(
                {
                    "verdict_lane_bound": round(
                        r["conv_64_to_128"] / r["conv_64_to_64"], 3
                    ),
                    "note": "ratio ~1 => lane-bound (idle lanes), ~2 => flop/memory-bound",
                    "double_both": round(
                        r.get("conv_128_to_128", float("nan")) / r["conv_64_to_64"], 3
                    ),
                    "w2c_shape_vs_64": round(
                        r.get("conv_w512_128_to_128", float("nan"))
                        / r["conv_64_to_64"],
                        3,
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
