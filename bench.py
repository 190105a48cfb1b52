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

Methodology: warmup compiles and times ONE 32-step segment (every chunk of
the chain reuses that one compiled fn, so a full warmup chain would waste
~120 s of budget — the round-2 bench ran only 1 trial for exactly that
reason); then timed full-chain trials with fresh keys run while the
remaining wall-clock budget ($R2DM_BENCH_BUDGET_S, default 460 s) covers
the measured per-trial cost, targeting >= 2 trials. Value = median, spread
reported as (min, max, stdev). Trials are synced by transferring a SCALAR
reduction — transferring the full batch through the tunnel (~64 MB) inside
the timed region added 5-20% noise (the round-1 variance source);
block_until_ready alone is unreliable here. With scalar sync the trial
spread is <1%. A persistent XLA compile cache (/tmp) makes warm re-runs
skip the ~2-10 min compile. Sample sanity (finite, non-degenerate) is
asserted on a 2-image slice of the first trial's output, outside the timed
region.

Secondary headline (same JSON line, keys ddim32_*): 32-step DDIM serving
throughput — the few-step mode of the reference sampler
(continuous_time.py:224-229) at 8x fewer network calls; measured only when
budget remains after the primary trials.

`--mesh N` (not used by the driver): shard the batch over an N-device
'data' mesh (jax.sharding) and report AGGREGATE img/s — the artifact behind
the linear-DP-scaling claim. On this box run it under
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N for a
virtual mesh (numbers are then CPU-bound: evidence of the sharded path
executing, not of TPU speed), or on a real pod slice for true scaling.

MFU = achieved TFLOP/s / chip peak, using the measured U-Net cost of
229.4 GFLOP/forward (jax cost analysis, conv+matmul FLOPs only) x 256 steps
= 58.73 TFLOP/image against a v5e bf16 dense peak of 197 TFLOP/s. See
BASELINE.md "Physics ceiling": 100% MFU at this protocol = 3.36 img/s/chip.

vs_baseline: ratio against an ESTIMATED reference-on-A100 throughput, since
the reference repo publishes no numbers (BASELINE.md). Estimate: 58.73
TFLOP/image; A100 fp16 dense peak 312 TFLOP/s at an assumed 30% MFU (torch
inductor) -> ~1.6 img/s.
"""

import argparse
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
DDIM_STEPS = 32

# Secondary-headline budget model — SINGLE source of truth for both the
# reservation in main()'s trial loop and the gates in _secondary_headlines
# (a desync would reintroduce the trials-squeeze-the-secondaries failure).
# Warm evidence, two independent signals (either suffices):
#   1. the primary warmup (init + segment compile + first dispatch) measures
#      ~70-90 s with a warm persistent cache and 300+ s cold — but backend
#      contention can inflate a warm warmup past any threshold (observed:
#      242 s warm), so this signal alone under-fires;
#   2. a marker file written INSIDE the compile-cache dir after the last
#      successful run of that secondary block on this host — direct
#      evidence its XLA program is cached (wiping /tmp removes the cache
#      AND the marker together, so the signals cannot desync that way).
CACHE_DIR = "/tmp/r2dm_tpu_jax_cache"
WARM_EVIDENCE_S = 120.0
COLD_COMPILE_MARGIN_S = 1500.0  # cold compiles via the tunnel: 2-20 min
FLOW_MARGIN_WARM_S = 60.0
DDIM_MARGIN_WARM_S = 90.0
FLOW_REPS = 8  # per timed trial
FLOW_NET_CALLS = 1 + 2 * FLOW_REPS  # compile-warm call + 2 trials x reps
DDIM_CHAIN_FACTOR = 3.5  # warm chain + 2 timed chains + dispatch slack


def _warm_marker(kind: str, batch: int) -> str:
    return os.path.join(CACHE_DIR, f".bench_warm_{kind}_b{batch}_s{STEPS}")


def _compile_margin(kind: str, batch: int, primary_compile_s: float) -> float:
    """Compile-time margin to demand before attempting a secondary block.

    Graduated by evidence strength: a marker proves THAT block's program is
    in the persistent cache (small margin: cache load only); a fast primary
    warmup proves only that the compile HELPER is warm — the secondary
    program itself may still compile, measured ~30-60 s in that regime
    (2x the marker margin); neither signal means a genuinely cold tunnel
    session, where single compiles run 2-20 min.
    """
    warm_margin = FLOW_MARGIN_WARM_S if kind == "flow" else DDIM_MARGIN_WARM_S
    if os.path.exists(_warm_marker(kind, batch)):
        return warm_margin
    if primary_compile_s < WARM_EVIDENCE_S:
        return 2.0 * warm_margin
    return COLD_COMPILE_MARGIN_S


def _skip_reason(remaining: float, result: dict) -> str:
    """Human-readable secondary-skip reason that degrades gracefully.

    When warmup alone already blew the budget (observed in BENCH_r04:
    ~1100 s of cold compiles against a 460 s budget printed a confusing
    "budget (-857s left)"), say THAT, not a negative remaining.
    """
    over = result.get("warmup_overran_s")
    if over is not None:
        return f"warmup overran budget by {over:.0f}s"
    if remaining < 0:
        return f"budget overrun ({-remaining:.0f}s past)"
    return f"budget ({remaining:.0f}s left)"


def _write_warm_marker(kind: str, batch: int) -> None:
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        with open(_warm_marker(kind, batch), "w") as f:
            f.write(time.strftime("%Y-%m-%dT%H:%M:%S"))
    except OSError:
        pass  # marker is an optimization, never an error


def main(mesh_devices="", batch_per_dev: int = BATCH, steps: int = STEPS):
    if os.environ.get("R2DM_TPU_INT8"):
        # experiment hook (not driver protocol): W8A8 ring convs
        # (ops/quant.py) for the int8-lane A/B; MFU is still reported
        # against the bf16 peak so numbers stay comparable
        from r2dm_tpu.models import layers

        layers.QUANT_CONV = "w8a8"
    # Budget: self-imposed wall-clock target. The driver invokes plain
    # `python bench.py` with no env and demonstrably tolerates >=22 min
    # (BENCH_r04 ran 1317+ s and was recorded rc=0), so the default is
    # sized for the full evidence set on a WARM cache — init+warmup
    # ~290 s (warm-cache segment warmup measured 211 s on 2026-08-19;
    # the old 70-90 s band no longer holds) + 3 primary trials (3x118 s)
    # + flow (~70 s) + ddim (~145 s) ~= 860 s — while still degrading to
    # fewer trials + skip-reasons under backend contention.
    budget_s = float(os.environ.get("R2DM_BENCH_BUDGET_S", "900"))
    t_start = time.time()
    # persistent compile cache: warm re-runs skip the XLA compile
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from r2dm_tpu import Config
    from r2dm_tpu.diffusion.base import as_typed_key, normal, split_key
    from r2dm_tpu.inference import build_diffusion, build_model, model_coords

    cfg = Config()
    model = build_model(cfg, dtype=jnp.bfloat16)
    h, w = cfg.data.resolution
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, h, w, 2)), jnp.zeros((1,))
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

    mesh = None
    n_dev = 1
    batch = batch_per_dev
    # "N" -> N-way data parallel; "DxW" -> (data, width) mesh: the batch
    # scales with the data axis only and the azimuth dim shards over
    # 'width' (the multi-chip latency lane, inference.sample semantics)
    from r2dm_tpu.parallel import parse_mesh

    mesh = parse_mesh(mesh_devices)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        batch = batch_per_dev * mesh.shape["data"]  # weak scaling: data axis
        w = "width" if "width" in mesh.axis_names else None
        rep = NamedSharding(mesh, P())
        sharded = NamedSharding(mesh, P("data", None, w, None))
        variables = jax.device_put(variables, rep)

    def jit_seg(mode, ddim_eta=0.0):
        from functools import partial

        fn = partial(diffusion.sample_segment, mode=mode, ddim_eta=ddim_eta)
        if mesh is not None:
            return jax.jit(
                fn,
                in_shardings=(rep, sharded, rep, rep),
                out_shardings=(sharded, rep),
            )
        return jax.jit(fn)

    seg = jit_seg("ddpm")  # (variables, x, key, ts_seg)
    chunk = min(CHUNK, steps)
    ts = jnp.linspace(1.0, 0.0, steps + 1, dtype=jnp.float32)

    def init_x(seed: int):
        key = as_typed_key(jax.random.key(seed))
        key, sub = split_key(key)
        x = normal(sub, (batch, *diffusion.sampling_shape))
        if mesh is not None:
            x = jax.device_put(x, sharded)
        return x, key

    def chain(seed: int, seg_fn=None, ts_all=None, n_steps=None):
        """Full reverse chain == diffusion.sample(key) exactly."""
        x, key = init_x(seed)
        seg_fn = seg_fn or seg
        ts_all = ts if ts_all is None else ts_all
        n_steps = steps if n_steps is None else n_steps
        for lo in range(0, n_steps, chunk):
            x, key = seg_fn(variables, x, key, ts_all[lo : lo + min(chunk, n_steps - lo) + 1])
        return x

    # ---- warmup: compile + time ONE segment (all chunks share the fn)
    x0, key0 = init_x(0)
    t_compile0 = time.time()
    xw, keyw = seg(variables, x0, key0, ts[: chunk + 1])
    float(jnp.sum(xw))  # scalar sync: compile + first dispatch done
    primary_compile_s = time.time() - t_compile0
    t0 = time.time()
    seg2 = ts[chunk : 2 * chunk + 1] if steps > chunk else ts[: chunk + 1]
    xw2, _ = seg(variables, xw, keyw, seg2)
    float(jnp.sum(xw2))
    seg_time = time.time() - t0
    est_trial = seg_time * (steps / chunk)
    warmup_overran_s = max(0.0, (time.time() - t_start) - budget_s)
    del x0, xw, xw2

    # ---- timed full-chain trials within the remaining budget.
    # Reserve budget for the secondary headlines once the statistical
    # minimum (2 trials) is in: a 3rd/4th primary trial adds only stdev
    # confidence, while the DDIM-32 and flow-euler-1 keys are information
    # the driver bench line otherwise loses entirely (observed under the
    # default 460 s budget: 3 trials fit but squeezed both blocks out).
    secondary_reserve = 0.0
    if mesh is None and steps == STEPS:
        # warm cache (see _secondary_headlines): flow margin+cost, then ddim
        fm = _compile_margin("flow", batch, primary_compile_s)
        if fm < COLD_COMPILE_MARGIN_S:
            secondary_reserve += fm + (est_trial / steps) * FLOW_NET_CALLS
        dm = _compile_margin("ddim", batch, primary_compile_s)
        if dm < COLD_COMPILE_MARGIN_S:
            secondary_reserve += (
                dm + est_trial * (DDIM_STEPS / steps) * DDIM_CHAIN_FACTOR
            )
    times = []
    sane = False
    for trial in range(MAX_TRIALS):
        remaining = budget_s - (time.time() - t_start)
        # always run 1 trial; stop early only when another clearly won't fit
        if times and remaining < est_trial * 1.15:
            break
        if len(times) >= 2 and remaining < est_trial * 1.15 + secondary_reserve:
            break
        t0 = time.time()
        x = chain(trial + 1)
        float(jnp.sum(x))
        times.append(time.time() - t0)
        est_trial = times[-1]
        if not sane:  # untimed transfer, first trial only
            xn = np.asarray(x[:2], dtype=np.float32)
            assert np.isfinite(xn).all() and xn.std() > 0.1, "degenerate samples"
            sane = True
        del x

    dt = statistics.median(times)
    img_per_sec = batch / dt
    tflop_per_image = TFLOP_PER_IMAGE * steps / STEPS
    mfu = img_per_sec / n_dev * tflop_per_image / V5E_PEAK_TFLOPS

    result = {
        "metric": f"sampling_throughput_{steps}step_{h}x{w}",
        "value": round(img_per_sec, 4),
        "unit": "img/s/chip" if mesh is None else f"img/s aggregate ({n_dev} dev)",
        "vs_baseline": round(img_per_sec / n_dev / BASELINE_A100_IMG_PER_S, 4),
        "mfu": round(mfu, 4),
        "batch": batch,
        "steps": steps,
        "chunk": chunk,
        "seconds_median": round(dt, 3),
        "seconds_min": round(min(times), 3),
        "seconds_max": round(max(times), 3),
        "seconds_stdev": round(statistics.stdev(times), 4) if len(times) > 1 else 0.0,
        "trials": len(times),
        "device": str(jax.devices()[0]),
        "primary_compile_s": round(primary_compile_s, 1),
        "baseline_note": (
            "vs estimated reference-on-A100 1.6 img/s (no published "
            "numbers; see BASELINE.md, incl. the 3.36 img/s 100%-MFU "
            "single-chip ceiling at this protocol)"
        ),
    }
    if warmup_overran_s > 0:
        result["warmup_overran_s"] = round(warmup_overran_s, 1)

    # The primary headline is in the bag: from here on, a failure in a
    # secondary block must degrade to a partial line, never lose the run
    # (the driver parses whatever this process prints; an unprinted crash
    # after 6 minutes of trials would record nothing).
    try:
        _secondary_headlines(
            result, mesh, steps, batch, budget_s, t_start, est_trial,
            primary_compile_s, jit_seg, chain, model, variables,
        )
    except Exception as e:  # noqa: BLE001 — report, don't lose the line
        result["secondary_error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps(result))


def _secondary_headlines(
    result, mesh, steps, batch, budget_s, t_start, est_trial,
    primary_compile_s, jit_seg, chain, model, variables,
):
    """Flow-euler-1 and DDIM-32 serving keys, budget permitting.

    Ordering and gates: the flow key runs FIRST — it is the flagship
    beyond-reference serving headline and costs ~1/3 of the ddim block
    (one net call per image vs 3.5 32-step chains). Compile margins are
    gated on EVIDENCE of a warm persistent cache (_compile_margin): a fast
    primary warmup (< 120 s) OR a marker file written inside the cache
    dir by the last successful run of that block (the warmup signal alone
    under-fires: backend contention inflated a warm warmup to 242 s and
    skipped everything). On a cold cache a single compile through the
    tunneled helper takes 2-20 min (an observed cold ddim-segment compile
    took ~7 min and blew the budget AFTER a cost-only gate had passed),
    so without warm evidence the blocks demand a 1500 s budget.
    """
    from r2dm_tpu import Config
    from r2dm_tpu.inference import build_diffusion

    if mesh is not None or steps != STEPS:
        return

    # ---- secondary headline: 1-step rectified-flow (euler) serving
    # throughput, the reflow few-step lane (diffusion/flow.py; quality
    # protocol tools/flow_quality_check.sh). Same network graph — only
    # the scan wrapper differs.
    flow_cost = est_trial / steps  # one net call per image
    flow_compile_margin = _compile_margin("flow", batch, primary_compile_s)
    remaining = budget_s - (time.time() - t_start)
    if remaining <= flow_compile_margin + flow_cost * FLOW_NET_CALLS:
        result["flow_euler1_skipped"] = _skip_reason(remaining, result)
    else:
        cfg_flow = Config()
        cfg_flow.diffusion.timestep_type = "flow"
        flow = build_diffusion(cfg_flow, model)
        fn1 = jax.jit(
            lambda v, k: flow.sample(v, k, batch_size=batch, num_steps=1)
        )
        xf = fn1(variables, jax.random.key(70))
        float(jnp.sum(xf[0, 0, 0]))  # compile + first dispatch
        # untimed sanity transfer, mirroring the primary trials: a NaN or
        # degenerate (all-constant) 1-step graph must not report a headline
        xfn = np.asarray(xf[:2], dtype=np.float32)
        assert np.isfinite(xfn).all(), "flow euler-1: non-finite samples"
        assert xfn.std() > 0.1, "flow euler-1: degenerate samples"
        del xf, xfn
        fts = []
        for trial in range(2):
            t0 = time.time()
            tot = jnp.zeros(())
            for r in range(FLOW_REPS):
                x = fn1(variables, jax.random.key(71 + trial * FLOW_REPS + r))
                tot = tot + jnp.sum(x[0, 0, 0])
            float(tot)
            fts.append((time.time() - t0) / FLOW_REPS)
        fdt = statistics.median(fts)
        result["flow_euler1_img_per_s"] = round(batch / fdt, 4)
        result["flow_euler1_seconds_median"] = round(fdt, 4)
        result["flow_euler1_trials"] = len(fts)
        _write_warm_marker("flow", batch)

    # ---- tertiary headline: 32-step DDIM serving throughput (if budget)
    ddim_cost = est_trial * (DDIM_STEPS / steps)
    ddim_compile_margin = _compile_margin("ddim", batch, primary_compile_s)
    remaining = budget_s - (time.time() - t_start)
    if remaining <= ddim_compile_margin + ddim_cost * DDIM_CHAIN_FACTOR:
        result["ddim32_skipped"] = _skip_reason(remaining, result)
    else:
        seg_ddim = jit_seg("ddim")
        ts32 = jnp.linspace(1.0, 0.0, DDIM_STEPS + 1, dtype=jnp.float32)
        float(jnp.sum(chain(90, seg_ddim, ts32, DDIM_STEPS)))  # compile+warm
        dts = []
        for trial in range(2):
            t0 = time.time()
            float(jnp.sum(chain(91 + trial, seg_ddim, ts32, DDIM_STEPS)))
            dts.append(time.time() - t0)
        ddt = statistics.median(dts)
        result["ddim32_img_per_s"] = round(batch / ddt, 4)
        result["ddim32_seconds_median"] = round(ddt, 3)
        result["ddim32_trials"] = len(dts)
        _write_warm_marker("ddim", batch)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--mesh", type=str, default="",
        help="'N' = N-device data mesh (aggregate img/s); 'DxW' = (data, "
        "width) mesh additionally sharding the azimuth axis (latency lane)",
    )
    parser.add_argument(
        "--batch", type=int, default=BATCH,
        help="per-device batch (protocol default 256; lower it for CPU-mesh "
        "scaling artifacts)",
    )
    parser.add_argument(
        "--steps", type=int, default=STEPS,
        help="sampling steps (protocol default 256)",
    )
    a = parser.parse_args()
    main(a.mesh, a.batch, a.steps)
