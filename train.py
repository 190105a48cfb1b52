"""Train an R2DM diffusion model on TPU (config-H recipe by default).

TPU-native counterpart of the reference trainer (train.py:37-318):
  accelerate DDP        -> jit over a jax.sharding.Mesh (grad psum over ICI)
  fp16 AMP              -> bf16 network compute, fp32 params + diffusion math
  ema_pytorch           -> EMA pytree lerp inside the compiled step
  host preprocess       -> fused on-device preprocess inside the jitted step
  torch.save ckpt       -> msgpack checkpoints (+ RESUME, which the
                           reference lacks - SURVEY.md §5)
  tensorboard images    -> PNG panels + metrics.jsonl (+ TB if available)

Usage:
  python train.py --data.dataset kitti_360 --data.data_root /path/to/bins
  python train.py --data.dataset synthetic --training.num_steps 200  # smoke
"""

from __future__ import annotations

import json
import os
import queue
import signal
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from r2dm_tpu import config as config_lib
from r2dm_tpu.checkpoint import load_checkpoint, restore_opt_state, save_checkpoint
from r2dm_tpu.data import DataLoader, make_dataset, preprocess_batch
from r2dm_tpu.inference import (
    build_diffusion,
    build_model,
    count_parameters,
    model_coords,
)
from r2dm_tpu.lidar import LiDARUtility
from r2dm_tpu.parallel import make_mesh, replicated, shard_batch
from r2dm_tpu.training import (
    EMAConfig,
    init_train_state,
    jit_train_step,
    make_optimizer,
    make_train_step,
)
from r2dm_tpu.utils.logging import MetricLogger, save_image_panels


def _setup_compilation_cache() -> None:
    """Persistent XLA compilation cache (first full-model compile is ~40 s;
    subsequent processes reuse it). Opt out with R2DM_NO_COMPILE_CACHE=1."""
    if os.environ.get("R2DM_NO_COMPILE_CACHE"):
        return
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/r2dm_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def _host_rss_gb() -> float:
    """Current resident set of this process in GB (0.0 if unreadable).

    /proc/self/statm field 1 is resident pages; resource.getrusage only
    exposes the high-water mark, which cannot distinguish a leak from a
    settled pool."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGE_SIZE") / 1e9
    except (OSError, ValueError, IndexError):
        return 0.0


def _restart_self(ckpt_path: str) -> None:
    """Re-exec the training CLI with ``--training.resume`` (RSS watchdog).

    Some tunneled TPU runtimes retain the host staging buffer of every
    host->device transfer (measured: 16.5 MB resident per 16.8 MB batch
    transferred, with zero live JAX arrays and gc ineffective), so any
    long run eventually OOMs the host. A fresh process resets the
    retention; the resumable checkpoint makes the restart seamless."""
    argv = [a for a in sys.argv[1:] if not a.startswith("--training.resume=")]
    if "--training.resume" in argv:
        argv[argv.index("--training.resume") + 1] = ckpt_path
    else:
        argv += ["--training.resume", ckpt_path]
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable, sys.argv[0]] + argv)


def _device_batch_iter(loader, mesh, keys, prefetch: int = 2):
    """Host->device pipeline stage: convert + shard the NEXT batch in a
    background thread while the device executes the current step. Doing
    ``jnp.asarray`` + ``shard_batch`` inline in the hot loop serializes the
    host->device transfer with dispatch; on a slow PCIe/tunnel link that
    idles the chip between steps. Transfers ONLY ``keys`` — the planes the
    jitted step consumes: the loader's xyz/mask planes are unused by
    ``preprocess_batch`` (the loss is unmasked, reference parity) and at
    b32 64x1024 they triple the per-step transfer (48 MB -> 16 MB)."""
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for raw in loader:
                batch = shard_batch(
                    mesh, {k: jnp.asarray(raw[k]) for k in keys}
                )
                if not put(batch):
                    return
        except BaseException as exc:  # surface worker errors, don't hang
            put(exc)

    threading.Thread(target=worker, daemon=True).start()

    def gen():
        try:
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    return gen()


def train(cfg: config_lib.Config) -> None:
    _setup_compilation_cache()
    tcfg = cfg.training
    # multi-host: when launched under a JAX coordinator (TPU pod slices),
    # initialize the distributed runtime so jax.process_index()/count and
    # cross-host collectives work (⇔ `accelerate launch`, reference
    # README.md:64). No-op for single-host runs.
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # num_processes/process_id come from the cluster auto-detection on
        # TPU pods / SLURM; JAX has no generic env-var detector, so accept
        # explicit JAX_NUM_PROCESSES / JAX_PROCESS_ID for manual launches
        # (and the 2-process CPU test, tests/test_multihost.py)
        _nproc = os.environ.get("JAX_NUM_PROCESSES")
        _pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            num_processes=int(_nproc) if _nproc else None,
            process_id=int(_pid) if _pid else None,
        )
        # Establish the cross-process collective context NOW, while the
        # processes are still aligned (seconds apart): the first
        # collective's context init has a bounded rendezvous window, and
        # reaching it first through a multi-minute model compile lets
        # per-host compile skew blow past it (Gloo DEADLINE_EXCEEDED on
        # slow hosts; harmless barrier on real pods).
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("r2dm_tpu startup")
    # Preemption-consensus collective (used by should_stop below): ONE
    # compiled global any() reused every step, built + warmed HERE while the
    # processes are still aligned — its first execution initializes the
    # cross-host communicator, whose bounded rendezvous window per-host
    # compile skew would otherwise blow past (exactly the startup-sync
    # problem above; observed as a 30 s Gloo GetKeyValue timeout when the
    # consensus was a fresh per-step process_allgather).
    consensus_any = None
    if jax.process_count() > 1:
        from jax.sharding import Mesh as _Mesh, NamedSharding as _NS
        from jax.sharding import PartitionSpec as _P

        _gmesh = _Mesh(np.asarray(jax.devices()), ("p",))
        _flag_sh = _NS(_gmesh, _P("p"))
        _any_jit = jax.jit(jnp.any, out_shardings=_NS(_gmesh, _P()))

        def consensus_any(local: bool) -> bool:
            flag = jax.make_array_from_process_local_data(
                _flag_sh, np.full((jax.local_device_count(),), bool(local))
            )
            return bool(_any_jit(flag))

        consensus_any(False)  # warm the communicator while aligned
    out_dir = tcfg.output_dir
    is_main = jax.process_index() == 0
    if is_main:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "training_config.json"), "w") as f:
            json.dump(config_lib.asdict(cfg), f, indent=2)  # cf. train.py:60-64

    # ---------------------------------------------------------------- model
    channels = int(cfg.data.train_depth) + int(cfg.data.train_reflectance)
    if not tcfg.gn_bf16:
        # force the GN/AdaGN pass to fp32 regardless of model dtype (the
        # default follows the activation dtype — config.py note)
        from r2dm_tpu.models import layers as _layers

        _layers.GN_ACT_COMPUTE_DTYPE = jnp.float32
    model = build_model(
        cfg,
        dtype=jnp.bfloat16 if tcfg.mixed_precision == "bf16" else None,
        # exact layout transform, +36% train throughput (config.py note)
        width_merge_l1=(
            tcfg.width_merge_l1 and cfg.model.architecture == "efficient_unet"
        ),
    )
    coords = model_coords(cfg)
    init_vars = jax.jit(model.init)(
        jax.random.key(tcfg.seed),
        jnp.zeros((1, *cfg.data.resolution, channels)),
        jnp.zeros((1,)),
    )
    buffers = {"coords": jnp.asarray(coords)}
    diffusion = build_diffusion(cfg, model)
    lidar_utils = LiDARUtility(
        resolution=tuple(cfg.data.resolution),
        depth_format=cfg.data.depth_format,
        min_depth=cfg.data.min_depth,
        max_depth=cfg.data.max_depth,
        ray_angles=coords,
        data_format="NHWC",
    )
    num_params = count_parameters(init_vars)
    if is_main:
        print(f"number of parameters: {num_params/1e6:.2f}M")  # cf. train.py:111-112

    # ------------------------------------------------------------ optimizer
    tx, lr_schedule = make_optimizer(tcfg)
    state = init_train_state(init_vars["params"], buffers, tx)

    # --------------------------------------------------------------- resume
    start_step = 0
    if tcfg.resume:
        ckpt = load_checkpoint(tcfg.resume)
        tpl = state
        state = state.replace(
            params=jax.tree.map(jnp.asarray, ckpt["weights"]["params"]),
            ema_params=jax.tree.map(jnp.asarray, ckpt["ema_weights"]["params"]),
            opt_state=restore_opt_state(tpl.opt_state, ckpt["opt_state"]),
            step=jnp.asarray(ckpt["global_step"], jnp.int32),
        )
        start_step = ckpt["global_step"]
        if is_main:
            print(f"resumed from {tcfg.resume} at step {start_step}")

    # ----------------------------------------------------------------- mesh
    mesh = make_mesh(tcfg.mesh_shape)
    state = jax.device_put(state, replicated(mesh))

    # ----------------------------------------------------------------- data
    dataset = make_dataset(
        cfg.data.dataset,
        cfg.data.data_root,
        "train",
        cfg.data.projection,
        cache_dir=os.path.join(out_dir, "cache") if cfg.data.data_root else None,
    )
    loader = DataLoader(
        dataset,
        batch_size=tcfg.batch_size_train,
        seed=tcfg.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    # ------------------------------------------------------------ train fns
    base_step = make_train_step(
        diffusion,
        tx,
        EMAConfig(beta=tcfg.ema_decay, update_every=tcfg.ema_update_every),
        dropout=cfg.model.dropout,
        grad_dtype=jnp.bfloat16 if tcfg.grad_bf16 else None,
    )
    if tcfg.grad_bf16 and tcfg.mixed_precision != "bf16":
        raise ValueError(
            "training.grad_bf16 requires mixed_precision='bf16': with fp32 "
            "compute the bf16-cast params would dtype-mismatch the convs"
        )

    def full_step(state, raw_batch, key, loss_mask=None):
        x_0 = preprocess_batch(
            lidar_utils,
            raw_batch,
            tuple(cfg.data.resolution),
            cfg.data.train_depth,
            cfg.data.train_reflectance,
        )
        return base_step(state, x_0, key, loss_mask)

    step_fn = jit_train_step(full_step, mesh)

    def sample_fn(variables, key):
        return diffusion.sample(
            variables, key, batch_size=min(tcfg.batch_size_eval, 8), num_steps=256
        )

    sample_jit = jax.jit(sample_fn)

    logger = MetricLogger(out_dir, enabled=is_main)
    root_key = jax.random.key(tcfg.seed)

    # ----------------------------------------------------- preemption guard
    # TPU pods surface maintenance/preemption as SIGTERM to every worker;
    # finish the in-flight step, write the (resumable) checkpoint below, and
    # exit 0 so the scheduler restarts with --training.resume. The reference
    # has no recovery story at all (SURVEY.md §5). Installed per-run so
    # programmatic callers (tests) get their handlers back afterwards.
    preempted = {"signal": None}
    prev_handlers = {}

    def _on_preempt(signum, frame):
        preempted["signal"] = signum
        # re-arm the previous handlers so a SECOND signal acts normally
        # (e.g. Ctrl-C again aborts a stuck compile instead of being eaten)
        for _s, _h in prev_handlers.items():
            signal.signal(_s, _h)
        if is_main:
            print(
                f"received signal {signum}: checkpointing at the next step "
                "boundary and exiting (repeat the signal to abort)",
                flush=True,
            )

    for _sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[_sig] = signal.signal(_sig, _on_preempt)
        except ValueError:  # not in the main thread — skip the guard
            pass

    def should_stop() -> bool:
        """Preemption consensus at the step boundary. Multi-host: the signal
        can land between processes' loop checks — exiting on a process-LOCAL
        flag would leave the others blocked in the next step's collectives.
        All hosts must agree, so the flag goes through the pre-warmed global
        any() (consensus_any above) before anyone stops."""
        stop = preempted["signal"] is not None
        if consensus_any is not None:
            stop = consensus_any(stop)
        return stop

    def write_checkpoint(state, step: int) -> str:
        path = os.path.join(out_dir, "checkpoint.msgpack")
        save_checkpoint(
            path,
            config_lib.asdict(cfg),
            {"params": state.params, "buffers": state.buffers},
            ema_weights={"params": state.ema_params, "buffers": state.buffers},
            opt_state=jax.tree.map(np.asarray, state.opt_state),
            step=step,
        )  # cf. train.py:291-304 (+ resume support)
        return path

    # ------------------------------------------------------------ hot loop
    t0 = time.time()
    global_step = start_step
    batch_keys = []
    if cfg.data.train_depth:
        batch_keys.append("depth")
    if cfg.data.train_reflectance:
        batch_keys.append("reflectance")
    data_iter = _device_batch_iter(loader, mesh, batch_keys)
    try:
        while global_step < tcfg.num_steps and not should_stop():
            batch = next(data_iter)
            step_key = jax.random.fold_in(root_key, global_step)
            if tcfg.profile_dir and global_step - start_step == 10:
                jax.profiler.start_trace(tcfg.profile_dir)
            state, metrics = step_fn(state, batch, step_key, None)
            global_step += 1
            if tcfg.profile_dir and global_step - start_step == 15:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                if is_main:
                    print(f"profile trace written to {tcfg.profile_dir}")

            if global_step % 50 == 0 or global_step == 1:
                m = {k: float(v) for k, v in metrics.items()}
                m["lr"] = float(lr_schedule(global_step))
                m["steps_per_sec"] = (
                    (global_step - start_step) / (time.time() - t0)
                )
                logger.log(global_step, m)  # cf. train.py:273-277

                # Host-RSS watchdog (see _restart_self): checkpoint and
                # restart before the leaked h2d staging OOM-kills the run.
                # The >=50-steps-since-start guard guarantees forward
                # progress per exec even when the baseline RSS alone
                # exceeds the limit.
                rss_limit = tcfg.max_host_rss_gb
                if (
                    rss_limit
                    and global_step - start_step >= 50
                    and _host_rss_gb() > rss_limit
                ):
                    path = os.path.join(out_dir, "checkpoint.msgpack")
                    if is_main:
                        write_checkpoint(state, global_step)
                    if jax.process_count() == 1 and os.path.basename(
                        sys.argv[0]
                    ).startswith("train"):
                        print(
                            f"host RSS {_host_rss_gb():.1f} GB > "
                            f"{rss_limit} GB at step {global_step}: "
                            "restarting the process with --training.resume "
                            "(h2d staging retention, see "
                            "training.max_host_rss_gb)",
                            flush=True,
                        )
                        logger.flush()
                        data_iter.close()
                        _restart_self(path)
                    # programmatic or multi-host callers: stop through the
                    # preemption consensus (checkpoint above already
                    # written; multi-host peers write their own is_main=no-op)
                    preempted["signal"] = preempted["signal"] or "host-rss"

            if global_step % tcfg.steps_save_image == 0 and is_main:
                ema_vars = {"params": state.ema_params, "buffers": state.buffers}
                key = jax.random.fold_in(jax.random.key(9), global_step)
                samples = sample_jit(ema_vars, key)
                save_image_panels(
                    out_dir, global_step, samples, lidar_utils, channels
                )  # cf. train.py:282-289, 220-245

            if global_step % tcfg.steps_save_model == 0 and is_main:
                write_checkpoint(state, global_step)

        if is_main:
            write_checkpoint(state, global_step)
            if preempted["signal"] is not None:
                print(
                    f"preempted at step {global_step} (signal "
                    f"{preempted['signal']}); resume with --training.resume "
                    f"{os.path.join(out_dir, 'checkpoint.msgpack')}"
                )
            else:
                print(
                    f"done: {global_step} steps in {time.time()-t0:.0f}s -> {out_dir}"
                )
    finally:
        # restore on every exit path (exceptions included) so
        # programmatic callers keep their Ctrl-C/SIGTERM semantics
        for _sig, _h in prev_handlers.items():
            signal.signal(_sig, _h)
        data_iter.close()  # stop the prefetch thread (and its loader thread)


if __name__ == "__main__":
    train(config_lib.parse_cli())
