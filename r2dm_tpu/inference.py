"""Model construction + checkpoint loading + the user-facing DDPM wrapper.

Mirrors the reference ``utils/inference.py:16-114`` (setup_model) and the
torch.hub surface (``hubconf.py:21-37``): rebuild the network from the config
embedded in a checkpoint, load EMA weights, and hand back a ready-to-sample
model plus a matching LiDARUtility.

The :class:`DDPM` wrapper binds (diffusion process, variables) and exposes
``sample / repaint / loss`` with jit caching — the sampling chain compiles to
a single XLA program per (batch_size, num_steps, mode) signature. The public
array layout is NCHW to match the reference API (README.md:22-34); computation
is NHWC inside.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import config as config_lib
from .diffusion import (
    ContinuousTimeGaussianDiffusion,
    DiscreteTimeGaussianDiffusion,
    key_batch_from_seeds,
)
from .lidar import LiDARUtility
from .models.efficient_unet import EfficientUNet
from .ops.encoding import get_hdl64e_linear_ray_angles


def count_parameters(variables) -> int:
    """Total parameter count (reference utils/inference.py:109-110)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def build_model(
    cfg: config_lib.Config, dtype: Any = None, width_merge_l1: bool = False
):
    """Construct the denoiser network from a Config (reference
    utils/inference.py:38-58, train.py:76-89).

    ``width_merge_l1``: run the outermost U-Net level width-pair-merged
    (ops/w2c.py) — exact math, same parameter tree, ~10% faster sampling at
    SMALL batches (<=64; latency-sensitive serving). At batch >=128 the
    default NHWC layout is faster — leave this off for throughput work.
    """
    resolution = tuple(cfg.data.resolution)
    in_channels = int(cfg.data.train_depth) + int(cfg.data.train_reflectance)
    if cfg.model.architecture == "efficient_unet":
        return EfficientUNet(
            width_merge_l1=width_merge_l1,
            in_channels=in_channels,
            resolution=resolution,
            base_channels=cfg.model.base_channels,
            temb_channels=cfg.model.temb_channels,
            channel_multiplier=tuple(cfg.model.channel_multiplier),
            num_residual_blocks=tuple(cfg.model.num_residual_blocks),
            gn_num_groups=cfg.model.gn_num_groups,
            gn_eps=cfg.model.gn_eps,
            attn_num_heads=cfg.model.attn_num_heads,
            coords_encoding=cfg.model.coords_encoding,
            dropout=cfg.model.dropout,
            ring=True,
            dtype=dtype,
        )
    if cfg.model.architecture == "refinenet":
        if width_merge_l1:
            raise ValueError("width_merge_l1 is an EfficientUNet-only layout")
        from .models.refinenet import LiDARGenRefineNet

        return LiDARGenRefineNet(
            in_channels=in_channels,
            resolution=resolution,
            base_channels=cfg.model.base_channels,
            channel_multiplier=tuple(cfg.model.channel_multiplier),
            dtype=dtype,
        )
    raise ValueError(f"unknown architecture: {cfg.model.architecture}")


def model_coords(cfg: config_lib.Config) -> np.ndarray:
    """Spatial coordinate grid for the model buffer, (H, W, 2).

    Reference train.py:100-107: spherical projection -> HDL-64E linear ray
    angles at the training resolution; unfolding -> measured per-pixel angle
    table (produced by tools/make_unfolding_angles.py from raw scans).
    """
    resolution = tuple(cfg.data.resolution)
    if cfg.data.projection.startswith("spherical"):
        return get_hdl64e_linear_ray_angles(*resolution)
    if cfg.data.projection.startswith("unfolding"):
        angles_dir = os.environ.get("R2DM_ANGLES_DIR") or os.path.join(
            os.path.dirname(__file__), "data", "angles"
        )
        path = os.path.join(
            angles_dir, f"{cfg.data.dataset}_unfolding_angles.npz"
        )
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"unfolding angle table not found at {path}; generate it with "
                "tools/make_unfolding_angles.py (requires the raw dataset)"
            )
        table = np.load(path)["angles"].astype(np.float32)  # (H, W, 2)
        from .lidar import nearest_exact_resize_hw

        return nearest_exact_resize_hw(table, resolution)
    raise ValueError(f"unknown projection: {cfg.data.projection}")


def build_diffusion(cfg: config_lib.Config, model, apply_fn=None):
    """Wrap the network in the configured diffusion process (reference
    utils/inference.py:62-78, train.py:115-130)."""
    common = dict(
        model=model,
        prediction_type=cfg.diffusion.prediction_type,
        loss_type=cfg.diffusion.loss_type,
        noise_schedule=cfg.diffusion.noise_schedule,
        apply_fn=apply_fn,
    )
    if cfg.diffusion.timestep_type == "continuous":
        return ContinuousTimeGaussianDiffusion(**common)
    if cfg.diffusion.timestep_type == "discrete":
        return DiscreteTimeGaussianDiffusion(
            num_training_steps=cfg.diffusion.num_training_steps or 1024, **common
        )
    if cfg.diffusion.timestep_type == "flow":
        # rectified flow / flow matching (diffusion/flow.py) — the few-step
        # family of the reference authors' follow-up (arXiv 2412.02241);
        # prediction_type/noise_schedule do not apply to the straight-path ODE
        from .diffusion.flow import RectifiedFlow

        return RectifiedFlow(
            model=model, loss_type=cfg.diffusion.loss_type, apply_fn=apply_fn
        )
    raise ValueError(f"unknown timestep type: {cfg.diffusion.timestep_type}")


class DDPM:
    """Bound (diffusion, variables) with the reference's sampling surface.

    ``ddpm.sample(batch_size=1, num_steps=256)`` returns NCHW fp32 in [-1, 1]
    like the reference (README.md:27-29); pass ``data_format="NHWC"`` for the
    native layout. Per-sample determinism: pass ``seeds=[...]`` (the analogue
    of the reference's list-of-torch.Generators) or an explicit ``key``.
    """

    def __init__(self, diffusion, variables, cfg: Optional[config_lib.Config] = None):
        self.diffusion = diffusion
        self.variables = variables
        self.cfg = cfg
        self.num_parameters = count_parameters(variables)
        self._jit_cache: dict = {}
        self._auto_calls = 0  # advances the default rng stream per call

    # bound on distinct compiled (batch, steps, mode, mesh, ...) signatures
    # kept alive; a long-lived serving process sweeping shapes would
    # otherwise grow the cache (and the XLA executables it pins) unboundedly
    JIT_CACHE_SIZE = 16

    def _cached_jit(self, sig, make):
        """LRU-bounded memo of jit-wrapped samplers keyed by signature."""
        cache = self._jit_cache
        if sig in cache:
            cache[sig] = cache.pop(sig)  # refresh LRU order
        else:
            cache[sig] = make()
            while len(cache) > self.JIT_CACHE_SIZE:
                cache.pop(next(iter(cache)))
        return cache[sig]

    def clear_jit_cache(self) -> None:
        """Drop all compiled sampler executables (frees device memory)."""
        self._jit_cache.clear()

    # convenience accessors mirroring the reference module attributes
    @property
    def sampling_shape(self):
        return self.diffusion.sampling_shape

    @property
    def coords(self) -> Optional[jnp.ndarray]:
        """(H, W, 2) spatial coordinate buffer of the network, if any."""
        bufs = self.variables.get("buffers", {})
        return bufs.get("coords")

    def _key(self, key, seeds, default_seed=0):
        if key is not None:
            # normalize IMMEDIATELY: downstream batch-chunking inspects
            # is_key_batch (ndim==1), which would misread the documented
            # raw uint32 (2,) key-data form as a batch of 2 per-sample keys
            # and slice it to pieces
            from .diffusion.base import as_typed_key

            return as_typed_key(jnp.asarray(key))
        if seeds is not None:
            return key_batch_from_seeds(list(seeds))
        # no explicit randomness given: advance an internal stream so
        # repeated calls produce fresh batches (the reference draws from the
        # global torch rng; a fixed key would silently return duplicates).
        # Multi-host runs must pass the key explicitly — a per-process
        # counter can silently desynchronize a replicated key across hosts.
        if jax.process_count() > 1:
            raise ValueError(
                "multi-host sampling needs an explicit key= or seeds= "
                "(the implicit per-process rng stream would desynchronize)"
            )
        self._auto_calls += 1
        return jax.random.fold_in(jax.random.key(default_seed), self._auto_calls)

    def sample(
        self,
        batch_size: int,
        num_steps: int,
        key=None,
        seeds=None,
        mode: str = "ddpm",
        ddim_eta: float = 0.0,
        return_all: bool = False,
        data_format: str = "NCHW",
        mesh=None,
        progress: bool = False,
        progress_chunk: int = 32,
        batch_chunk: Optional[int] = None,
    ) -> jnp.ndarray:
        """Generate scans; with ``mesh`` the batch is sharded over the mesh's
        'data' axis — XLA partitions the whole sampling scan across chips
        (the serving-side counterpart of the trainer's data parallelism).

        Oversized batches auto-chunk along the batch axis too (the HBM
        bound: a config-H net call fits 384 images/chip but OOMs at 512 —
        quality/probe_flow_serving_20260819_b512_oom.txt) and run as
        sequential sweet-spot-sized dispatches; ``batch_chunk`` forces a
        chunk size (images per dispatch, a multiple of the mesh's data
        axis when meshed). With ``seeds``/key batches the chunked result
        is row-exact (row i is drawn from key i alone); a single key
        derives independent per-chunk keys.

        ``progress=True`` (both continuous- and discrete-time, with or
        without ``return_all``): the chain runs as ``progress_chunk``-step
        compiled segments with a host-side progress line between chunks —
        the reference's per-step tqdm UX (continuous_time.py:251-252) at
        ~1/chunk of the dispatch overhead. Samples are bit-identical to the
        single-scan path (same key splits).

        Very large chains (batch_size * num_steps >= ``AUTO_CHUNK_WORK``)
        are chunked automatically even without ``progress``: a single
        multi-minute device dispatch can trip execution watchdogs (observed
        on tunneled TPU runtimes: a ~137 s dispatch kills the worker while
        ~17 s segments are stable), and chunking costs nothing — segment
        dispatches queue asynchronously and the math is bit-identical.
        """
        from .diffusion.flow import RectifiedFlow

        is_flow = isinstance(self.diffusion, RectifiedFlow)
        if mode == "dpmpp_2m" and (
            is_flow or isinstance(self.diffusion, DiscreteTimeGaussianDiffusion)
        ):
            raise ValueError(
                "mode='dpmpp_2m' requires continuous-time diffusion "
                "(the solver integrates the logSNR-parameterized PF-ODE)"
            )
        if (mode in ("euler", "midpoint")) != is_flow:
            raise ValueError(
                f"mode={mode!r} does not apply to "
                f"{type(self.diffusion).__name__}: flow checkpoints sample "
                "with 'euler'/'midpoint', Gaussian ones with "
                "'ddpm'/'ddim'/'dpmpp_2m'"
            )
        # ---- batch auto-chunking (HBM bound, measured at 64x1024: a single
        # net call fits b384 but OOMs at b512 by 270 MB — the level-1
        # activations alone are ~8 MB/image — while per-image throughput is
        # flat beyond b256). Oversized serving batches run as sequential
        # sweet-spot-sized chunks instead of OOMing.
        if batch_chunk is not None and batch_chunk < 1:
            raise ValueError(f"batch_chunk must be >= 1, got {batch_chunk}")
        # per-DEVICE pixels: the batch shards over 'data' and, on a
        # (data, width) mesh, each image's azimuth axis shards over 'width'
        hw = int(np.prod(self.sampling_shape[:-1]))
        data_size = 1 if mesh is None else mesh.shape.get("data", 1)
        width_size = 1 if mesh is None else mesh.shape.get("width", 1)
        dev_hw = hw // max(width_size, 1)
        auto_batch_chunked = False
        if (batch_chunk is None
                and (batch_size // max(data_size, 1)) * dev_hw
                > self.MAX_BATCH_PIXELS):
            batch_chunk = max(1, self.BATCH_CHUNK_PIXELS // dev_hw) * data_size
            auto_batch_chunked = True
        if batch_chunk is not None and batch_chunk < batch_size:
            from .diffusion.base import is_key_batch

            key = self._key(key, seeds)
            if auto_batch_chunked and not is_key_batch(key):
                # With a single key, per-chunk keys come from fold_in, so the
                # sample stream depends on WHERE the auto-chunk boundary
                # falls (MAX_BATCH_PIXELS retunes or hardware changes move
                # it). Per-sample `seeds=` are invariant to chunking; warn
                # once per call site (advisor finding, round 4).
                import warnings

                warnings.warn(
                    "batch auto-chunking with a single key: samples depend "
                    "on the chunk boundary (a MAX_BATCH_PIXELS retune or "
                    "different hardware changes them); pass seeds=[...] for "
                    "chunking-invariant determinism",
                    stacklevel=2,
                )
            outs = []
            done = 0
            while done < batch_size:
                n = min(batch_chunk, batch_size - done)
                sub = (key[done:done + n] if is_key_batch(key)
                       else jax.random.fold_in(key, done))
                outs.append(self.sample(
                    n, num_steps, key=sub, mode=mode, ddim_eta=ddim_eta,
                    return_all=return_all, data_format=data_format,
                    mesh=mesh, progress=progress,
                    progress_chunk=progress_chunk,
                ))
                done += n
            # return_all layouts are (T, B, ...) — batch is axis 1 there
            return jnp.concatenate(outs, axis=1 if return_all else 0)

        work = batch_size * num_steps * int(np.prod(self.sampling_shape[:-1]))
        auto_chunk = work >= self.AUTO_CHUNK_WORK
        if progress or auto_chunk:
            return self._sample_progress(
                batch_size, num_steps, self._key(key, seeds), mode, ddim_eta,
                data_format, mesh, progress_chunk, show=progress,
                return_all=return_all,
            )
        # Mesh is hashable with content equality — equal meshes share the
        # compiled sampler
        sig = ("sample", batch_size, num_steps, mode, float(ddim_eta), return_all,
               mesh)

        def make():
            if isinstance(self.diffusion, DiscreteTimeGaussianDiffusion):
                fn = partial(
                    self.diffusion.sample,
                    batch_size=batch_size,
                    num_steps=num_steps,
                    mode=mode,
                    eta=ddim_eta,
                    return_all=return_all,
                )
            elif mode == "dpmpp_2m":
                fn = partial(
                    self.diffusion.sample_dpmpp,
                    batch_size=batch_size,
                    num_steps=num_steps,
                    return_all=return_all,
                )
            else:
                fn = partial(
                    self.diffusion.sample,
                    batch_size=batch_size,
                    num_steps=num_steps,
                    mode=mode,
                    ddim_eta=ddim_eta,
                    return_all=return_all,
                )
            if mesh is not None:
                # a 2-axis (data, width) mesh additionally shards the
                # azimuth dim: GSPMD turns the ring convs' wrap columns and
                # FIR margins into ICI halo permutes (parallel/mesh.py) —
                # the multi-chip LATENCY lane (batch can be as small as 1)
                rep, sharded, stack = self._mesh_shardings(mesh)
                return jax.jit(
                    fn,
                    in_shardings=(rep, None),
                    out_shardings=stack if return_all else sharded,
                )
            return jax.jit(fn)

        x = self._cached_jit(sig, make)(self.variables, self._key(key, seeds))
        if data_format == "NCHW":
            perm = (0, 3, 1, 2) if not return_all else (0, 1, 4, 2, 3)
            x = jnp.transpose(x, perm)
        return x

    # pixel-steps (batch * steps * H * W) above which sample() auto-chunks:
    # 64 images x 256 steps at 64x1024 is a ~35 s dispatch at measured v5e
    # speed — comfortably under observed tunnel watchdogs while amortizing
    # dispatch overhead
    AUTO_CHUNK_WORK = 64 * 256 * 64 * 1024

    # batch-axis chunking bounds (per device, in pixels = batch * H * W):
    # MAX is the measured single-dispatch HBM fit at config-H on a 16 GB
    # v5e (b384 fits; b512 OOMs by 270 MB), CHUNK is the measured
    # throughput sweet spot (per-image cost is flat 256 -> 384)
    MAX_BATCH_PIXELS = 384 * 64 * 1024
    BATCH_CHUNK_PIXELS = 256 * 64 * 1024

    def _sample_progress(
        self, batch_size, num_steps, key, mode, ddim_eta, data_format, mesh,
        chunk, show: bool = True, return_all: bool = False,
    ) -> jnp.ndarray:
        """Chunked-scan sampling with a host progress line (see sample())."""
        import sys
        import time

        from .diffusion.base import as_typed_key, normal, split_key

        if chunk < 1:
            raise ValueError(f"progress_chunk must be >= 1, got {chunk}")
        diff = self.diffusion
        discrete = isinstance(diff, DiscreteTimeGaussianDiffusion)
        dpmpp = (not discrete) and mode == "dpmpp_2m"
        sig = ("segment", batch_size, mode, float(ddim_eta), mesh, return_all)

        def make():
            if discrete:
                fn = partial(
                    diff.sample_segment, mode=mode, eta=ddim_eta,
                    return_all=return_all,
                )
            elif dpmpp:
                fn = partial(diff.dpmpp_2m_segment, return_all=return_all)
            else:
                fn = partial(
                    diff.sample_segment, mode=mode, ddim_eta=ddim_eta,
                    return_all=return_all,
                )
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep, sharded, stack = self._mesh_shardings(mesh)
                if dpmpp:
                    # (variables, x, prev_x0, prev_lam, key, ts_seg, 2nd-order)
                    # prev_lam is (B,1,1,1): batch-sharded only (its W dim
                    # is size 1 and cannot split over a width axis)
                    lam_sh = NamedSharding(mesh, P("data", None, None, None))
                    in_sh = (rep, sharded, sharded, lam_sh, rep, rep, rep)
                    out_sh = (sharded, sharded, lam_sh, rep)
                else:
                    in_sh = (rep, sharded, rep, rep)
                    out_sh = (sharded, rep)
                if return_all:
                    out_sh = (*out_sh, stack)
                return jax.jit(fn, in_shardings=in_sh, out_shardings=out_sh)
            return jax.jit(fn)

        seg_fn = self._cached_jit(sig, make)

        # identical key math to the corresponding .sample implementation
        key = as_typed_key(key)
        key, sub = split_key(key)
        x = normal(sub, (batch_size, *diff.sampling_shape))
        if discrete:
            # descending timestep indices (discrete.py sample)
            ts = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
        else:
            ts = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)
        if dpmpp:
            idx = jnp.arange(num_steps)
            second_order = (idx > 0) & (idx < num_steps - 1)
            prev_x0 = jnp.zeros_like(x)
            prev_lam = jnp.zeros((batch_size, 1, 1, 1), jnp.float32)
        stacks = [x[None]] if return_all else None
        t0 = time.time()
        done = 0
        while done < num_steps:
            n = min(chunk, num_steps - done)
            seg = ts[done : done + n] if discrete else ts[done : done + n + 1]
            if dpmpp:
                out = seg_fn(
                    self.variables, x, prev_x0, prev_lam, key, seg,
                    second_order[done : done + n],
                )
                if return_all:
                    x, prev_x0, prev_lam, key, xs = out
                    stacks.append(xs)
                else:
                    x, prev_x0, prev_lam, key = out
            elif return_all:
                x, key, xs = seg_fn(self.variables, x, key, seg)
                stacks.append(xs)
            else:
                x, key = seg_fn(self.variables, x, key, seg)
            first = done == 0
            done += n
            if show:
                # sync on a transferred SCALAR: block_until_ready can return
                # early through tunneled runtimes (CLAUDE.md timing rule), so
                # the step rate/ETA would overstate progress exactly where
                # this display matters
                float(jnp.sum(x[0, 0, 0]))
                if first:
                    # restart the clock after the first chunk so the
                    # rate/eta exclude XLA compile time
                    t0, timed_from = time.time(), done
                msg = f"\rsampling {done}/{num_steps} steps"
                if done > timed_from:
                    rate = (done - timed_from) / max(time.time() - t0, 1e-9)
                    eta = (num_steps - done) / max(rate, 1e-9)
                    msg += f" ({rate:.1f} step/s, eta {eta:.0f}s)"
                print(
                    msg,
                    end="" if done < num_steps else "\n",
                    file=sys.stderr,
                    flush=True,
                )
        if return_all:
            x = jnp.concatenate(stacks, axis=0)
            perm = (0, 1, 4, 2, 3)
        else:
            perm = (0, 3, 1, 2)
        if data_format == "NCHW":
            x = jnp.transpose(x, perm)
        return x

    def repaint(
        self,
        known: jnp.ndarray,
        mask: jnp.ndarray,
        num_steps: int,
        num_resample_steps: int = 1,
        jump_length: int = 1,
        key=None,
        seeds=None,
        data_format: str = "NCHW",
        mesh=None,
        progress: bool = False,
        progress_chunk: int = 32,
    ) -> jnp.ndarray:
        """RePaint completion; ``known``/``mask`` in ``data_format`` layout
        (reference continuous_time.py:260-317, completion_demo.py:92-99).

        Like :meth:`sample`, big grids auto-chunk: the T x r x j RePaint
        grid is num_steps * num_resample_steps * jump_length network calls,
        and compiling it as ONE dispatch trips multi-minute execution
        watchdogs at completion-scale batches. Chunks run
        ``diffusion.repaint_segment`` over contiguous outer-step slices —
        bit-identical to the monolithic path (same key-split sequence).
        ``progress=True`` also prints a host-side progress line per chunk.
        ``mesh``: same semantics as :meth:`sample` — batch over 'data', and
        on a (data, width) mesh the azimuth axis too (completion is the
        latency-sensitive interactive path).
        """
        # Flow checkpoints repaint too: RectifiedFlow supplies the
        # process-specific hooks (Euler reverse jumps + straight-path
        # re-noising, flow.py) under the same base-class drivers, so the
        # chunked/mesh plumbing below is family-agnostic. The discrete-time
        # family has no RePaint hooks — matching the reference, whose
        # repaint lives in continuous_time.py:261 only — so fail it clearly
        # here rather than with a bare NotImplementedError mid-jit-trace.
        if isinstance(self.diffusion, DiscreteTimeGaussianDiffusion):
            raise ValueError(
                "repaint requires a continuous-time or flow checkpoint; the "
                "discrete-time family does not implement the RePaint hooks "
                "(reference parity: repaint exists in continuous_time.py "
                "only)"
            )
        # Validate the mask layout up front: an unbatched (H,W,C) mask whose
        # leading dim happens to equal the batch size would be silently
        # sliced along H by the chunker, and a batch not in {1, bsz} would
        # broadcast-fail only deep inside jit (advisor finding, round 4).
        known = jnp.asarray(known)
        mask = jnp.asarray(mask)
        if mask.ndim != known.ndim:
            raise ValueError(
                f"mask must have the same rank as known (batched, "
                f"{data_format}); got mask {mask.shape} vs known {known.shape}"
            )
        if mask.shape[0] not in (1, known.shape[0]):
            raise ValueError(
                f"mask batch dim must be 1 (broadcast) or match known's "
                f"{known.shape[0]}; got {mask.shape[0]}"
            )
        # batch-axis auto-chunking at the same measured HBM bound as
        # sample(): row-exact with key batches (row i draws from key i).
        # Pixels counted per DEVICE (azimuth shards over 'width', cf. sample)
        hw = int(np.prod(self.sampling_shape[:-1]))
        data_size = 1 if mesh is None else mesh.shape.get("data", 1)
        width_size = 1 if mesh is None else mesh.shape.get("width", 1)
        dev_hw = hw // max(width_size, 1)
        bsz = int(known.shape[0])
        if (bsz // max(data_size, 1)) * dev_hw > self.MAX_BATCH_PIXELS:
            from .diffusion.base import is_key_batch

            batch_chunk = max(1, self.BATCH_CHUNK_PIXELS // dev_hw) * data_size
            key = self._key(key, seeds)
            outs = []
            done = 0
            while done < bsz:
                n = min(batch_chunk, bsz - done)
                sub = (key[done:done + n] if is_key_batch(key)
                       else jax.random.fold_in(key, done))
                m = mask[done:done + n] if mask.shape[0] == bsz else mask
                outs.append(self.repaint(
                    known[done:done + n], m, num_steps,
                    num_resample_steps=num_resample_steps,
                    jump_length=jump_length, key=sub,
                    data_format=data_format, mesh=mesh, progress=progress,
                    progress_chunk=progress_chunk,
                ))
                done += n
            return jnp.concatenate(outs, axis=0)
        if data_format == "NCHW":
            known = jnp.transpose(known, (0, 2, 3, 1))
            mask = jnp.transpose(mask, (0, 2, 3, 1))
        # effective work in pixel*net-call units, comparable to sample()'s
        net_calls = num_steps * num_resample_steps * jump_length
        work = known.shape[0] * net_calls * int(np.prod(self.sampling_shape[:-1]))
        chunked = progress or work >= self.AUTO_CHUNK_WORK
        if chunked:
            x = self._repaint_chunked(
                known, mask, num_steps, num_resample_steps, jump_length,
                self._key(key, seeds), show=progress, chunk=progress_chunk,
                mesh=mesh,
            )
        else:
            sig = ("repaint", known.shape, num_steps, num_resample_steps,
                   jump_length, mesh)

            def make():
                fn = partial(
                    self.diffusion.repaint,
                    num_steps=num_steps,
                    num_resample_steps=num_resample_steps,
                    jump_length=jump_length,
                )
                if mesh is not None:
                    rep, sharded, _ = self._mesh_shardings(mesh)
                    return jax.jit(
                        fn,
                        in_shardings=(rep, sharded, sharded, None),
                        out_shardings=sharded,
                    )
                return jax.jit(fn)

            fn = self._cached_jit(sig, make)
            x = fn(self.variables, known, mask, self._key(key, seeds))
        if data_format == "NCHW":
            x = jnp.transpose(x, (0, 3, 1, 2))
        return x

    @staticmethod
    def _mesh_shardings(mesh):
        """(replicated, image-batch, step-stack) shardings for a serving
        mesh: batch over 'data', azimuth over 'width' when the mesh has a
        second axis (see sample())."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        w = "width" if "width" in mesh.axis_names else None
        rep = NamedSharding(mesh, P())
        sharded = NamedSharding(mesh, P("data", None, w, None))
        stack = NamedSharding(mesh, P(None, "data", None, w, None))
        return rep, sharded, stack

    def _repaint_chunked(
        self, known, mask, num_steps, num_resample_steps, jump_length, key,
        show: bool, chunk: int, mesh=None,
    ) -> jnp.ndarray:
        """Chunked-dispatch RePaint (see repaint()); NHWC in/out."""
        import sys
        import time

        from .diffusion.base import as_typed_key, normal, split_key

        diff = self.diffusion
        # outer steps per dispatch, sized so one dispatch is ~`chunk` net
        # calls (the same dispatch length sample() uses)
        per_step = num_resample_steps * jump_length
        steps_per_chunk = max(1, chunk // per_step)

        key = as_typed_key(key)
        key, sub = split_key(key)
        x = normal(sub, (known.shape[0], *diff.sampling_shape))
        ts = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)

        def make_seg():
            fn = partial(
                diff.repaint_segment,
                num_resample_steps=num_resample_steps,
                jump_length=jump_length,
            )
            if mesh is not None:
                rep, sharded, _ = self._mesh_shardings(mesh)
                # (variables, known, mask, x, key, ts_pairs) -> (x, key)
                return jax.jit(
                    fn,
                    in_shardings=(rep, sharded, sharded, sharded, rep, rep),
                    out_shardings=(sharded, rep),
                )
            return jax.jit(fn)

        def make_final():
            fn = partial(diff.repaint_final, jump_length=jump_length)
            if mesh is not None:
                rep, sharded, _ = self._mesh_shardings(mesh)
                # (variables, known, mask, x, key, t, s) -> x
                return jax.jit(
                    fn,
                    in_shardings=(rep, sharded, sharded, sharded, rep, rep, rep),
                    out_shardings=sharded,
                )
            return jax.jit(fn)

        t0 = time.time()
        done = 0
        timed_from = 0
        if num_steps > 1:
            ts_pairs = jnp.stack([ts[:-2], ts[1:-1]], axis=1)
            seg_fn = self._cached_jit(
                ("repaint_seg", known.shape, num_resample_steps, jump_length,
                 mesh),
                make_seg,
            )
            while done < num_steps - 1:
                n = min(steps_per_chunk, num_steps - 1 - done)
                x, key = seg_fn(
                    self.variables, known, mask, x, key,
                    ts_pairs[done : done + n],
                )
                first = done == 0
                done += n
                if show:
                    float(jnp.sum(x[0, 0, 0]))  # scalar sync (CLAUDE.md rule)
                    if first:
                        t0, timed_from = time.time(), done
                    msg = f"\rrepaint {done}/{num_steps} steps"
                    if done > timed_from:
                        rate = (done - timed_from) / max(time.time() - t0, 1e-9)
                        eta = (num_steps - done) / max(rate, 1e-9)
                        msg += f" ({rate:.1f} step/s, eta {eta:.0f}s)"
                    print(msg, end="", file=sys.stderr, flush=True)
        final_fn = self._cached_jit(
            ("repaint_final", known.shape, jump_length, mesh), make_final
        )
        x = final_fn(
            self.variables, known, mask, x, key, ts[num_steps - 1], ts[num_steps]
        )
        if show:
            print(f"\rrepaint {num_steps}/{num_steps} steps", file=sys.stderr)
        return x

    def loss(self, x_0: jnp.ndarray, key, data_format: str = "NHWC") -> jnp.ndarray:
        if data_format == "NCHW":
            x_0 = jnp.transpose(x_0, (0, 2, 3, 1))
        return self.diffusion.loss(self.variables, x_0, key)


def setup_model(
    ckpt, ema: bool = True, dtype: Any = None, width_merge_l1: bool = False
) -> tuple[DDPM, LiDARUtility, config_lib.Config]:
    """Rebuild (ddpm, lidar_utils, cfg) from a checkpoint.

    ``ckpt`` may be: a path to a reference torch ``.pth`` (imported through
    utils/torch_import.py), a path to one of our native checkpoints
    (checkpoint.py), or an already-loaded dict in the reference layout
    {cfg, weights, ema_weights, ...} (reference utils/inference.py:16-114).
    ``width_merge_l1``: small-batch latency layout, see build_model.
    """
    if isinstance(ckpt, (str, os.PathLike)):
        path = str(ckpt)
        if path.endswith((".pth", ".pt", ".ckpt")):
            from .utils.torch_import import load_torch_checkpoint

            ckpt = load_torch_checkpoint(path)
        else:
            from .checkpoint import load_checkpoint

            return setup_model(
                load_checkpoint(path), ema=ema, dtype=dtype,
                width_merge_l1=width_merge_l1,
            )

    cfg = config_lib.from_dict(ckpt["cfg"]) if isinstance(ckpt.get("cfg"), dict) else ckpt["cfg"]
    model = build_model(cfg, dtype=dtype, width_merge_l1=width_merge_l1)

    weights = ckpt.get("ema_weights" if ema else "weights") or ckpt.get("weights")
    if isinstance(weights, dict) and any(
        isinstance(v, np.ndarray) for v in weights.values()
    ):
        # flat reference state_dict -> flax trees. EMA state_dicts from
        # ema_pytorch carry online_model./ema_model. prefixes; pick EMA.
        from .utils.torch_import import (
            refinenet_variables_from_reference,
            variables_from_reference,
        )

        flat = {
            (k[len("ema_model."):] if k.startswith("ema_model.") else k): v
            for k, v in weights.items()
            if not k.startswith(("online_model.", "initted", "step"))
        }
        convert = (
            refinenet_variables_from_reference
            if cfg.model.architecture == "refinenet"
            else variables_from_reference
        )
        variables = convert(flat)
    else:
        variables = jax.tree.map(jnp.asarray, weights)

    diffusion = build_diffusion(cfg, model)
    ddpm = DDPM(diffusion, variables, cfg)

    ray_angles = ddpm.coords
    lidar_utils = LiDARUtility(
        resolution=tuple(cfg.data.resolution),
        depth_format=cfg.data.depth_format,
        min_depth=cfg.data.min_depth,
        max_depth=cfg.data.max_depth,
        ray_angles=np.asarray(ray_angles) if ray_angles is not None else None,
        data_format="NCHW",
    )
    return ddpm, lidar_utils, cfg


# per-seed rng factory parity (reference utils/inference.py:113-114 returns
# a list of torch.Generators; ours returns a batch of PRNG keys)
setup_rng = key_batch_from_seeds


PRETRAINED_CONFIGS = (
    # published reference checkpoints (hubconf.py:12-21)
    "r2dm-h-kitti360-300k",
    "r2dm-h-kittiraw-300k",
)


def pretrained_r2dm(
    config: str = "r2dm-h-kitti360-300k",
    ckpt_path: Optional[str] = None,
    ema: bool = True,
    dtype: Any = None,
    width_merge_l1: bool = False,
) -> tuple[DDPM, LiDARUtility, config_lib.Config]:
    """The hub entry point (reference hubconf.py:21-37).

    Resolution order for ``config`` (reference hubconf.py:17-18,34-35 uses
    ``load_state_dict_from_url``): an explicit ``ckpt_path`` wins; else
    ``$R2DM_CKPT_DIR/<config>.pth``; else a cached download of the release
    URL into ``$R2DM_CACHE_DIR`` (default ``~/.cache/r2dm_tpu``). Under zero
    egress the download step degrades to an actionable error.
    ``width_merge_l1`` enables the small-batch latency layout (see
    build_model); ``dtype=jnp.bfloat16`` the TPU compute policy.
    """
    if ckpt_path is None:
        ckpt_path = resolve_pretrained_ckpt(config)
    return setup_model(
        ckpt_path, ema=ema, dtype=dtype, width_merge_l1=width_merge_l1
    )


# Release URL scheme (reference hubconf.py:17-18). $R2DM_WEIGHTS_URL_BASE
# overrides the base for mirrors/tests (file:// URLs work).
_R2DM_WEIGHTS_URL_BASE = (
    "https://github.com/kazuto1011/r2dm/releases/download/weights"
)


def resolve_pretrained_ckpt(config: str, progress: bool = True) -> str:
    """Resolve a config name to a local ``.pth`` path (download if needed).

    The torch.hub-equivalent of the reference's by-name weight resolution
    (hubconf.py:34-35): look in ``$R2DM_CKPT_DIR``, then in the download
    cache, then fetch ``<base>/<config>.pth`` atomically into the cache.
    Raises ``FileNotFoundError`` with both remedies when the file is absent
    and the fetch fails (e.g. zero egress).
    """
    ckpt_dir = os.environ.get("R2DM_CKPT_DIR", "")
    if ckpt_dir:
        candidate = os.path.join(ckpt_dir, f"{config}.pth")
        if os.path.exists(candidate):
            return candidate
    cache_dir = os.environ.get(
        "R2DM_CACHE_DIR", os.path.expanduser("~/.cache/r2dm_tpu")
    )
    cached = os.path.join(cache_dir, "checkpoints", f"{config}.pth")
    if os.path.exists(cached):
        return cached
    base = os.environ.get("R2DM_WEIGHTS_URL_BASE", _R2DM_WEIGHTS_URL_BASE)
    url = f"{base}/{config}.pth"
    import urllib.error
    import urllib.request

    os.makedirs(os.path.dirname(cached), exist_ok=True)
    tmp = cached + ".tmp"
    try:
        if progress:
            print(f"downloading {url} -> {cached}")
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, cached)  # atomic: no torn file on interrupt
        return cached
    except (urllib.error.URLError, OSError, ValueError) as e:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise FileNotFoundError(
            f"checkpoint for '{config}' not found locally and the download "
            f"from {url} failed ({e}); download it manually from "
            "https://github.com/kazuto1011/r2dm/releases and pass "
            "ckpt_path= or set $R2DM_CKPT_DIR"
        ) from e
