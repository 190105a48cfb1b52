"""Mass sampling for evaluation: generate N scans and save postprocessed
tensors (depth, xyz, reflectance) per seed.

TPU counterpart of the reference sample_and_save.py: the accelerate
multi-rank seed sharding (:25-46) becomes process-index striding; per-seed
determinism uses batched PRNG keys (⇔ per-seed torch.Generators, :71-77).
Sampling goes through ``DDPM.sample`` so large chains are auto-chunked into
segment dispatches (a single multi-minute dispatch can trip tunneled-TPU
watchdogs — see inference.AUTO_CHUNK_WORK); postprocess is a second small
compiled program. Outputs are .npz files (5, H, W)
[depth, x, y, z, reflectance] compatible with evaluate.py (which also reads
the reference's .pth layout).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from r2dm_tpu.inference import setup_model


def main(args):
    if os.environ.get("R2DM_TPU_INT8"):
        # quality-harness hook for the W8A8 serving lane (ops/quant.py):
        # lets tools/ddim_quality_check.sh A/B int8 vs bf16 on same seeds
        from r2dm_tpu.models import layers

        layers.QUANT_CONV = "w8a8"
    # single-process multi-chip: the batch shards over the mesh inside
    # DDPM.sample (aggregate img/s scales with chips); combine with process
    # striding below for multi-host pods
    from r2dm_tpu.parallel import parse_mesh

    mesh = parse_mesh(getattr(args, "mesh", 0))
    n_data = mesh.shape["data"] if mesh is not None else 1
    ddpm, lidar_utils, cfg = setup_model(
        args.ckpt, dtype=jnp.bfloat16 if getattr(args, "bf16", False) else None
    )
    lidar_utils.data_format = "NHWC"
    save_dir = Path(args.output_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    @jax.jit
    def postprocess(x):
        x = jnp.clip(x, -1, 1)
        x = lidar_utils.denormalize(x)
        depth = lidar_utils.revert_depth(x[..., 0:1])
        xyz = lidar_utils.to_xyz(depth)
        rflct = x[..., 1:2]
        # (B, H, W, 5) -> (B, 5, H, W) reference sample layout (:52-57)
        out = jnp.concatenate([depth, xyz, rflct], axis=-1)
        return jnp.transpose(out, (0, 3, 1, 2))

    seeds = np.arange(args.num_samples)
    # shard seeds across hosts (⇔ accelerate split_batches, :37-46)
    seeds = seeds[jax.process_index():: jax.process_count()]
    for lo in range(0, len(seeds), args.batch_size):
        batch_seeds = seeds[lo : lo + args.batch_size]
        n = len(batch_seeds)
        run_seeds = batch_seeds
        if mesh is not None and n % n_data:
            # data-axis-divisible tail batch: samples are per-seed
            # deterministic, so pad with throwaway seeds, discard outputs
            pad = n_data - n % n_data
            run_seeds = np.concatenate(
                [batch_seeds, batch_seeds[-1] + 1 + np.arange(pad)]
            )
        # DDPM.sample applies the AUTO_CHUNK_WORK segment guard (per-seed
        # keys = key_batch_from_seeds, same stream as before)
        x = ddpm.sample(
            batch_size=len(run_seeds),
            num_steps=args.num_steps,
            seeds=run_seeds.tolist(),
            mode=args.mode,
            data_format="NHWC",
            mesh=mesh,
        )
        samples = np.asarray(postprocess(x))[:n]
        for seed, sample in zip(batch_seeds, samples):
            np.savez_compressed(
                save_dir / f"samples_{seed:010d}.npz", sample=sample
            )
        print(f"[{lo + len(batch_seeds)}/{len(seeds)}] saved", flush=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_samples", type=int, default=10_000)
    parser.add_argument("--num_steps", type=int, default=256)
    parser.add_argument("--mode", choices=["ddpm", "ddim", "dpmpp_2m", "euler", "midpoint"], default="ddpm")
    parser.add_argument(
        "--bf16", action="store_true",
        help="bf16 network compute (TPU fast path; schedule math stays fp32)",
    )
    parser.add_argument(
        "--mesh", type=str, default="",
        help="shard each sampling batch over 'N' data devices or a 'DxW' "
        "(data, width) mesh (single-process multi-chip; combine with "
        "process striding for pods)",
    )
    main(parser.parse_args())
