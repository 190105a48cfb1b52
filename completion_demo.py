"""RePaint completion demo: corrupt a test scan 4 ways, complete with the
diffusion model, semantically segment the results, render a figure.

TPU counterpart of the reference completion_demo.py: masks
(full / 25% beams / random 50% beams / random 10% points,
reference :78-88), scan-compiled ``repaint`` (one XLA program for the whole
T x r x j schedule), optional RangeNet-53 semantic segmentation of the
completed scans (needs --rangenet_tar; skipped otherwise).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from r2dm_tpu import render as render_lib
from r2dm_tpu.data import make_dataset, nearest_exact_resize_jnp
from r2dm_tpu.inference import setup_model
from r2dm_tpu.metrics.extractor import rangenet as rn


def apply_few_step_preset(args):
    """--few_step: the measured 253 ms/scan interactive config at config-H/b1
    (flow checkpoint, 8x4x1 RePaint grid, bf16 serving dtype, W2C latency
    layout — quality/probe_completion_20260819_flow_b1.jsonl). Only fills
    values the user left at their CLI defaults."""
    if args.num_steps == 32:
        args.num_steps = 8
    if args.num_resample_steps == 16:
        args.num_resample_steps = 4
    args.bf16 = True
    args.latency_layout = True
    return args


def main(args):
    if getattr(args, "few_step", False):
        apply_few_step_preset(args)
    ddpm, lidar_utils, cfg = setup_model(
        args.ckpt,
        dtype=jnp.bfloat16 if getattr(args, "bf16", False) else None,
        width_merge_l1=getattr(args, "latency_layout", False),
    )
    lidar_utils.data_format = "NHWC"
    H, W = cfg.data.resolution

    # ----------------------------------------------------------- test scan
    dataset = make_dataset(
        cfg.data.dataset, args.data_root or cfg.data.data_root, "test",
        cfg.data.projection,
    )
    rng = np.random.default_rng(args.seed)
    sample_id = args.sample_id if args.sample_id >= 0 else int(
        rng.integers(0, len(dataset))
    )
    print(f"sample id: {sample_id}")
    planes = jnp.asarray(dataset.planes(sample_id))[None]  # (1, Hd, Wd, 6)
    depth = lidar_utils.normalize(lidar_utils.convert_depth(planes[..., 4:5]))
    rflct = lidar_utils.normalize(planes[..., 3:4])
    rydrp = planes[..., 5:6]
    x_orig = jnp.concatenate([depth, rflct], axis=-1)
    x_orig = rydrp * x_orig + (1 - rydrp) * -1.0
    x_orig = nearest_exact_resize_jnp(x_orig, (H, W))

    # ------------------------------------------------- simulate corruptions
    batch_size = 4
    mask = np.zeros((batch_size, H, W, 2), np.float32)
    mask[0] = 1.0
    mask[1, ::4] = 1.0  # 25% beams
    mask[2] = (rng.uniform(size=(H, 1, 1)) < 0.5).astype(np.float32)
    mask[3] = (rng.uniform(size=(H, W, 1)) < 0.1).astype(np.float32)
    mask = jnp.asarray(mask)
    x_in = mask * x_orig + (1 - mask) * -1.0

    # ------------------------------------------------------------ completion
    # completion is the latency-sensitive interactive path: 'DxW' meshes
    # shard the azimuth axis too (DDPM.repaint semantics)
    from r2dm_tpu.parallel import parse_mesh

    mesh = parse_mesh(getattr(args, "mesh", ""), batch_size=batch_size)
    x_out = ddpm.repaint(
        known=x_in,
        mask=mask,
        num_steps=args.num_steps,
        num_resample_steps=args.num_resample_steps,
        jump_length=args.jump_length,
        seeds=list(range(batch_size)),
        data_format="NHWC",
        mesh=mesh,
    )
    x_out = jnp.clip(x_out, -1, 1)

    # ------------------------------------------- semantic segmentation (opt)
    labels = None
    if args.rangenet_tar:
        semseg, variables, preprocess = rn.rangenet53(args.rangenet_tar)
        x = lidar_utils.denormalize(x_out)
        d = lidar_utils.revert_depth(x[..., 0:1])
        m = ((d > lidar_utils.min_depth) & (d < lidar_utils.max_depth)).astype(
            jnp.float32
        )
        xyz = lidar_utils.to_xyz(d)
        inputs = preprocess(
            jnp.concatenate([d, xyz, x[..., 1:2]], axis=-1), m
        )
        logits = semseg.apply(variables, inputs)
        labels = jnp.argmax(logits, axis=-1)  # (B, H, W)

    # ---------------------------------------------------------------- figure
    from matplotlib import cm
    import matplotlib.pyplot as plt

    def to_img(x):
        img = lidar_utils.denormalize(x)
        d = lidar_utils.revert_depth(img[..., 0:1]) / lidar_utils.max_depth
        return np.clip(np.asarray(jnp.concatenate([d, img[..., 1:]], -1)), 0, 1)

    def to_bev(x, colors=None):
        R, t = render_lib.make_Rt(pitch=np.pi / 4, yaw=np.pi / 4, z=0.6)
        d = lidar_utils.revert_depth(lidar_utils.denormalize(x)[..., 0:1])
        xyz = lidar_utils.to_xyz(d) / lidar_utils.max_depth
        if colors is None:
            z_min = -2 / lidar_utils.max_depth
            z_max = 0.5 / lidar_utils.max_depth
            z = jnp.clip((xyz[..., 2] - z_min) / (z_max - z_min), 0, 1)
            lut = np.asarray(cm.viridis(np.linspace(0, 1, 256))[:, :3], np.float32)
            colors = render_lib.colorize(z, lut).astype(jnp.float32) / 255.0
        B = xyz.shape[0]
        bev = 1 - render_lib.render_point_clouds(
            points=xyz.reshape(B, -1, 3),
            colors=1 - colors.reshape(B, -1, 3),
            R=R,
            t=t,
        )
        return np.clip(np.asarray(bev), 0, 1)

    img_in, img_out = to_img(x_in), to_img(x_out)
    bev_in, bev_out = to_bev(x_in), None
    if labels is not None:
        cmap = rn.make_semantickitti_cmap()
        lut = np.asarray(cmap(np.linspace(0, 1, 256))[:, :3], np.float32)
        colors = render_lib.colorize(labels / 19.0, lut).astype(jnp.float32) / 255.0
        bev_out = to_bev(x_out, colors)
        img_cls = np.asarray(colors)
    else:
        bev_out = to_bev(x_out)
        img_cls = None

    nrows = 5 if labels is not None else 4
    fig, ax = plt.subplots(nrows=nrows, ncols=batch_size, figsize=(13, 9),
                           constrained_layout=True)
    titles = ["full", "25% beams", "random 50% beams", "random 10% points"]
    for i in range(batch_size):
        ax[0][i].imshow(
            np.concatenate([img_in[i, :, :, c] for c in range(2)], axis=0),
            cmap="turbo", vmin=0, vmax=1, interpolation="none",
        )
        ax[0][i].set_title(titles[i])
        ax[1][i].imshow(bev_in[i], interpolation="none")
        ax[2][i].imshow(
            np.concatenate([img_out[i, :, :, c] for c in range(2)], axis=0),
            cmap="turbo", vmin=0, vmax=1, interpolation="none",
        )
        row = 3
        if img_cls is not None:
            ax[3][i].imshow(img_cls[i], interpolation="none")
            row = 4
        ax[row][i].imshow(bev_out[i], interpolation="none")
    for a in ax.flatten():
        a.set_xticks([])
        a.set_yticks([])
    save_path = (
        f"completion_T-{args.num_steps:04d}_r-{args.num_resample_steps:04d}"
        f"_j-{args.jump_length:04d}.png"
    )
    plt.savefig(save_path, bbox_inches="tight", dpi=150)
    print(f'saved to "{save_path}"')


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument(
        "--num_steps", type=int, default=32,
        help="RePaint outer steps (default mirrors the reference; flow "
        "checkpoints complete well at 8x4x1 — ~16x faster, measured "
        "253 ms/scan at config-H b1 bf16+W2C, see quality/QUALITY.md)",
    )
    parser.add_argument("--num_resample_steps", type=int, default=16)
    parser.add_argument("--jump_length", type=int, default=1)
    parser.add_argument(
        "--few_step", action="store_true",
        help="interactive preset: 8x4x1 RePaint grid + --bf16 "
        "--latency_layout (the measured 253 ms/scan config at config-H "
        "b1 on a flow checkpoint; ~16x fewer net calls than the reference "
        "default 32x16x1 grid, completion_demo.py:92-99)",
    )
    parser.add_argument(
        "--bf16", action="store_true",
        help="bf16 network compute (TPU fast path; schedule math stays fp32)",
    )
    parser.add_argument(
        "--latency_layout", action="store_true",
        help="W2C width-pair-merged level-1 layout (small-batch latency lane)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--sample_id", type=int, default=-1)
    parser.add_argument("--rangenet_tar", type=str, default=None)
    parser.add_argument(
        "--mesh", type=str, default="",
        help="'N' data mesh or 'DxW' (data, width) mesh for the repaint "
        "(width sharding = multi-chip latency lane)",
    )
    main(parser.parse_args())
