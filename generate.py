"""Generate LiDAR scans from a trained model and render previews.

TPU counterpart of the reference generate.py: loads a checkpoint (ours or a
reference .pth), runs the scan-compiled sampler, and writes range-image +
BEV panels (and optionally an mp4 of the whole reverse process when imageio
is available).

Usage: python generate.py --ckpt logs/diffusion/checkpoint.msgpack
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from r2dm_tpu import render as render_lib
from r2dm_tpu.inference import setup_model


def render_panels(x, lidar_utils):
    """x: (B, H, W, C) in [0, 1] with x[..., 0] = metric depth / max_depth.
    Returns (range-image rgb, bev rgb) uint8 (reference generate.py:44-59)."""
    from matplotlib import cm

    B, H, W, C = x.shape
    img = render_lib.colorize(
        x.transpose(0, 3, 1, 2).reshape(B, C * H, W)
    )  # stack channels vertically like the reference grid
    xyz = lidar_utils.to_xyz(x[..., 0:1] * lidar_utils.max_depth)
    xyz = xyz / lidar_utils.max_depth
    z_min, z_max = -2 / lidar_utils.max_depth, 0.5 / lidar_utils.max_depth
    z = jnp.clip((xyz[..., 2] - z_min) / (z_max - z_min), 0, 1)
    lut = np.asarray(cm.viridis(np.linspace(0, 1, 256))[:, :3], np.float32)
    colors = render_lib.colorize(z, lut).astype(jnp.float32) / 255.0
    R, t = render_lib.make_Rt(pitch=np.pi / 3, yaw=np.pi / 4, z=0.8)
    bev = 1.0 - render_lib.render_point_clouds(
        points=xyz.reshape(B, H * W, 3),
        colors=1.0 - colors.reshape(B, H * W, 3),
        R=R,
        t=t,
    )
    bev = np.clip(np.asarray(bev) * 255, 0, 255).astype(np.uint8)
    return np.asarray(img), bev


def main(args):
    # optional serving knobs default off so programmatic callers (tests)
    # can pass a bare Namespace with just the required fields
    if getattr(args, "int8", False):
        from r2dm_tpu.models import layers

        layers.QUANT_CONV = "w8a8"
    ddpm, lidar_utils, cfg = setup_model(
        args.ckpt,
        dtype=jnp.bfloat16 if getattr(args, "bf16", False) else None,
        width_merge_l1=getattr(args, "latency_layout", False),
    )
    # NHWC internally; per-sample seeds for reproducibility
    xs = ddpm.sample(
        batch_size=args.batch_size,
        num_steps=args.sampling_steps,
        mode=args.mode,
        seeds=list(range(args.seed, args.seed + args.batch_size)),
        return_all=args.video,
        data_format="NHWC",
        progress=True,  # per-step feedback (reference tqdm UX)
    )
    xs = jnp.clip(xs, -1, 1)
    lidar_utils.data_format = "NHWC"

    def to_unit(x):
        x = lidar_utils.denormalize(x)
        depth = lidar_utils.revert_depth(x[..., 0:1]) / lidar_utils.max_depth
        return jnp.concatenate([depth, x[..., 1:]], axis=-1)

    final = to_unit(xs[-1] if args.video else xs)
    img, bev = render_panels(final, lidar_utils)
    import matplotlib.image

    matplotlib.image.imsave("samples_img.png", np.concatenate(list(img), axis=0))
    matplotlib.image.imsave(
        "samples_bev.png",
        np.concatenate(list(bev), axis=1) if args.batch_size > 1 else bev[0],
    )
    print("wrote samples_img.png, samples_bev.png")

    if args.video:
        try:
            import imageio

            writer = imageio.get_writer("samples.mp4", mode="I", fps=60)
        except Exception as e:  # noqa: BLE001 — imageio missing OR no ffmpeg backend
            # fallback: a PNG frame sequence (assemble offline with
            # `ffmpeg -r 60 -i samples_frames/frame_%04d.png samples.mp4`)
            print(
                f"video backend unavailable ({type(e).__name__}); writing a "
                "PNG frame sequence instead (pip install imageio "
                "imageio-ffmpeg for samples.mp4)"
            )
            writer = None
        # bound the fallback's file count: at most ~128 evenly-spaced frames
        stride = 1 if writer is not None else max(1, len(xs) // 128)
        if writer is None:
            import os

            os.makedirs("samples_frames", exist_ok=True)
        n_written = 0
        for i, x in enumerate(np.asarray(xs)):
            if writer is None and i % stride and i != len(xs) - 1:
                continue
            img, bev = render_panels(to_unit(jnp.asarray(x)), lidar_utils)
            frame = np.concatenate(list(img), axis=1)  # range-image strip
            if writer is not None:
                writer.append_data(frame)
            else:
                matplotlib.image.imsave(
                    f"samples_frames/frame_{n_written:04d}.png", frame
                )
            n_written += 1
        if writer is not None:
            writer.close()
            print("wrote samples.mp4")
        else:
            print(
                f"wrote {n_written} frames to samples_frames/ "
                "(ffmpeg -r 60 -i samples_frames/frame_%04d.png samples.mp4)"
            )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--mode", choices=["ddpm", "ddim", "dpmpp_2m", "euler", "midpoint"], default="ddpm")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--sampling_steps", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--video", action="store_true")
    parser.add_argument(
        "--bf16", action="store_true",
        help="bf16 network compute (TPU fast path; schedule math stays fp32)",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="W8A8 int8 ring convs on the MXU 2x-peak int8 path "
        "(serving-only experiment; ops/quant.py)",
    )
    parser.add_argument(
        "--latency_layout", action="store_true",
        help="width-pair-merged level 1 (W2C): +19%% at small batch "
        "(serving latency lane; see CLAUDE.md perf notes)",
    )
    main(parser.parse_args())
