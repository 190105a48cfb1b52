"""Evaluate generated samples against the real dataset: FRD / FPD /
feature-MMD + BEV JSD/MMD.

TPU counterpart of the reference evaluate.py: same protocol — lidargen
depth gate (0.5, 63) m, RangeNet-53 "lidargen" 4096-d features (FRD),
PointNet 1808-d features (FPD), 160 m / 100-bin BEV histograms — with the
feature extraction jit-compiled and batched on device. The real-set pass is
cached to a pickle like the reference (:92-127).

Pretrained extractor weights cannot be downloaded here (zero egress):
  --rangenet_tar  : official bonnetal darknet53 tar.gz (reference
                    rangenet.py:532-545 URLs)
  --pointnet_ckpt : SpareNet cls_model_39.pth (reference pointnet.py:83-98)
Pass --allow_random_extractors to smoke-test the pipeline without weights
(metrics are then NOT comparable to published numbers).
"""

from __future__ import annotations

import argparse
import datetime
import hashlib
import os
import json
import pickle
import random
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from r2dm_tpu.data import make_dataset
from r2dm_tpu.inference import setup_model
from r2dm_tpu.metrics import bev, distribution
from r2dm_tpu.metrics.extractor import pointnet as pn
from r2dm_tpu.metrics.extractor import rangenet as rn

# lidargen constants (reference evaluate.py:21-23)
MAX_DEPTH = 63.0
MIN_DEPTH = 0.5
DATASET_MAX_DEPTH = 80.0


def load_sample(path: Path) -> np.ndarray:
    """(5, H, W) [depth, x, y, z, reflectance]; ours (.npz) or the
    reference's torch (.pth) layout."""
    if path.suffix == ".npz":
        return np.load(path)["sample"]
    import torch

    return torch.load(path, map_location="cpu", weights_only=False).numpy()


def build_extractors(args, resolution, mesh=None):
    H, W = resolution
    if args.rangenet_tar:
        model_img, vars_img, pre = rn.rangenet53(args.rangenet_tar)
    elif args.allow_random_extractors:
        model_img = rn.RangeNet(in_channels=5, num_classes=20, backbone=53)
        vars_img = jax.jit(model_img.init)(
            jax.random.key(0), jnp.zeros((1, H, W, 5))
        )
        pre = partial(rn.preprocess)
    else:
        raise SystemExit(
            "need --rangenet_tar (official darknet53 tar.gz) or "
            "--allow_random_extractors"
        )
    if args.pointnet_ckpt:
        model_pts, vars_pts, _ = pn.pretrained_pointnet(args.pointnet_ckpt)
    elif args.allow_random_extractors:
        model_pts = pn.PointNet1(k=16)
        vars_pts = jax.jit(model_pts.init)(
            jax.random.key(1), jnp.zeros((1, 16, 3))
        )
    else:
        raise SystemExit("need --pointnet_ckpt or --allow_random_extractors")

    def extract(imgs_frd, mask):
        """imgs_frd (B, H, W, 5), mask (B, H, W, 1) ->
        (img_feats, pts_feats, bev_hists)."""
        feats_img = model_img.apply(
            vars_img, pre(imgs_frd, mask), feature="lidargen"
        )
        xyz = imgs_frd[..., 1:4] * mask
        B = xyz.shape[0]
        clouds = xyz.reshape(B, -1, 3)
        feats_pts = model_pts.apply(vars_pts, clouds / DATASET_MAX_DEPTH)
        hists = jax.vmap(bev.point_cloud_to_histogram)(clouds)
        return feats_img, feats_pts, hists

    if mesh is not None:
        # data-parallel extraction: batch sharded over the mesh's 'data'
        # axis (extractor weights replicate; per-sample features are
        # embarrassingly parallel, so XLA inserts no cross-chip collectives
        # in the hot path) — the serving-side eval counterpart of the
        # trainer's DP. Callers pad chunks to a fixed batch size.
        from jax.sharding import NamedSharding, PartitionSpec as P

        s_in = NamedSharding(mesh, P("data", None, None, None))
        return jax.jit(
            extract,
            in_shardings=(s_in, s_in),
            out_shardings=NamedSharding(mesh, P("data")),
        )
    return jax.jit(extract)


def gated(depth):
    return ((depth > MIN_DEPTH) & (depth < MAX_DEPTH)).astype(np.float32)


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    """Pad the batch dim to ``n`` by repeating the last row — keeps every
    dispatch at one fixed shape (one XLA program; mesh-divisible)."""
    if len(a) == n:
        return a
    return np.concatenate([a, np.repeat(a[-1:], n - len(a), axis=0)], axis=0)


def main(args):
    from r2dm_tpu.parallel import parse_mesh

    mesh = parse_mesh(getattr(args, "mesh", 0), batch_size=args.batch_size)
    _, lidar_utils, cfg = setup_model(args.ckpt)
    H, W = lidar_utils.resolution
    extract = build_extractors(args, (H, W), mesh=mesh)

    results = {"img": {}, "pts": {}, "bev": {}, "info": {}}
    results["info"]["phase"] = args.dataset
    results["info"]["directory"] = args.sample_dir

    # ------------------------------------------------------------- real set
    # the cache key must include the extractor identity: features from
    # random-weight extractors must never be reused against pretrained ones
    def _ident(path, fallback):
        if not path:
            return fallback
        digest = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:8]
        return f"{os.path.basename(path)}.{digest}"

    ext_tag = (
        f"{_ident(args.rangenet_tar, 'randomRN')}-"
        f"{_ident(args.pointnet_ckpt, 'randomPN')}"
    )
    ds_tag = cfg.data.dataset
    if ds_tag == "synthetic" and os.environ.get("R2DM_SYNTH_SCANS", "64") != "64":
        # non-default synthetic sizes get their own real-set cache — the
        # default-named pkl holds 64-scan features and must not be reused
        ds_tag += f"-{int(os.environ['R2DM_SYNTH_SCANS'])}"
    cache = Path(
        f"real_set_{ds_tag}_{cfg.data.projection}_{H}x{W}_"
        f"{args.dataset}_{ext_tag}.pkl"
    )
    if cache.exists():
        print(f"found cached {cache}")
        real = pickle.load(open(cache, "rb"))
    else:
        dataset = make_dataset(
            cfg.data.dataset, args.data_root or cfg.data.data_root,
            args.dataset, cfg.data.projection,
        )
        real = {"img_feats": [], "pts_feats": [], "bev_hists": []}
        for lo in range(0, len(dataset), args.batch_size):
            planes = np.stack(
                [dataset.planes(i) for i in range(lo, min(lo + args.batch_size, len(dataset)))]
            )  # (B, Hd, Wd, 6) [x,y,z,refl,depth,mask]
            from r2dm_tpu.data.loader import nearest_exact_resize_jnp

            planes = np.asarray(
                nearest_exact_resize_jnp(jnp.asarray(planes), (H, W))
            )
            depth = planes[..., 4:5]
            mask = planes[..., 5:6] * gated(depth)
            imgs_frd = np.concatenate(
                [depth, planes[..., 0:3], planes[..., 3:4]], axis=-1
            )
            n = len(imgs_frd)
            fi, fp, hists = extract(
                jnp.asarray(_pad_rows(imgs_frd, args.batch_size)),
                jnp.asarray(_pad_rows(mask, args.batch_size)),
            )
            real["img_feats"].append(np.asarray(fi)[:n])
            real["pts_feats"].append(np.asarray(fp)[:n])
            real["bev_hists"].append(np.asarray(hists)[:n])
            print(f"real [{lo + n}/{len(dataset)}]", flush=True)
        real = {k: np.concatenate(v, axis=0) for k, v in real.items()}
        pickle.dump(real, open(cache, "wb"))
    results["info"]["#real"] = len(real["pts_feats"])

    # -------------------------------------------------------------- gen set
    paths = sorted(Path(args.sample_dir).glob("*.npz")) or sorted(
        Path(args.sample_dir).glob("*.pth")
    )
    paths = paths[:10_000]
    gen = {"img_feats": [], "pts_feats": [], "bev_hists": []}
    for lo in range(0, len(paths), args.batch_size):
        imgs = np.stack([load_sample(p) for p in paths[lo : lo + args.batch_size]])
        imgs = np.transpose(imgs, (0, 2, 3, 1))  # (B, H, W, 5)
        mask = gated(imgs[..., 0:1])
        imgs = imgs * mask
        n = len(imgs)
        fi, fp, hists = extract(
            jnp.asarray(_pad_rows(imgs, args.batch_size)),
            jnp.asarray(_pad_rows(mask, args.batch_size)),
        )
        gen["img_feats"].append(np.asarray(fi)[:n])
        gen["pts_feats"].append(np.asarray(fp)[:n])
        gen["bev_hists"].append(np.asarray(hists)[:n])
        print(f"gen [{lo + n}/{len(paths)}]", flush=True)
    gen = {k: np.concatenate(v, axis=0) for k, v in gen.items()}
    results["info"]["#fake"] = len(gen["pts_feats"])

    # -------------------------------------------------------------- metrics
    if cfg.data.train_reflectance:
        results["img"]["frechet_distance"] = distribution.compute_frechet_distance(
            real["img_feats"], gen["img_feats"]
        )
        results["img"]["squared_mmd"] = distribution.compute_squared_mmd(
            real["img_feats"], gen["img_feats"]
        )
    results["pts"]["frechet_distance"] = distribution.compute_frechet_distance(
        real["pts_feats"], gen["pts_feats"]
    )
    results["pts"]["squared_mmd"] = distribution.compute_squared_mmd(
        real["pts_feats"], gen["pts_feats"]
    )
    # fixed-seed subsample of real hists (reference evaluate.py:188-191)
    perm = list(range(len(real["bev_hists"])))
    random.Random(0).shuffle(perm)
    perm = perm[:10_000]
    results["bev"]["jsd"] = bev.compute_jsd_2d(
        jnp.asarray(real["bev_hists"][perm]), jnp.asarray(gen["bev_hists"])
    )
    results["bev"]["mmd"] = bev.compute_mmd_2d(
        jnp.asarray(real["bev_hists"][perm]), jnp.asarray(gen["bev_hists"])
    )

    print(json.dumps(results, indent=2))
    stamp = datetime.datetime.now().strftime("%Y%m%dT%H%M%S")
    save_path = args.sample_dir.rstrip("/") + f"_{stamp}.json"
    with open(save_path, "w") as f:
        json.dump(results, f, indent=4)
    print("wrote", save_path)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--sample_dir", type=str, required=True)
    parser.add_argument("--dataset", choices=["train", "test", "all"], default="all")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--rangenet_tar", type=str, default=None)
    parser.add_argument("--pointnet_ckpt", type=str, default=None)
    parser.add_argument("--allow_random_extractors", action="store_true")
    parser.add_argument(
        "--mesh", type=str, default="",
        help="shard feature extraction over an N-device 'data' mesh "
        "(batch_size must be divisible by N)",
    )
    main(parser.parse_args())
