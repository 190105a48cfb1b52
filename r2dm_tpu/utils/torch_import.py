"""Torch checkpoint import shim.

Converts reference (kazuto1011/r2dm) torch ``state_dict``s into our flax
variable trees so published checkpoints (e.g. ``r2dm-h-kitti360-300k``,
hubconf.py:17-21) load for parity testing and inference.

Key conventions translated (reference module names -> our flax tree):
  model.time_embedding.{1,3}          -> time_embedding.dense{1,2}
  model.in_conv / out_conv            -> in_conv.conv / out_conv.conv
  model.{d,u}_blockN.downsample.0     -> {d,u}_blockN.down_conv.conv
  model.{d,u}_blockN.residual_blocks.i-> {d,u}_blockN.res{i}.*
  model.*.self_attn_block.attn        -> *.attn.attn (packed qkv)
  model.{d,u}_blockN.upsample.1       -> {d,u}_blockN.up_conv.conv
  model.coords (1,2,H,W)              -> buffers coords (H,W,2)
Weight layout: torch conv OIHW -> HWIO; linear (O,I) -> (I,O).

Dropped keys: registered constants the reference stores as buffers but we
recompute (resample FIR kernels, residual ``scale``, ``_dummy``, discrete
beta tables).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

_DROP = re.compile(
    r"(\.scale$|^_dummy$|^beta$|^alpha_bar$|^alpha_bar_prev$|^snr$"
    r"|downsample\.1\.kernel$|upsample\.0\.kernel$|\.initted$|\.step$"
    r"|coords_encoding\.(freqs|phase)$)"
)


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv(sd_w: np.ndarray) -> np.ndarray:
    return np.transpose(sd_w, (2, 3, 1, 0))  # OIHW -> HWIO


def _lin(sd_w: np.ndarray) -> np.ndarray:
    return np.transpose(sd_w, (1, 0))  # (O,I) -> (I,O)


def convert_unet_state_dict(
    sd: Mapping[str, np.ndarray],
) -> tuple[dict, dict]:
    """Reference EfficientUNet state_dict -> (params, buffers) flax trees.

    Accepts keys with or without the ``model.`` prefix used by the diffusion
    wrapper's state_dict (train.py:294-304).
    """
    params: dict = {}
    buffers: dict = {}
    pending_qkv: dict[str, dict[str, np.ndarray]] = {}

    for key, raw in sd.items():
        k = key[6:] if key.startswith("model.") else key
        if _DROP.search(k):
            continue
        v = np.asarray(raw, dtype=np.float32)

        if k == "coords":
            buffers["coords"] = np.transpose(v[0], (1, 2, 0))  # (1,2,H,W)->(H,W,2)
            continue

        m = re.match(r"time_embedding\.(\d)\.(weight|bias)", k)
        if m:
            dense = {"1": "dense1", "3": "dense2"}[m.group(1)]
            if m.group(2) == "weight":
                _set(params, ["time_embedding", dense, "kernel"], _lin(v))
            else:
                _set(params, ["time_embedding", dense, "bias"], v)
            continue

        m = re.match(r"(in_conv|out_conv)\.(weight|bias)", k)
        if m:
            name, wb = m.groups()
            if wb == "weight":
                _set(params, [name, "conv", "kernel"], _conv(v))
            else:
                _set(params, [name, "conv", "bias"], v)
            continue

        m = re.match(r"([du]_block\d)\.(.*)", k)
        if m:
            block, rest = m.groups()

            mm = re.match(r"downsample\.0\.(weight|bias)", rest)
            if mm:
                leaf = "kernel" if mm.group(1) == "weight" else "bias"
                val = _conv(v) if leaf == "kernel" else v
                _set(params, [block, "down_conv", "conv", leaf], val)
                continue
            mm = re.match(r"upsample\.1\.(weight|bias)", rest)
            if mm:
                leaf = "kernel" if mm.group(1) == "weight" else "bias"
                val = _conv(v) if leaf == "kernel" else v
                _set(params, [block, "up_conv", "conv", leaf], val)
                continue

            mm = re.match(
                r"residual_blocks\.(\d+)\.(norm1|norm2|conv1|conv2|skip)"
                r"(?:\.proj\.1)?\.(weight|bias)",
                rest,
            )
            if mm:
                i, sub, wb = mm.groups()
                res = f"res{i}"
                if sub in ("conv1", "conv2", "skip"):
                    leaf = "kernel" if wb == "weight" else "bias"
                    val = _conv(v) if leaf == "kernel" else v
                    _set(params, [block, res, sub, "conv", leaf], val)
                elif sub == "norm1":
                    leaf = "scale" if wb == "weight" else "bias"
                    _set(params, [block, res, "norm1", leaf], v)
                elif sub == "norm2":
                    if "proj.1" in rest:  # AdaGN projection Linear
                        leaf = "kernel" if wb == "weight" else "bias"
                        val = _lin(v) if leaf == "kernel" else v
                        _set(params, [block, res, "norm2", "proj", leaf], val)
                    else:  # plain GroupNorm (no-emb variant)
                        leaf = "scale" if wb == "weight" else "bias"
                        _set(params, [block, res, "norm2", leaf], v)
                continue

            mm = re.match(r"self_attn_block\.norm\.(weight|bias)", rest)
            if mm:
                leaf = "scale" if mm.group(1) == "weight" else "bias"
                _set(params, [block, "attn", "norm", leaf], v)
                continue

            mm = re.match(r"self_attn_block\.attn\.(.*)", rest)
            if mm:
                sub = mm.group(1)
                slot = pending_qkv.setdefault(block, {})
                if sub == "in_proj_weight":
                    slot["qkv_kernel"] = _lin(v)
                elif sub == "in_proj_bias":
                    slot["qkv_bias"] = v
                elif sub == "out_proj.weight":
                    _set(params, [block, "attn", "attn", "out_proj", "kernel"], _lin(v))
                elif sub == "out_proj.bias":
                    _set(params, [block, "attn", "attn", "out_proj", "bias"], v)
                continue

            raise KeyError(f"unhandled reference key: {key}")
        raise KeyError(f"unhandled reference key: {key}")

    for block, slot in pending_qkv.items():
        for leaf, val in slot.items():
            _set(params, [block, "attn", "attn", leaf], val)

    return params, buffers


def convert_refinenet_state_dict(
    sd: Mapping[str, np.ndarray],
) -> tuple[dict, dict]:
    """Reference LiDARGenRefineNet state_dict -> (params, buffers) flax trees.

    Name conventions translated (reference models/refinenet.py:157-212):
      in_conv / out_conv.2                -> in_conv / out_conv
      out_conv.0 (InstanceNorm2dPlus)     -> out_norm
      d_blockN.j.*                        -> d_blockN_j.*
      *.norm{1,2}.alpha/(post_affine)     -> norm{1,2}.{alpha,scale,bias}
      *.conv2.0 (conv before avgpool)     -> conv2
      u_blockN.adaptive_convs.i.0 (RCU)   -> u_blockN.adapt{i}_rcu
      u_blockN.adaptive_convs.i.1 (conv)  -> u_blockN.adapt{i}_proj
      u_blockN.crp.convs.i.1              -> u_blockN.crp.conv{i}
      u_blockN.output_conv.units.j.{1,3}  -> u_blockN.output_rcu.unit{j}_stage{k}
      coords (1,2,H,W)                    -> buffers coords (H,W,2)
    """
    params: dict = {}
    buffers: dict = {}

    def set_conv(path: list[str], wb: str, v: np.ndarray) -> None:
        leaf = "kernel" if wb == "weight" else "bias"
        _set(params, path + ["conv", leaf], _conv(v) if wb == "weight" else v)

    def set_plain_conv(path: list[str], wb: str, v: np.ndarray) -> None:
        leaf = "kernel" if wb == "weight" else "bias"
        _set(params, path + [leaf], _conv(v) if wb == "weight" else v)

    def set_inorm(path: list[str], sub: str, wb: str, v: np.ndarray) -> None:
        if sub == "alpha":
            _set(params, path + ["alpha"], v.reshape(-1))
        elif sub == "post_affine":
            leaf = "scale" if wb == "weight" else "bias"
            _set(params, path + [leaf], v.reshape(-1))

    def rcu_leaf(rest: str) -> tuple[int, int] | None:
        m = re.match(r"units\.(\d+)\.(\d+)\.weight", rest)
        if m:
            j, idx = int(m.group(1)), int(m.group(2))
            return j, (idx - 1) // 2  # Sequential(ELU, conv, ELU, conv)
        return None

    for key, raw in sd.items():
        k = key[6:] if key.startswith("model.") else key
        if _DROP.search(k):  # diffusion-wrapper buffers (beta tables, _dummy)
            continue
        v = np.asarray(raw, dtype=np.float32)
        if k == "coords":
            buffers["coords"] = np.transpose(v[0], (1, 2, 0))
            continue
        m = re.match(r"in_conv\.(weight|bias)", k)
        if m:
            set_plain_conv(["in_conv"], m.group(1), v)
            continue
        m = re.match(r"out_conv\.0\.(alpha|post_affine)(?:\.(weight|bias))?", k)
        if m:
            set_inorm(["out_norm"], m.group(1), m.group(2) or "", v)
            continue
        m = re.match(r"out_conv\.2\.(weight|bias)", k)
        if m:
            set_plain_conv(["out_conv"], m.group(1), v)
            continue
        m = re.match(r"(d_block\d)\.(\d)\.(.*)", k)
        if m:
            block = f"{m.group(1)}_{m.group(2)}"
            rest = m.group(3)
            mm = re.match(r"(norm[12])\.(alpha|post_affine)(?:\.(weight|bias))?", rest)
            if mm:
                set_inorm([block, mm.group(1)], mm.group(2), mm.group(3) or "", v)
                continue
            mm = re.match(r"(conv[12]|skip)(?:\.0)?\.(weight|bias)", rest)
            if mm:
                set_conv([block, mm.group(1)], mm.group(2), v)
                continue
            raise KeyError(f"unhandled refinenet key: {key}")
        m = re.match(r"(u_block\d)\.(.*)", k)
        if m:
            block, rest = m.groups()
            mm = re.match(r"adaptive_convs\.(\d+)\.0\.(units\..*)", rest)
            if mm:
                j_k = rcu_leaf(mm.group(2))
                if j_k:
                    j, kk = j_k
                    set_conv([block, f"adapt{mm.group(1)}_rcu", f"unit{j}_stage{kk}"],
                             "weight", v)
                    continue
            mm = re.match(r"adaptive_convs\.(\d+)\.1\.(weight|bias)", rest)
            if mm:
                set_conv([block, f"adapt{mm.group(1)}_proj"], mm.group(2), v)
                continue
            mm = re.match(r"crp\.convs\.(\d+)\.1\.weight", rest)
            if mm:
                set_conv([block, "crp", f"conv{mm.group(1)}"], "weight", v)
                continue
            mm = re.match(r"output_conv\.(units\..*)", rest)
            if mm:
                j_k = rcu_leaf(mm.group(1))
                if j_k:
                    j, kk = j_k
                    set_conv([block, "output_rcu", f"unit{j}_stage{kk}"], "weight", v)
                    continue
            raise KeyError(f"unhandled refinenet key: {key}")
        raise KeyError(f"unhandled refinenet key: {key}")

    return params, buffers


def refinenet_variables_from_reference(sd: Mapping[str, np.ndarray]) -> dict:
    import jax
    import jax.numpy as jnp

    params, buffers = convert_refinenet_state_dict(sd)
    variables = {"params": params}
    if buffers:
        variables["buffers"] = buffers
    return jax.tree.map(jnp.asarray, variables)


def export_unet_state_dict(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Inverse of :func:`convert_unet_state_dict`: our flax EfficientUNet
    ``variables`` ({'params':…, 'buffers':…}) -> reference torch
    ``state_dict`` keys (``model.``-prefixed, reference train.py:294-304
    layout), so models trained HERE run in the reference repo.

    Emits only translated parameters + the ``coords`` buffer. Constants the
    reference re-registers at construction (FIR resample kernels, residual
    ``scale``, coord-encoding tables, ``_dummy``, discrete beta tables) are
    intentionally absent — load with ``strict=False``; the freshly
    constructed values are identical by design (they are what our import
    path drops for the same reason).
    """
    sd: dict[str, np.ndarray] = {}

    def put(key: str, v, transform=None) -> None:
        v = np.asarray(v, dtype=np.float32)
        sd["model." + key] = transform(v) if transform else v

    def inv_conv(v: np.ndarray) -> np.ndarray:
        return np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW

    def inv_lin(v: np.ndarray) -> np.ndarray:
        return np.transpose(v, (1, 0))  # (I,O) -> (O,I)

    def walk(path: tuple[str, ...], node) -> None:
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(path + (k,), v)
            return
        p, v = path, node
        wb = {"kernel": "weight", "bias": "bias", "scale": "weight"}.get(p[-1])
        if p[0] == "time_embedding" and len(p) == 3:
            idx = {"dense1": "1", "dense2": "3"}[p[1]]
            put(f"time_embedding.{idx}.{wb}",
                v, inv_lin if p[-1] == "kernel" else None)
        elif p[0] in ("in_conv", "out_conv") and p[1] == "conv":
            put(f"{p[0]}.{wb}", v, inv_conv if p[-1] == "kernel" else None)
        elif len(p) >= 2 and re.fullmatch(r"[du]_block\d", p[0]):
            block = p[0]
            if p[1] == "down_conv":
                put(f"{block}.downsample.0.{wb}",
                    v, inv_conv if p[-1] == "kernel" else None)
            elif p[1] == "up_conv":
                put(f"{block}.upsample.1.{wb}",
                    v, inv_conv if p[-1] == "kernel" else None)
            elif re.fullmatch(r"res\d+", p[1]):
                i = p[1][3:]
                base = f"{block}.residual_blocks.{i}"
                if p[2] in ("conv1", "conv2", "skip"):
                    put(f"{base}.{p[2]}.{wb}",
                        v, inv_conv if p[-1] == "kernel" else None)
                elif p[2] == "norm1":
                    put(f"{base}.norm1.{wb}", v)
                elif p[2] == "norm2" and p[3] == "proj":
                    put(f"{base}.norm2.proj.1.{wb}",
                        v, inv_lin if p[-1] == "kernel" else None)
                elif p[2] == "norm2":
                    put(f"{base}.norm2.{wb}", v)
                else:
                    raise KeyError(f"unhandled flax path: {'/'.join(p)}")
            elif p[1] == "attn" and p[2] == "norm":
                put(f"{block}.self_attn_block.norm.{wb}", v)
            elif p[1] == "attn" and p[2] == "attn":
                attn = f"{block}.self_attn_block.attn"
                if p[3] == "qkv_kernel":
                    put(f"{attn}.in_proj_weight", v, inv_lin)
                elif p[3] == "qkv_bias":
                    put(f"{attn}.in_proj_bias", v)
                elif p[3] == "out_proj":
                    put(f"{attn}.out_proj.{wb}",
                        v, inv_lin if p[-1] == "kernel" else None)
                else:
                    raise KeyError(f"unhandled flax path: {'/'.join(p)}")
            else:
                raise KeyError(f"unhandled flax path: {'/'.join(p)}")
        else:
            raise KeyError(f"unhandled flax path: {'/'.join(p)}")

    walk((), variables.get("params", variables))
    coords = variables.get("buffers", {}).get("coords")
    if coords is not None:
        c = np.asarray(coords, dtype=np.float32)
        sd["model.coords"] = np.transpose(c, (2, 0, 1))[None]  # (H,W,2)->(1,2,H,W)
    return sd


def export_refinenet_state_dict(
    variables: Mapping[str, Any],
) -> dict[str, np.ndarray]:
    """Inverse of :func:`convert_refinenet_state_dict` for the (fixed)
    LiDARGenRefineNet architecture (reference models/refinenet.py:157-212).

    Same contract as :func:`export_unet_state_dict`: emits the translated
    parameters + ``coords``; construction-time constants stay absent (load
    reference-side with ``strict=False``).
    """
    sd: dict[str, np.ndarray] = {}
    # Blocks whose conv2/skip are wrapped in Sequential(conv, AvgPool2d) on
    # the reference side (key suffix ".0"): pool fires iff dilation == 1 and
    # resample == "down" (refinenet.py:76-80 / ours RNResidualBlock) — in the
    # fixed LiDARGen net that is exactly d_block2's first sub-block
    # (d_block3/4 downsample via dilation instead).
    POOLED = {("d_block2", "0")}

    def put(key: str, v, transform=None) -> None:
        v = np.asarray(v, dtype=np.float32)
        sd["model." + key] = transform(v) if transform else v

    def inv_conv(v: np.ndarray) -> np.ndarray:
        return np.transpose(v, (3, 2, 0, 1))  # HWIO -> OIHW

    def put_inorm(prefix: str, leaf: str, v) -> None:
        v = np.asarray(v, dtype=np.float32)
        C = v.shape[0]
        if leaf == "alpha":
            put(f"{prefix}.alpha", v.reshape(1, C, 1, 1))
        elif leaf == "scale":  # depthwise 1x1 post_affine conv
            put(f"{prefix}.post_affine.weight", v.reshape(C, 1, 1, 1))
        else:
            put(f"{prefix}.post_affine.bias", v)

    def put_rcu(prefix: str, name: str, v) -> None:
        m = re.fullmatch(r"unit(\d+)_stage(\d+)", name)
        j, k = int(m.group(1)), int(m.group(2))
        put(f"{prefix}.units.{j}.{2 * k + 1}.weight", v, inv_conv)

    params = variables.get("params", variables)
    for top, node in params.items():
        if top == "in_conv":
            for leaf, v in node.items():
                put(f"in_conv.{'weight' if leaf == 'kernel' else 'bias'}",
                    v, inv_conv if leaf == "kernel" else None)
        elif top == "out_norm":
            for leaf, v in node.items():
                put_inorm("out_conv.0", leaf, v)
        elif top == "out_conv":
            for leaf, v in node.items():
                put(f"out_conv.2.{'weight' if leaf == 'kernel' else 'bias'}",
                    v, inv_conv if leaf == "kernel" else None)
        elif re.fullmatch(r"d_block\d_\d", top):
            block, j = top.rsplit("_", 1)
            for sub, child in node.items():
                if sub in ("norm1", "norm2"):
                    for leaf, v in child.items():
                        put_inorm(f"{block}.{j}.{sub}", leaf, v)
                elif sub in ("conv1", "conv2", "skip"):
                    seq = ".0" if sub != "conv1" and (block, j) in POOLED else ""
                    for leaf, v in child["conv"].items():
                        wb = "weight" if leaf == "kernel" else "bias"
                        put(f"{block}.{j}.{sub}{seq}.{wb}",
                            v, inv_conv if leaf == "kernel" else None)
                else:
                    raise KeyError(f"unhandled flax path: {top}/{sub}")
        elif re.fullmatch(r"u_block\d", top):
            for sub, child in node.items():
                m = re.fullmatch(r"adapt(\d+)_rcu", sub)
                if m:
                    for name, unit in child.items():
                        put_rcu(f"{top}.adaptive_convs.{m.group(1)}.0",
                                name, unit["conv"]["kernel"])
                    continue
                m = re.fullmatch(r"adapt(\d+)_proj", sub)
                if m:
                    for leaf, v in child["conv"].items():
                        wb = "weight" if leaf == "kernel" else "bias"
                        put(f"{top}.adaptive_convs.{m.group(1)}.1.{wb}",
                            v, inv_conv if leaf == "kernel" else None)
                    continue
                if sub == "crp":
                    for name, unit in child.items():
                        i = re.fullmatch(r"conv(\d+)", name).group(1)
                        put(f"{top}.crp.convs.{i}.1.weight",
                            unit["conv"]["kernel"], inv_conv)
                    continue
                if sub == "output_rcu":
                    for name, unit in child.items():
                        put_rcu(f"{top}.output_conv", name,
                                unit["conv"]["kernel"])
                    continue
                raise KeyError(f"unhandled flax path: {top}/{sub}")
        else:
            raise KeyError(f"unhandled flax path: {top}")

    coords = variables.get("buffers", {}).get("coords")
    if coords is not None:
        c = np.asarray(coords, dtype=np.float32)
        sd["model.coords"] = np.transpose(c, (2, 0, 1))[None]
    return sd


def load_torch_checkpoint(path: str) -> dict[str, Any]:
    """Read a reference .pth checkpoint into plain numpy/python objects.

    Uses torch (CPU) when available; the result has the reference layout
    {cfg, weights, ema_weights, optimizer, lr_scheduler, global_step}
    (train.py:294-304) with tensors as numpy arrays.
    """
    import torch  # local import: only needed on the import path

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(x):
        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
        if isinstance(x, dict):
            return {k: to_np(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(to_np(v) for v in x)
        return x

    return to_np(ckpt)


def variables_from_reference(
    state_dict: Mapping[str, np.ndarray],
) -> dict:
    """Build a flax ``variables`` dict {'params':…, 'buffers':…} from a
    reference EfficientUNet/ddpm state_dict."""
    import jax.numpy as jnp
    import jax

    params, buffers = convert_unet_state_dict(state_dict)
    variables = {"params": params}
    if buffers:
        variables["buffers"] = buffers
    return jax.tree.map(jnp.asarray, variables)
