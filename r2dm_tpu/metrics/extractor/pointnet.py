"""PointNet feature extractor (FPD features), flax.

Behavior-matches reference ``metrics/extractor/pointnet.py:7-98``: STN3d
input transform, PointNet trunk, and the 1808-d feature = concat of
(global 1024, fc1 512, fc2 256, logits 16). The network is a frozen
inference-only extractor, so BatchNorms are folded affine transforms using
the imported running statistics.

Input layout: (B, N, 3) points (the reference takes (B, 3, N)).
Pretrained ShapeNet weights come from the reference's URL
(metrics/extractor/pointnet.py:83-98, microsoft/SpareNet cls_model_39.pth)
via :func:`load_pointnet_weights` — no egress here, so pass a local path.
"""

from __future__ import annotations

import re
from typing import Any, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Dtype = Any


# shared frozen (inference-statistics) BatchNorm, same module as RangeNet's
from .rangenet import FrozenBatchNorm2d as FrozenBatchNorm  # noqa: E402


def _dense_bn_relu(x, features, name, dtype=None):
    x = nn.Dense(features, dtype=dtype, name=f"{name}")(x)
    x = FrozenBatchNorm(name=f"{name}_bn")(x)
    return nn.relu(x)


class STN3d(nn.Module):
    """Input-transform net -> (B, 3, 3) (reference pointnet.py:7-34)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, N, 3); 1x1 Conv1d == per-point Dense
        h = _dense_bn_relu(x, 64, "conv1", self.dtype)
        h = _dense_bn_relu(h, 128, "conv2", self.dtype)
        h = _dense_bn_relu(h, 1024, "conv3", self.dtype)
        h = h.max(axis=1)  # (B, 1024)
        h = _dense_bn_relu(h, 512, "fc1", self.dtype)
        h = _dense_bn_relu(h, 256, "fc2", self.dtype)
        h = nn.Dense(9, dtype=self.dtype, name="fc3")(h)
        return h.reshape(-1, 3, 3) + jnp.eye(3, dtype=h.dtype)


class PointNetFeat(nn.Module):
    """Global-feature trunk (reference pointnet.py:37-63)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        trans = STN3d(dtype=self.dtype, name="stn")(x)
        x = jnp.einsum("bnc,bcd->bnd", x, trans)
        h = _dense_bn_relu(x, 64, "conv1", self.dtype)
        h = _dense_bn_relu(h, 128, "conv2", self.dtype)
        h = nn.Dense(1024, dtype=self.dtype, name="conv3")(h)
        h = FrozenBatchNorm(name="conv3_bn")(h)
        return h.max(axis=1)  # (B, 1024)


class PointNet1(nn.Module):
    """Classifier head; __call__ returns the 1024+512+256+k concat feature
    (reference pointnet.py:66-80)."""

    k: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x1 = PointNetFeat(dtype=self.dtype, name="feat")(x)
        x2 = _dense_bn_relu(x1, 512, "fc1", self.dtype)
        x3 = _dense_bn_relu(x2, 256, "fc2", self.dtype)
        x4 = nn.Dense(self.k, dtype=self.dtype, name="fc3")(x3)
        return jnp.concatenate([x1, x2, x3, x4], axis=1)


def convert_pointnet_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    """Torch PointNet1 state_dict -> flax params tree.

    Torch names: feat.stn.{conv1..3,fc1..3,bn1..5}, feat.{conv1..3,bn1..3},
    {fc1,fc2,fc3,bn1,bn2}. BN index -> the preceding layer's *_bn module.
    """
    params: dict = {}

    def setp(path, leaf, v):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = v

    bn_of = {  # bnN -> module name within each scope
        ("stn", "bn1"): "conv1_bn", ("stn", "bn2"): "conv2_bn",
        ("stn", "bn3"): "conv3_bn", ("stn", "bn4"): "fc1_bn",
        ("stn", "bn5"): "fc2_bn",
        ("feat", "bn1"): "conv1_bn", ("feat", "bn2"): "conv2_bn",
        ("feat", "bn3"): "conv3_bn",
        ("top", "bn1"): "fc1_bn", ("top", "bn2"): "fc2_bn",
    }
    bn_leaf = {
        "weight": "scale", "bias": "bias",
        "running_mean": "mean", "running_var": "var",
    }

    for key, raw in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        v = np.asarray(raw, dtype=np.float32)
        parts = key.split(".")
        if parts[0] == "feat" and parts[1] == "stn":
            scope, name, leaf = ("stn",), parts[2], parts[3]
            path = ["feat", "stn"]
        elif parts[0] == "feat":
            scope, name, leaf = ("feat",), parts[1], parts[2]
            path = ["feat"]
        else:
            scope, name, leaf = ("top",), parts[0], parts[1]
            path = []
        if name.startswith("bn"):
            setp(path + [bn_of[(scope[0], name)]], bn_leaf[leaf], v)
        elif name.startswith("conv"):
            if leaf == "weight":  # (O, I, 1) conv1d -> (I, O)
                setp(path + [name], "kernel", np.transpose(v[..., 0], (1, 0)))
            else:
                setp(path + [name], "bias", v)
        elif name.startswith("fc"):
            if leaf == "weight":  # (O, I) -> (I, O)
                setp(path + [name], "kernel", np.transpose(v, (1, 0)))
            else:
                setp(path + [name], "bias", v)
        else:
            raise KeyError(key)
    return params


def load_pointnet_weights(path: str) -> dict:
    """Local copy of the reference's pretrained ShapeNet classifier .pth
    (pointnet.py:83-98) -> flax variables."""
    import jax
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in sd.items()}
    return {"params": jax.tree.map(jnp.asarray, convert_pointnet_state_dict(sd))}


def pretrained_pointnet(ckpt_path: str, dtype: Any = None):
    """Build (model, variables, extract_fn); mirrors the reference factory
    (pointnet.py:83-98) but takes a local weight path (zero egress)."""
    model = PointNet1(k=16, dtype=dtype)
    variables = load_pointnet_weights(ckpt_path)

    def extract(points_bn3: jnp.ndarray) -> jnp.ndarray:
        return model.apply(variables, points_bn3)

    return model, variables, extract
