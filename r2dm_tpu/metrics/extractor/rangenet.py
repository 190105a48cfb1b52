"""RangeNet++ (Darknet21/53) segmenter / FRD feature extractor, flax/NHWC.

Behavior-matches the reference re-implementation
(``metrics/extractor/rangenet.py:28-177``): 5-level Darknet encoder with
W-only stride-2 convs, transposed-conv decoder with detached skip adds, and
the "lidargen" feature mode — the decoder feature map flattened in NCHW
order and subsampled at 4096 fixed indices (random.seed(0), :150-155) which
defines FRD. All BatchNorms are frozen (inference statistics).

Weights: the official bonnetal tar.gz checkpoints
(http://www.ipb.uni-bonn.de/.../darknet53-1024.tar.gz etc., reference
:532-545) are parsed by :func:`load_rangenet_tar` — pass a locally
downloaded file (zero egress here).
"""

from __future__ import annotations

import io
import random
import tarfile
from typing import Any, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

NUM_RESBLOCKS = {21: (1, 1, 2, 2, 1), 53: (1, 2, 8, 8, 4)}


class FrozenBatchNorm2d(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mean = self.param("mean", nn.initializers.zeros, (C,))
        var = self.param("var", nn.initializers.ones, (C,))
        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        return (x - mean) * inv * scale + bias


class ConvBNLReLU(nn.Module):
    """conv -> BN -> LeakyReLU(0.1) (reference rangenet.py:31-48)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (1, 1)
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.stride,
            padding=[(p, p) for p in self.padding],
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = FrozenBatchNorm2d(name="bn")(x)
        return nn.leaky_relu(x, 0.1)


class ConvTransposeBNLReLU(nn.Module):
    """torch ConvTranspose2d(k=(1,4), s=(1,2), p=(0,1)) -> BN -> LReLU.

    Expressed as an lhs-dilated conv with flipped kernel (exact torch
    semantics): out_W = 2 * in_W.
    """

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        # kernel stored torch-like: (kh, kw, in, out)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 4, in_ch, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        rhs = jnp.flip(kernel, axis=(0, 1))
        # pad = k - 1 - p per edge: H: 1-1-0=0; W: 4-1-1=2
        y = jax.lax.conv_general_dilated(
            x.astype(kernel.dtype),
            rhs,
            window_strides=(1, 1),
            padding=((0, 0), (2, 2)),
            lhs_dilation=(1, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + bias
        y = FrozenBatchNorm2d(name="bn")(y)
        return nn.leaky_relu(y, 0.1)


class RNResidual(nn.Module):
    """h + conv3x3(conv1x1(h)) with BN/LReLU (reference rangenet.py:51-60)."""

    mid: int
    out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        r = ConvBNLReLU(self.mid, (1, 1), (1, 1), (0, 0), dtype=self.dtype, name="conv1")(h)
        r = ConvBNLReLU(self.out, (3, 3), (1, 1), (1, 1), dtype=self.dtype, name="conv2")(r)
        return h + r


class RNBlock(nn.Module):
    """[down|up|same] conv + residual stack (reference rangenet.py:63-104)."""

    in_ch: int
    out_ch: int
    num_blocks: int
    mode: str = "same"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "up":
            h = ConvTransposeBNLReLU(self.out_ch, dtype=self.dtype, name="conv")(x)
        elif self.mode == "down":
            h = ConvBNLReLU(
                self.out_ch, (3, 3), (1, 2), (1, 1), dtype=self.dtype, name="conv"
            )(x)
        else:
            h = ConvBNLReLU(self.out_ch, dtype=self.dtype, name="conv")(x)
        for j in range(self.num_blocks):
            h = RNResidual(
                mid=self.in_ch, out=self.out_ch, dtype=self.dtype, name=f"res{j}"
            )(h)
        return h


class RangeNet(nn.Module):
    """__call__(img NHWC, feature=None|'lidargen'|'decoder') -> logits/feats
    (reference rangenet.py:107-177)."""

    in_channels: int = 5
    num_classes: int = 20
    backbone: int = 53
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, img: jnp.ndarray, feature: Optional[str] = None):
        n = NUM_RESBLOCKS[self.backbone]
        ch = lambda i: 32 << i
        h0 = ConvBNLReLU(32, dtype=self.dtype, name="stem")(img)
        h1 = RNBlock(ch(0), ch(1), n[0], "down", self.dtype, name="enc1")(h0)
        h2 = RNBlock(ch(1), ch(2), n[1], "down", self.dtype, name="enc2")(h1)
        h3 = RNBlock(ch(2), ch(3), n[2], "down", self.dtype, name="enc3")(h2)
        h4 = RNBlock(ch(3), ch(4), n[3], "down", self.dtype, name="enc4")(h3)
        h5 = RNBlock(ch(4), ch(5), n[4], "down", self.dtype, name="enc5")(h4)
        h = RNBlock(ch(5), ch(4), 1, "up", self.dtype, name="dec5")(h5) + h4
        h = RNBlock(ch(4), ch(3), 1, "up", self.dtype, name="dec4")(h) + h3
        h = RNBlock(ch(3), ch(2), 1, "up", self.dtype, name="dec3")(h) + h2
        h = RNBlock(ch(2), ch(1), 1, "up", self.dtype, name="dec2")(h) + h1
        h = RNBlock(ch(1), ch(0), 1, "up", self.dtype, name="dec1")(h) + h0
        if feature == "lidargen":
            return flatten_and_subsample(h)
        if feature == "decoder":
            return h
        return nn.Conv(
            self.num_classes, (3, 3), padding=1, dtype=self.dtype, name="head"
        )(h)


_SUBSAMPLE_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def subsample_indices(C: int, H: int, W: int) -> np.ndarray:
    """The fixed 4096 feature indices (reference rangenet.py:150-155:
    random.seed(0); random.sample(range(C*H*W), 4096)), in NCHW flat order."""
    key = (C, H, W)
    if key not in _SUBSAMPLE_CACHE:
        random.seed(0)
        _SUBSAMPLE_CACHE[key] = np.asarray(
            random.sample(range(C * H * W), 4096), dtype=np.int64
        )
    return _SUBSAMPLE_CACHE[key]


def flatten_and_subsample(fmaps_nhwc: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 4096) lidargen FRD features (NCHW flat order)."""
    B, H, W, C = fmaps_nhwc.shape
    flat = jnp.transpose(fmaps_nhwc, (0, 3, 1, 2)).reshape(B, C * H * W)
    idx = jnp.asarray(subsample_indices(C, H, W))
    return flat[:, idx]


def preprocess(
    img: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    mean: Sequence[float] = (12.12, 10.88, 0.23, -1.04, 0.21),
    std: Sequence[float] = (12.32, 11.47, 6.91, 0.86, 0.16),
) -> jnp.ndarray:
    """Input standardization x mask (reference rangenet.py:511-529).

    NHWC; channel order (range, x, y, z, remission)."""
    assert img.shape[-1] == len(mean)
    if mask is None:
        mask = (img[..., 0:1] > 0).astype(img.dtype)
    mean = jnp.asarray(mean, img.dtype)
    std = jnp.asarray(std, img.dtype)
    return (img - mean) / std * mask


# ------------------------------------------------------------ weight import
def translate_bonnetal_key(key: str) -> Optional[list[str]]:
    """Official bonnetal param name -> our flax path (None = skip).

    Source patterns per the reference translator (rangenet.py:413-447):
      1.*            -> head (segmentation head Sequential index 1)
      conv1/bn1      -> stem
      X.conv|upconv  -> X.conv.conv ; X.bn -> X.conv.bn
      X.residual.convK|bnK     -> X.res0.convK.{conv,bn}
      X.residual_M.convK|bnK   -> X.resM.convK.{conv,bn}
    """
    parts = key.split(".")
    leaf = parts[-1]
    if leaf == "num_batches_tracked":
        return None
    if parts[0] == "1":
        return ["head", leaf]
    if parts[0] == "conv1":
        return ["stem", "conv", leaf]
    if parts[0] == "bn1":
        return ["stem", "bn", leaf]
    block = parts[0]  # encN / decN
    sub = parts[1]
    if sub in ("conv", "upconv"):
        return [block, "conv", "conv", leaf] if sub == "conv" else [block, "conv", leaf]
    if sub == "bn":
        return [block, "conv", "bn", leaf]
    if sub.startswith("residual"):
        m = 0 if sub == "residual" else int(sub.split("_")[-1])
        layer = parts[2]  # convK or bnK
        k = int(layer[-1])
        kind = "conv" if layer.startswith("conv") else "bn"
        return [block, f"res{m}", f"conv{k}", kind, leaf]
    raise KeyError(f"unrecognized bonnetal key: {key}")


_BN_LEAF = {"weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var"}


def convert_rangenet_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    """Flat bonnetal-named state dict -> flax params tree."""
    params: dict = {}
    for key, raw in sd.items():
        path = translate_bonnetal_key(key)
        if path is None:
            continue
        v = np.asarray(raw, dtype=np.float32)
        *prefix, leaf = path
        is_bn = len(prefix) >= 1 and prefix[-1] == "bn"
        # decN.conv holds the ConvTranspose kernel/bias directly (length-2
        # prefix); every other weight is a nested regular conv
        is_upconv = (
            len(prefix) == 2
            and prefix[0].startswith("dec")
            and prefix[1] == "conv"
        )
        node = params
        for p in prefix:
            node = node.setdefault(p, {})
        if is_bn:
            node[_BN_LEAF[leaf]] = v
        elif leaf == "weight":
            if is_upconv:
                # torch ConvTranspose2d (in, out, kh, kw) -> (kh, kw, in, out)
                node["kernel"] = np.transpose(v, (2, 3, 0, 1))
            else:
                # torch Conv2d OIHW -> HWIO
                node["kernel"] = np.transpose(v, (2, 3, 1, 0))
        else:
            node[leaf] = v
    return params


def load_rangenet_tar(path: str):
    """Parse an official bonnetal tar.gz (reference rangenet.py:449-508):
    {arch}/backbone + segmentation_decoder + segmentation_head (torch
    pickles) + arch_cfg.yaml. Returns (variables, cfg_dict, (mean, std))."""
    import os

    import torch
    import yaml

    arch = os.path.basename(path).replace(".tar.gz", "")
    sd: dict[str, np.ndarray] = {}
    arch_cfg = None
    with tarfile.open(path, "r:gz") as tar:
        for member in (
            f"{arch}/backbone",
            f"{arch}/segmentation_decoder",
            f"{arch}/segmentation_head",
            f"{arch}/arch_cfg.yaml",
        ):
            stream = io.BytesIO(tar.extractfile(member).read())
            if member.endswith(".yaml"):
                arch_cfg = yaml.safe_load(stream)
            else:
                part = torch.load(stream, map_location="cpu", weights_only=False)
                for name, tensor in part.items():
                    assert name not in sd, name
                    sd[name] = tensor.cpu().numpy()

    params = convert_rangenet_state_dict(sd)
    inputs = arch_cfg["backbone"]["input_depth"]
    in_ch = sum(
        {"xyz": 3, "range": 1, "remission": 1, "mask": 1}[k]
        for k, on in inputs.items()
        if on
    )
    cfg = dict(
        in_channels=in_ch,
        num_classes=int(np.asarray(sd["1.bias"]).shape[0]),
        backbone=arch_cfg["backbone"]["extra"]["layers"],
    )
    mean = arch_cfg["dataset"]["sensor"]["img_means"][:in_ch]
    std = arch_cfg["dataset"]["sensor"]["img_stds"][:in_ch]
    return {"params": jax.tree.map(jnp.asarray, params)}, cfg, (mean, std)


def rangenet53(weights_tar: Optional[str] = None, dtype: Any = None):
    """Build RangeNet-53 (+preprocess closure) from a local official tar
    (⇔ reference rangenet53(), rangenet.py:590-612)."""
    return _build(weights_tar, 53, dtype)


def rangenet21(weights_tar: Optional[str] = None, dtype: Any = None):
    return _build(weights_tar, 21, dtype)


def _build(weights_tar, backbone, dtype):
    from functools import partial

    if weights_tar is None:
        model = RangeNet(backbone=backbone, dtype=dtype)
        return model, None, partial(preprocess)
    variables, cfg, (mean, std) = load_rangenet_tar(weights_tar)
    assert cfg["backbone"] == backbone, (cfg, backbone)
    model = RangeNet(
        in_channels=cfg["in_channels"],
        num_classes=cfg["num_classes"],
        backbone=backbone,
        dtype=dtype,
    )
    return model, variables, partial(preprocess, mean=mean, std=std)


# ----------------------------------------------------- SemanticKITTI labels
ID2LABEL = {
    0: "unlabeled", 1: "car", 2: "bicycle", 3: "motorcycle", 4: "truck",
    5: "other-vehicle", 6: "person", 7: "bicyclist", 8: "motorcyclist",
    9: "road", 10: "parking", 11: "sidewalk", 12: "other-ground",
    13: "building", 14: "fence", 15: "vegetation", 16: "trunk",
    17: "terrain", 18: "pole", 19: "traffic-sign",
}


def make_semantickitti_cmap():
    """20-class colormap (reference rangenet.py:654-686; colors are the
    SemanticKITTI BGR palette flipped to RGB)."""
    from matplotlib.colors import ListedColormap

    bgr = {
        0: (0, 0, 0), 1: (245, 150, 100), 2: (245, 230, 100),
        3: (150, 60, 30), 4: (180, 30, 80), 5: (255, 0, 0),
        6: (30, 30, 255), 7: (200, 40, 255), 8: (90, 30, 150),
        9: (255, 0, 255), 10: (255, 150, 255), 11: (75, 0, 75),
        12: (75, 0, 175), 13: (0, 200, 255), 14: (50, 120, 255),
        15: (0, 175, 0), 16: (0, 60, 135), 17: (80, 240, 150),
        18: (150, 240, 255), 19: (0, 0, 255),
    }
    cmap = np.zeros((len(bgr), 3), dtype=np.uint8)
    for label_id, color in bgr.items():
        cmap[label_id] = color[::-1]
    return ListedColormap(cmap / 255.0)
