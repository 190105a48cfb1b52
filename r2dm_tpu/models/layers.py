"""NN building blocks for the denoiser networks (flax.linen, NHWC).

TPU-first re-design of the reference blocks (models/ops.py, parts of
models/efficient_unet.py): channels-last layout, bf16-friendly compute with
fp32 normalization statistics, and padding expressed so XLA fuses it into the
convolution. Parameter tree names mirror the reference module names so torch
checkpoints map mechanically (see utils/torch_import.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import w2c
from ..ops.pad import ring_pad

Dtype = Any


# Ring-conv lowering strategy (perf knob; all variants are mathematically
# identical):
#   "padadd": zero-padded conv + wrap corrections added as zero-padded
#             tensors (XLA fuses pad+add into the conv epilogue) [default]
#   "dus":    corrections via dynamic-update-slice (extra output copies)
#   "pad":    materialize the wrapped input (reference-style concat)
RING_CONV_IMPL = "padadd"

# Serving-only numeric lane: None (bf16/fp32 compute, default) or "w8a8" —
# 3x3 ring convs run s8 x s8 -> s32 on the MXU's 2x-peak int8 path with
# dynamic per-tensor activation scales (ops/quant.py). Inference-only
# (round() kills gradients); enable via generate.py --int8 / R2DM_TPU_INT8.
QUANT_CONV: Optional[str] = None


class _RingConv3x3(nn.Module):
    """3x3/stride-1 conv with circular W wrap, WITHOUT materializing a
    wrapped copy of the activation: a zero-padded conv (XLA folds the
    padding into the convolution window) plus wrap corrections added to the
    two boundary columns — an O(H*C^2) fix-up vs the O(H*W*C^2) conv.
    Mathematically identical to conv(ring_pad(x)); saves a full HBM
    round-trip of the activation per conv (~12% of the U-Net forward).
    Param names match nn.Conv ("kernel"/"bias") so weight trees are
    interchangeable."""

    features: int
    use_bias: bool = True
    zero_init: bool = False
    data_format: str = "NHWC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, prologue=None, fused_resample=None
    ) -> jnp.ndarray:
        nhwc = self.data_format == "NHWC"
        C_in = x.shape[-1] if nhwc else x.shape[1]
        if fused_resample == "down_merged":
            # consumes a width-pair-MERGED input; params stay unmerged HWIO
            C_in = x.shape[-1] // 2
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        # params stored HWIO regardless of layout (weight-tree compatible)
        kernel = self.param("kernel", kernel_init, (3, 3, C_in, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if fused_resample is not None:
            # conv composed with its adjacent FIR resample — or with the W2C
            # level-boundary layout transform — into ONE conv
            # (ops/fused_resample.py, ops/w2c.py); exact: same params/math
            assert nhwc and prologue is None
            from ..ops import fused_resample as fr

            xc = x.astype(self.dtype) if self.dtype is not None else x
            k = kernel.astype(xc.dtype)
            if fused_resample == "down":
                return fr.conv_then_downsample(xc, k, bias)
            if fused_resample == "merge_in":
                # ring conv emitting ALIGNED merged output (level-1 entry)
                return w2c.in_conv_merged(xc, k, bias)
            if fused_resample == "down_merged":
                # conv∘FIR-down consuming ALIGNED merged level-1 input
                return fr.conv_then_downsample_merged(xc, k, bias)
            if fused_resample == "up_merged":
                # FIR-up∘conv emitting ALIGNED merged level-1 output
                return fr.upsample_then_conv_merged(xc, k, bias)
            assert fused_resample == "up", fused_resample
            return fr.upsample_then_conv(xc, k, bias)
        if prologue is not None:
            # fused "silu(x*a + b) -> ring conv": Pallas kernel when the
            # shape qualifies, mathematically-identical XLA path otherwise
            assert nhwc, "prologue fusion is NHWC-only"
            from ..ops import pallas_resconv

            a, b = prologue
            if USE_PALLAS_RESCONV and pallas_resconv.supported(x, self.features):
                xc = x.astype(self.dtype) if self.dtype is not None else x
                return pallas_resconv.fused_act_ringconv(
                    xc, a, b, kernel,
                    bias if bias is not None else jnp.zeros((self.features,)),
                    apply_act=True,
                    interpret=PALLAS_RESCONV_INTERPRET,
                ).astype(xc.dtype)
            y = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
            y = y * jax.nn.sigmoid(y)
            x = y.astype(x.dtype if self.dtype is None else self.dtype)
        if QUANT_CONV == "w8a8" and nhwc:
            # int8 serving lane (ops/quant.py): quantizes from the fp32
            # master kernel; output dtype matches the bf16/fp32 policy
            from ..ops import quant

            return quant.ring_conv_w8a8(
                x, kernel, bias, out_dtype=self.dtype or x.dtype
            )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)

        if nhwc:
            dn = ("NHWC", "HWIO", "NHWC")
            W = x.shape[2]
            col_l, col_r = x[:, :, -1:, :], x[:, :, 0:1, :]
            k_l, k_r = kernel[:, 0:1], kernel[:, 2:3]
            pad_l = ((0, 0), (0, 0), (0, W - 1), (0, 0))
            pad_r = ((0, 0), (0, 0), (W - 1, 0), (0, 0))
            wrap_pad = ((0, 0), (0, 0), (1, 1), (0, 0))
        else:  # channels-major: W is the minor (lane) axis
            dn = ("NCHW", "OIHW", "NCHW")
            kernel = jnp.transpose(kernel, (3, 2, 0, 1))
            W = x.shape[3]
            col_l, col_r = x[..., -1:], x[..., 0:1]
            k_l, k_r = kernel[..., 0:1], kernel[..., 2:3]
            pad_l = ((0, 0), (0, 0), (0, 0), (0, W - 1))
            pad_r = ((0, 0), (0, 0), (0, 0), (W - 1, 0))
            wrap_pad = ((0, 0), (0, 0), (0, 0), (1, 1))

        if RING_CONV_IMPL == "pad":
            xp = jnp.pad(x, wrap_pad, mode="wrap")
            y = jax.lax.conv_general_dilated(
                xp, kernel, (1, 1), ((1, 1), (0, 0)), dimension_numbers=dn
            )
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
            )
            # wrap corrections: column 0 misses x[.., W-1] through kernel
            # column 0; column W-1 misses x[.., 0] through kernel column 2
            corr_l = jax.lax.conv_general_dilated(
                col_l, k_l, (1, 1), ((1, 1), (0, 0)), dimension_numbers=dn
            )
            corr_r = jax.lax.conv_general_dilated(
                col_r, k_r, (1, 1), ((1, 1), (0, 0)), dimension_numbers=dn
            )
            if RING_CONV_IMPL == "dus":
                if nhwc:
                    y = y.at[:, :, 0:1, :].add(corr_l)
                    y = y.at[:, :, -1:, :].add(corr_r)
                else:
                    y = y.at[..., 0:1].add(corr_l)
                    y = y.at[..., -1:].add(corr_r)
            else:  # "padadd"
                y = y + jnp.pad(corr_l, pad_l) + jnp.pad(corr_r, pad_r)
        if bias is not None:
            b = bias.astype(y.dtype)
            y = y + (b if nhwc else b[None, :, None, None])
        return y


class _RingConvW2C(nn.Module):
    """3x3 ring conv on a width-pair-merged tensor (ops/w2c.py): a 3x2 conv
    with the block-expanded kernel, full 128-lane outputs for the 64-channel
    level. Params stay in the ORIGINAL (3, 3, C, F) HWIO shape (weight-tree
    compatible with the NHWC path and torch import).

    ``align_in`` names the input phase alignment: "aligned" pads left and
    produces "offset" output; "offset" pads right and produces "aligned"
    (see ops/w2c.py docstring). The ring wrap is one boundary-column
    correction added via the same zero-pad trick as _RingConv3x3.
    """

    features: int  # ORIGINAL output channels; merged output is 2x
    align_in: str = "offset"
    use_bias: bool = True
    zero_init: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.align_in in ("aligned", "offset"), self.align_in
        C_in = x.shape[-1] // 2
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        kernel = self.param("kernel", kernel_init, (3, 3, C_in, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        km = w2c.expand_kernel_3x3(kernel)  # (3, 2, 2C, 2F)
        dn = ("NHWC", "HWIO", "NHWC")
        Wm = x.shape[2]
        if self.align_in == "aligned":
            pad_w = (1, 0)
            # output col 0 misses input col W'-1 through tap 0
            col, ktap = x[:, :, -1:, :], km[:, 0:1]
            corr_pad = ((0, 0), (0, 0), (0, Wm - 1), (0, 0))
        else:
            pad_w = (0, 1)
            # output col W'-1 misses input col 0 through tap 1
            col, ktap = x[:, :, 0:1, :], km[:, 1:2]
            corr_pad = ((0, 0), (0, 0), (Wm - 1, 0), (0, 0))
        y = jax.lax.conv_general_dilated(
            x, km, (1, 1), ((1, 1), pad_w), dimension_numbers=dn
        )
        corr = jax.lax.conv_general_dilated(
            col, ktap, (1, 1), ((1, 1), (0, 0)), dimension_numbers=dn
        )
        y = y + jnp.pad(corr, corr_pad)
        if bias is not None:
            y = y + jnp.tile(bias.astype(y.dtype), 2)
        return y


class _Conv1x1W2C(nn.Module):
    """1x1 conv on a merged tensor: block-diagonal (alignment-preserving).
    Params stay in the original (1, 1, C, F) HWIO shape."""

    features: int
    use_bias: bool = True
    zero_init: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C_in = x.shape[-1] // 2
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        kernel = self.param("kernel", kernel_init, (1, 1, C_in, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, w2c.expand_kernel_1x1(kernel), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + jnp.tile(bias.astype(y.dtype), 2)
        return y


class _Conv1x1NCHW(nn.Module):
    """1x1 conv in channels-major layout; params stored HWIO like nn.Conv."""

    features: int
    use_bias: bool = True
    zero_init: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C_in = x.shape[1]
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        kernel = self.param("kernel", kernel_init, (1, 1, C_in, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, jnp.transpose(kernel, (3, 2, 0, 1)), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)[None, :, None, None]
        return y


class RingConv(nn.Module):
    """3x3 (or any) conv with circular W / zero H padding.

    Equivalent to reference ops.Conv2d (models/ops.py:149-173). The common
    3x3/stride-1 case takes the wrap-correction fast path (_RingConv3x3);
    other shapes materialize the ring pad.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    stride: int = 1
    padding: int = 1
    ring: bool = True
    use_bias: bool = True
    zero_init: bool = False
    data_format: str = "NHWC"
    align_in: str = "offset"  # W2C only: input phase alignment
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, prologue=None, fused_resample=None
    ) -> jnp.ndarray:
        if prologue is not None or fused_resample is not None:
            assert (
                self.data_format == "NHWC"
                and self.ring
                and tuple(self.kernel_size) == (3, 3)
                and self.stride == 1
                and self.padding == 1
            ), "prologue/resample fusion only on the 3x3 ring NHWC path"
        if self.data_format == "W2C":
            # width-pair-merged level (ops/w2c.py); ring is implied
            assert self.ring, "W2C implements ring convolutions only"
            if tuple(self.kernel_size) == (3, 3):
                assert self.stride == 1 and self.padding == 1
                return _RingConvW2C(
                    features=self.features,
                    align_in=self.align_in,
                    use_bias=self.use_bias,
                    zero_init=self.zero_init,
                    dtype=self.dtype,
                    name="conv",
                )(x)
            assert tuple(self.kernel_size) == (1, 1) and self.padding == 0
            return _Conv1x1W2C(
                features=self.features,
                use_bias=self.use_bias,
                zero_init=self.zero_init,
                dtype=self.dtype,
                name="conv",
            )(x)
        if (
            self.ring
            and tuple(self.kernel_size) == (3, 3)
            and self.stride == 1
            and self.padding == 1
        ):
            return _RingConv3x3(
                features=self.features,
                use_bias=self.use_bias,
                zero_init=self.zero_init,
                data_format=self.data_format,
                dtype=self.dtype,
                name="conv",
            )(x, prologue=prologue, fused_resample=fused_resample)
        if self.data_format == "NCHW":
            # channels-major levels only need 3x3 (above) and 1x1 convs
            assert tuple(self.kernel_size) == (1, 1) and self.padding == 0
            return _Conv1x1NCHW(
                features=self.features,
                use_bias=self.use_bias,
                zero_init=self.zero_init,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.padding:
            x = ring_pad(x, self.padding, ring=self.ring)
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.stride,
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)


def group_norm_coeffs(
    x: jnp.ndarray,
    num_groups: int,
    eps: float,
    data_format: str = "NHWC",
    phases: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(batch, channel) fp32 (a, b) such that GN(x) == x * a + b.

    Variance uses the single-read E[x^2] - E[x]^2 form so both sums fuse
    into ONE pass over the activation (the group-reshaped two-pass reduce
    was 53% of U-Net device time). fp32 accumulation keeps this accurate for
    |mean|/std up to ~1e3 — comfortably true for this network's normalized
    activations ([-1,1] diffusion inputs; every block re-normalizes). Do not
    reuse for data with a large common offset.

    ``phases`` > 1: the channel axis is a phase-blocked width-pair merge
    (ops/w2c.py) — each group's statistics pool its channels across ALL
    phase blocks, reproducing the unmerged GroupNorm exactly.
    """
    if data_format in ("NHWC", "W2C"):
        B, H, W, C = x.shape
        spatial_axes = (1, 2)
    else:  # NCHW (channels-major levels)
        B, C, H, W = x.shape
        spatial_axes = (2, 3)
        assert phases == 1
    G = num_groups
    P = phases
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=spatial_axes)  # (B, C) fp32
    s2 = jnp.sum(jnp.square(xf), axis=spatial_axes)
    cnt = H * W * (C // G)  # elements per group (merged W is W/P, C is P*C0)
    g1 = s1.reshape(B, P, G, -1).sum((1, 3)) / cnt  # (B, G) group mean
    g2 = s2.reshape(B, P, G, -1).sum((1, 3)) / cnt
    var = jnp.maximum(g2 - jnp.square(g1), 0.0)
    inv = jax.lax.rsqrt(var + eps)  # (B, G)
    shape = (B, P, G, C // (P * G))
    a = jnp.broadcast_to(inv[:, None, :, None], shape).reshape(B, C)
    b = jnp.broadcast_to((-g1 * inv)[:, None, :, None], shape).reshape(B, C)
    return a, b


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    eps: float,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """GroupNorm over (H, W, C//G) per group with fp32 statistics.

    Matches torch nn.GroupNorm semantics on NCHW (stats over C//G*H*W).
    TPU-bandwidth-minimal formulation: two fp32 reductions (the input cast
    fuses into the reduce — no fp32 copy of the activation materializes) and
    ONE fused-multiply-add pass ``y = x*a + b`` with the normalization and
    affine folded into per-(batch, channel) coefficients.
    """
    a, b = group_norm_coeffs(x, num_groups, eps)
    if scale is not None:
        s = scale.astype(jnp.float32)
        a = a * s
        b = b * s
    if bias is not None:
        b = b + bias.astype(jnp.float32)
    # fp32 FMA with one final rounding (torch GroupNorm computes fp32)
    y = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    return y.astype(x.dtype)


# Use the fused GroupNorm+SiLU Pallas kernel (ops/pallas_gn.py) where the
# activation slab fits VMEM. Inference-only for now (the kernel has no VJP);
# bench/sampling paths enable it explicitly.
USE_PALLAS_GN = False

# Use the fused (GN/AdaGN+SiLU)+ring-conv Pallas kernel
# (ops/pallas_resconv.py) inside ResidualBlock where supported (level-1
# 64-channel shapes). Inference-gated: no VJP yet; the training path keeps
# the XLA lowering. PALLAS_RESCONV_INTERPRET is a test hook (CPU interpret).
USE_PALLAS_RESCONV = False
PALLAS_RESCONV_INTERPRET = False

# Fuse level-boundary convs with their FIR resamples into single convs
# (ops/fused_resample.py): exact linear composition, differentiable.
# Granular: True/"both", "down", "up", or False. Measured on the v5e (b256
# fwd, per-image): off 2.102 ms, down-only 2.085 (+0.8%), up-only 2.230
# (-6%: XLA does not exploit the dilation zeros of the composed lhs-dilated
# conv), both 2.218. Default = "down" by measurement; "up" kept as a knob.
FUSED_RESAMPLE = "down"


def _folded_gn_coeffs(x, num_groups, eps, gain, shift, data_format, phases=1):
    """fp32 (a, b) per (batch, channel) with the affine folded in, such that
    GN_affine(x) == x * a + b (see group_norm_coeffs)."""
    a, b = group_norm_coeffs(x, num_groups, eps, data_format, phases=phases)
    g = gain.astype(jnp.float32)
    s = shift.astype(jnp.float32)
    if g.ndim == 1:
        g, s = g[None], s[None]
    if phases > 1:
        g = jnp.tile(g, (1, phases))
        s = jnp.tile(s, (1, phases))
    return a * g, b * g + s


# Compute dtype of the GN/AdaGN FMA+SiLU pass (probes: tools/probe_trainstep
# .py, tools/probe_sampling.py). None (default) = follow the activation
# dtype: fp32 models (goldens, validate_pretrained) keep torch-GroupNorm
# fp32 parity, bf16 models run the pass in bf16. The fp32 pass already
# rounds its RESULT to x.dtype, so bf16 compute only changes the forward by
# ~1 bf16 ulp — but it stops XLA materializing fp32 copies of the norm
# chains: measured +10.6% b256 sampling (2.028 -> 1.824 ms/img-step, round
# 3) and +4.9% b32 train step; the backward also drops the fp32
# activation-sized cotangent buffers (the training-HBM lever at the 64-lane
# levels). Set to jnp.float32 to force the old behavior (config
# training.gn_bf16=False does this for training).
GN_ACT_COMPUTE_DTYPE = None


def _gn_act(x, num_groups, eps, gain, shift, silu: bool, data_format="NHWC"):
    """GroupNorm + optional SiLU, via the Pallas kernel when enabled.

    data_format "W2C": channels-last width-pair-merged layout — statistics
    pool each group across the two phase blocks (ops/w2c.py); ``gain`` /
    ``shift`` are given per ORIGINAL channel and tiled over phases.
    """
    from ..ops import pallas_gn

    if data_format == "NHWC" and USE_PALLAS_GN and pallas_gn.supported(x):
        return pallas_gn.fused_group_norm_silu(
            x, gain, shift, num_groups, eps, apply_silu=silu
        )
    phases = 2 if data_format == "W2C" else 1
    # XLA path: fold normalization + (possibly per-batch) affine into one FMA
    a, b = _folded_gn_coeffs(x, num_groups, eps, gain, shift, data_format, phases)
    if data_format in ("NHWC", "W2C"):
        a, b = a[:, None, None, :], b[:, None, None, :]
    else:
        a, b = a[:, :, None, None], b[:, :, None, None]
    cd = GN_ACT_COMPUTE_DTYPE if GN_ACT_COMPUTE_DTYPE is not None else x.dtype
    y = x.astype(cd) * a.astype(cd) + b.astype(cd)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


class GroupNorm(nn.Module):
    """Affine GroupNorm (torch nn.GroupNorm parity); optional fused SiLU."""

    num_groups: int
    eps: float = 1e-6
    silu: bool = False
    data_format: str = "NHWC"

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_coeffs: bool = False):
        if self.data_format == "W2C":
            C = x.shape[-1] // 2  # params per ORIGINAL channel
        elif self.data_format == "NHWC":
            C = x.shape[-1]
        else:
            C = x.shape[1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if return_coeffs:
            # folded fp32 (a, b): GN_affine(x) == x*a + b — consumed by the
            # fused Pallas conv prologue (ops/pallas_resconv.py)
            return _folded_gn_coeffs(
                x, self.num_groups, self.eps, scale, bias, self.data_format,
                phases=2 if self.data_format == "W2C" else 1,
            )
        return _gn_act(
            x, self.num_groups, self.eps, scale, bias, self.silu,
            self.data_format,
        )


class AdaGN(nn.Module):
    """Adaptive GroupNorm: affine params predicted from the time embedding.

    Matches reference ops.AdaGN (models/ops.py:176-200): non-affine GN, then
    h * (1 + scale) + shift with (scale, shift) = Linear(SiLU(emb)).
    """

    num_groups: int
    eps: float = 1e-6
    silu: bool = False
    data_format: str = "NHWC"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray, return_coeffs: bool = False):
        if self.data_format == "W2C":
            C = x.shape[-1] // 2  # proj predicts per ORIGINAL channel
        elif self.data_format == "NHWC":
            C = x.shape[-1]
        else:
            C = x.shape[1]
        ss = nn.Dense(2 * C, dtype=self.dtype, name="proj")(nn.silu(emb))
        scale, shift = jnp.split(ss, 2, axis=-1)  # (B, C) each
        # GN(x)*(1+scale) + shift folded into one x*a + b pass (+ optional
        # fused SiLU via the Pallas kernel)
        gain = 1.0 + scale.astype(jnp.float32)
        if return_coeffs:
            return _folded_gn_coeffs(
                x, self.num_groups, self.eps, gain,
                shift.astype(jnp.float32), self.data_format,
                phases=2 if self.data_format == "W2C" else 1,
            )
        return _gn_act(
            x, self.num_groups, self.eps, gain, shift.astype(jnp.float32),
            self.silu, self.data_format,
        )


class SelfAttention(nn.Module):
    """Multi-head self-attention over the (H*W) token grid.

    Math-parity with torch nn.MultiheadAttention (batch_first): packed
    qkv projection, scaled dot-product with 1/sqrt(head_dim), output
    projection (zero-initialized per reference models/efficient_unet.py:39).
    At the 8x128 bottleneck this is 1024 tokens; XLA's fused attention is
    already near-roofline at this size.
    """

    num_heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = x.reshape(B, H * W, C)
        qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.lecun_normal(), (C, 3 * C)
        )
        qkv_bias = self.param("qkv_bias", nn.initializers.zeros, (3 * C,))
        qkv = h @ qkv_kernel.astype(h.dtype) + qkv_bias.astype(h.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // self.num_heads

        def heads(t):
            return t.reshape(B, H * W, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        # NOTE: the Pallas TPU flash_attention kernel was measured SLOWER
        # here (1.31 vs 1.47 img/s end-to-end) — at 1024 bottleneck tokens
        # XLA's attention is already efficient; don't swap it out.
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        weights = nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, H * W, C)
        out = nn.Dense(
            C, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="out_proj"
        )(out)
        return out.reshape(B, H, W, C)


class SelfAttentionBlock(nn.Module):
    """Pre-norm attention with (x + attn(norm(x))) * 1/sqrt(2) residual.

    Matches reference SelfAttentionBlock (models/efficient_unet.py:23-53).
    """

    num_heads: int
    gn_num_groups: int = 8
    gn_eps: float = 1e-6
    scale: float = float(1 / np.sqrt(2))
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = GroupNorm(self.gn_num_groups, self.gn_eps, name="norm")(x)
        h = SelfAttention(self.num_heads, dtype=self.dtype, name="attn")(h)
        return (x + h) * jnp.asarray(self.scale, x.dtype)


class ResidualBlock(nn.Module):
    """GN-SiLU-Conv x2 residual block with AdaGN time conditioning.

    Matches reference ResidualBlock (models/efficient_unet.py:56-110):
    zero-initialized second conv, 1x1 skip when channels change, and the
    (skip + residual) * 1/sqrt(2) scaling.
    """

    out_channels: int
    gn_num_groups: int = 8
    gn_eps: float = 1e-6
    scale: float = float(1 / np.sqrt(2))
    dropout: float = 0.0
    ring: bool = True
    data_format: str = "NHWC"
    align_in: str = "offset"  # W2C only; output alignment == align_in (2 convs)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        df = self.data_format
        if df == "W2C":
            in_channels = x.shape[-1] // 2
            align_mid = "aligned" if self.align_in == "offset" else "offset"
        else:
            in_channels = x.shape[-1] if df == "NHWC" else x.shape[1]
            align_mid = self.align_in
        # Fused path (inference): fold each GN/AdaGN+SiLU into its conv's
        # prologue — the Pallas kernel runs them in one VMEM residency with
        # lane-packed matmuls (ops/pallas_resconv.py); unsupported shapes
        # fall back to the identical-math XLA lowering inside RingConv.
        fused = (
            USE_PALLAS_RESCONV
            and df == "NHWC"
            and self.ring
            and (self.dropout == 0.0 or deterministic)
        )
        if fused:
            coeffs1 = GroupNorm(
                self.gn_num_groups, self.gn_eps, silu=True, data_format=df,
                name="norm1",
            )(x, return_coeffs=True)
            h = RingConv(
                self.out_channels, ring=self.ring, data_format=df,
                align_in=self.align_in, dtype=self.dtype, name="conv1",
            )(x, prologue=coeffs1)
            if emb is not None:
                coeffs2 = AdaGN(
                    self.gn_num_groups, self.gn_eps, silu=True, data_format=df,
                    dtype=self.dtype, name="norm2",
                )(h, emb, return_coeffs=True)
            else:
                coeffs2 = GroupNorm(
                    self.gn_num_groups, self.gn_eps, silu=True, data_format=df,
                    name="norm2",
                )(h, return_coeffs=True)
            h = RingConv(
                self.out_channels, ring=self.ring, zero_init=True,
                data_format=df, align_in=align_mid, dtype=self.dtype,
                name="conv2",
            )(h, prologue=coeffs2)
        else:
            h = GroupNorm(
                self.gn_num_groups, self.gn_eps, silu=True, data_format=df,
                name="norm1",
            )(x)
            h = RingConv(
                self.out_channels, ring=self.ring, data_format=df,
                align_in=self.align_in, dtype=self.dtype, name="conv1",
            )(h)
            if emb is not None:
                h = AdaGN(
                    self.gn_num_groups, self.gn_eps, silu=True, data_format=df,
                    dtype=self.dtype, name="norm2",
                )(h, emb)
            else:
                h = GroupNorm(
                    self.gn_num_groups, self.gn_eps, silu=True, data_format=df,
                    name="norm2",
                )(h)
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = RingConv(
                self.out_channels,
                ring=self.ring,
                zero_init=True,
                data_format=df,
                align_in=align_mid,
                dtype=self.dtype,
                name="conv2",
            )(h)
        if in_channels != self.out_channels:
            skip = RingConv(
                self.out_channels,
                kernel_size=(1, 1),
                padding=0,
                data_format=df,
                dtype=self.dtype,
                name="skip",
            )(x)
        else:
            skip = x
        return (skip + h) * jnp.asarray(self.scale, h.dtype)
