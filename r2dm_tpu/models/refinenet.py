"""LiDARGen RefineNet denoiser (NCSN-style), flax/NHWC.

Behavior-matches the reference ``models/refinenet.py:16-233``: circular
convs (both axes), InstanceNorm2d+ normalization, dilated residual blocks
(levels 3/4 dilate instead of downsampling), RefineNet decoder with
residual conv units + chained residual pooling, and bilinear
align_corners=True feature fusion. The timestep input is ignored — the
reference LiDARGen baseline conditions on nothing (refinenet.py:214).

TPU notes: the align-corners upsampling is expressed as two small
interpolation matmuls (MXU-friendly); max/avg pools are
``lax.reduce_window``; instance statistics run fp32.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def circular_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """torch padding_mode='circular': wrap BOTH H and W (refinenet.py:16-18;
    unlike the EfficientUNet ring pad which zero-pads H)."""
    if p == 0:
        return x
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="wrap")


class CircularConv(nn.Module):
    features: int
    kernel: int = 3
    padding: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = circular_pad(x, self.padding)
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="VALID",
            kernel_dilation=self.dilation,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class InstanceNormPlus(nn.Module):
    """InstanceNorm2d+ (NCSNv2): non-affine instance norm scaled by the
    batch-normalized per-channel means, then a per-channel affine
    (refinenet.py:21-40)."""

    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]

        def ones_normal(key, shape, dtype=jnp.float32):
            # torch: .normal_(mean=1, std=0.02) (refinenet.py:29-30)
            return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)

        alpha = self.param("alpha", ones_normal, (C,))
        scale = self.param("scale", ones_normal, (C,))
        bias = (
            self.param("bias", nn.initializers.zeros, (C,)) if self.use_bias else 0.0
        )
        xf = x.astype(jnp.float32)
        mean_hw = xf.mean(axis=(1, 2), keepdims=True)  # (B,1,1,C)
        # channel-wise standardization of the means (unbiased var, ref :36)
        m = mean_hw.mean(axis=-1, keepdims=True)
        v = mean_hw.var(axis=-1, keepdims=True, ddof=1)
        mean_n = (mean_hw - m) / jnp.sqrt(v + 1e-5)
        inst = (xf - mean_hw) * jax.lax.rsqrt(xf.var(axis=(1, 2), keepdims=True) + 1e-5)
        h = inst * alpha * mean_n
        h = h * scale + bias
        return h.astype(x.dtype)


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def max_pool5(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(5, 1, 2): -inf padding, stride 1 (refinenet.py:121)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 5, 5, 1),
        (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)],
    )


def bilinear_align_corners(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """F.interpolate(mode='bilinear', align_corners=True) as two
    interpolation matmuls (refinenet.py:151)."""
    B, H, W, C = x.shape
    out_h, out_w = size
    if (H, W) == (out_h, out_w):
        return x

    def interp_matrix(n_in: int, n_out: int) -> jnp.ndarray:
        if n_out == 1 or n_in == 1:
            # torch align_corners=True with a size-1 dim selects index 0
            m = jnp.zeros((n_out, n_in), jnp.float32)
            return m.at[:, 0].set(1.0)
        src = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        w_hi = src - lo
        m = jnp.zeros((n_out, n_in), jnp.float32)
        m = m.at[jnp.arange(n_out), lo].add(1.0 - w_hi)
        m = m.at[jnp.arange(n_out), hi].add(w_hi)
        return m

    mh = interp_matrix(H, out_h).astype(x.dtype)
    mw = interp_matrix(W, out_w).astype(x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


class RNResidualBlock(nn.Module):
    """norm-ELU-conv x2 with optional dilation / avg-pool downsample
    (refinenet.py:43-94)."""

    in_channels: int
    out_channels: int
    resample: Optional[str] = None
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.in_channels if self.resample == "down" else self.out_channels
        kw = dict(padding=self.dilation, dilation=self.dilation, dtype=self.dtype)
        h = InstanceNormPlus(name="norm1")(x)
        h = nn.elu(h)
        h = CircularConv(mid, **kw, name="conv1")(h)
        h = InstanceNormPlus(name="norm2")(h)
        h = nn.elu(h)
        h = CircularConv(self.out_channels, **kw, name="conv2")(h)

        pool = self.dilation == 1 and self.resample is not None
        if pool:
            h = avg_pool2(h)
        if self.in_channels != self.out_channels or self.resample is not None:
            if self.dilation == 1:
                skip = CircularConv(
                    self.out_channels, kernel=1, padding=0, dtype=self.dtype,
                    name="skip",
                )(x)
            else:
                skip = CircularConv(
                    self.out_channels, kernel=3, padding=self.dilation,
                    dilation=self.dilation, dtype=self.dtype, name="skip",
                )(x)
            if pool:
                skip = avg_pool2(skip)
        else:
            skip = x
        return skip + h


class ResidualConvUnit(nn.Module):
    """num_blocks x (x + conv(elu(conv(elu(x))))) (refinenet.py:97-111)."""

    channels: int
    num_blocks: int = 2
    num_stages: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_blocks):
            h = x
            for k in range(self.num_stages):
                h = nn.elu(h)
                h = CircularConv(
                    self.channels, use_bias=False, dtype=self.dtype,
                    name=f"unit{j}_stage{k}",
                )(h)
            x = x + h
        return x


class ChainedResidualPooling(nn.Module):
    """h = elu(x); h += conv(maxpool(h)) per stage (refinenet.py:114-130)."""

    channels: int
    num_stages: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.elu(x)
        for i in range(self.num_stages):
            p = max_pool5(h)
            p = CircularConv(
                self.channels, use_bias=False, dtype=self.dtype, name=f"conv{i}"
            )(p)
            h = h + p
        return h


class RefineBlock(nn.Module):
    """Multi-resolution fusion + CRP + output RCUs (refinenet.py:133-154)."""

    in_channels: Sequence[int]
    out_channels: int
    num_end_blocks: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], shape: tuple[int, int]):
        h = 0.0
        for i, x in enumerate(xs):
            y = ResidualConvUnit(
                self.in_channels[i], dtype=self.dtype, name=f"adapt{i}_rcu"
            )(x)
            if len(xs) > 1:
                y = CircularConv(
                    self.out_channels, dtype=self.dtype, name=f"adapt{i}_proj"
                )(y)
            h = h + bilinear_align_corners(y, shape)
        h = ChainedResidualPooling(self.out_channels, dtype=self.dtype, name="crp")(h)
        h = ResidualConvUnit(
            self.out_channels,
            num_blocks=self.num_end_blocks,
            dtype=self.dtype,
            name="output_rcu",
        )(h)
        return h


class LiDARGenRefineNet(nn.Module):
    """__call__(images NHWC, timesteps) -> NHWC; timesteps ignored
    (reference refinenet.py:157-233)."""

    in_channels: int = 2
    resolution: tuple[int, int] = (64, 1024)
    out_channels: Optional[int] = None
    base_channels: int = 128
    channel_multiplier: Sequence[int] = (1, 2, 2, 2)
    coords_encoding: str = "polar_coordinates"  # fixed in the reference
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        timesteps: Optional[jnp.ndarray] = None,
        deterministic: bool = True,  # accepted for trainer uniformity; the
        # reference RefineNet has no dropout (refinenet.py:157-233)
    ) -> jnp.ndarray:
        B, H, W, _ = images.shape
        # [0,1]-normalized (phi, theta) grid buffer (refinenet.py:175-181)
        coords = self.variable(
            "buffers",
            "coords",
            lambda: jnp.asarray(
                np.stack(
                    np.meshgrid(
                        np.linspace(0, 1, self.resolution[0], dtype=np.float32),
                        np.linspace(0, 1, self.resolution[1], dtype=np.float32),
                        indexing="ij",
                    ),
                    axis=-1,
                )
            ),
        ).value
        h = jnp.concatenate(
            [images, jnp.broadcast_to(coords[None], (B, H, W, 2)).astype(images.dtype)],
            axis=-1,
        )

        C = [self.base_channels] + [
            self.base_channels * m for m in self.channel_multiplier
        ]
        # plain zero-padded conv (reference uses nn.Conv2d here, :187)
        h = nn.Conv(C[0], (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h)
        h1 = RNResidualBlock(C[0], C[1], dtype=self.dtype, name="d_block1_0")(h)
        h1 = RNResidualBlock(C[1], C[1], dtype=self.dtype, name="d_block1_1")(h1)
        h2 = RNResidualBlock(C[1], C[2], resample="down", dtype=self.dtype, name="d_block2_0")(h1)
        h2 = RNResidualBlock(C[2], C[2], dtype=self.dtype, name="d_block2_1")(h2)
        h3 = RNResidualBlock(C[2], C[3], resample="down", dilation=2, dtype=self.dtype, name="d_block3_0")(h2)
        h3 = RNResidualBlock(C[3], C[3], dilation=2, dtype=self.dtype, name="d_block3_1")(h3)
        h4 = RNResidualBlock(C[3], C[4], resample="down", dilation=4, dtype=self.dtype, name="d_block4_0")(h3)
        h4 = RNResidualBlock(C[4], C[4], dilation=4, dtype=self.dtype, name="d_block4_1")(h4)

        u = RefineBlock([C[4]], C[3], dtype=self.dtype, name="u_block4")(
            [h4], h4.shape[1:3]
        )
        u = RefineBlock([C[3], C[3]], C[2], dtype=self.dtype, name="u_block3")(
            [h3, u], h3.shape[1:3]
        )
        u = RefineBlock([C[2], C[2]], C[1], dtype=self.dtype, name="u_block2")(
            [h2, u], h2.shape[1:3]
        )
        u = RefineBlock([C[1], C[1]], C[0], num_end_blocks=3, dtype=self.dtype, name="u_block1")(
            [h1, u], h1.shape[1:3]
        )
        u = InstanceNormPlus(name="out_norm")(u)
        u = nn.elu(u)
        out_ch = self.in_channels if self.out_channels is None else self.out_channels
        u = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="out_conv")(u)
        return u.astype(jnp.float32)
