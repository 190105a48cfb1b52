"""Efficient U-Net denoiser (flax.linen, NHWC, TPU-native).

Re-design of the reference EfficientUNet (models/efficient_unet.py:188-295):
the Imagen "Efficient U-Net" with LiDAR modifications — circular ("ring")
horizontal padding everywhere, AdaGN timestep conditioning, self-attention
only at the 8x128 bottleneck, concat skip connections, zero-init output
convs, 1/sqrt(2) residual scaling, and a spatial coordinate encoding
concatenated to the input.

TPU-first choices:
  - NHWC layout; convs via lax.conv_general_dilated (MXU).
  - compute dtype configurable (bf16 by default under the trainer) with
    fp32 GroupNorm statistics and fp32 params.
  - FIR up/down-sampling lowered to single dilated/strided convs
    (see ops/resample.py).
  - the per-pixel coordinate grid lives in the 'buffers' variable
    collection (the analogue of the reference's ``register_buffer``), so the
    encoding constant-folds at jit time.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import encoding as enc
from ..ops import w2c
from ..ops.resample import downsample2x, upsample2x
from .layers import ResidualBlock, RingConv, SelfAttentionBlock

Dtype = Any


class TimeEmbedding(nn.Module):
    """Sinusoidal embedding -> Linear -> SiLU -> Linear.

    Matches reference models/efficient_unet.py:232-237 (ops.py:14-29).
    """

    base_channels: int
    temb_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        h = enc.timestep_embedding(t, self.base_channels)
        h = nn.Dense(self.temb_channels, dtype=self.dtype, name="dense1")(h)
        h = nn.silu(h)
        h = nn.Dense(self.temb_channels, dtype=self.dtype, name="dense2")(h)
        return h


class UNetBlock(nn.Module):
    """One U-Net level: [down] -> resblocks -> [attn] -> [up].

    Matches reference Block (models/efficient_unet.py:113-185).
    """

    out_channels: int
    num_residual_blocks: int
    gn_num_groups: int = 8
    gn_eps: float = 1e-6
    attn: bool = False
    attn_num_heads: int = 8
    up: int = 1
    down: int = 1
    dropout: float = 0.0
    ring: bool = True
    data_format: str = "NHWC"
    align_in: str = "offset"  # W2C levels: resblock phase alignment
    # NHWC up-block feeding a W2C level: the FIR upsample, the width-pair
    # merge AND the up_conv compose into one conv emitting ALIGNED merged
    # output (ops/fused_resample.upsample_then_conv_merged) — the standalone
    # merge re-tiles at ~100-145 GB/s (tools/probe_level1.py)
    w2c_up: bool = False
    # NHWC down-block RECEIVING a W2C level's output: down_conv + FIR-down
    # consume the ALIGNED merged input directly (stride-2 unmerged == dense
    # stride-1 merged; ops/fused_resample.conv_then_downsample_merged), so
    # the unmerge pass disappears
    w2c_down: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,
        temb: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.data_format in ("NCHW", "W2C"):
            # alternative-layout levels are the resample/attention-free
            # outermost one only
            assert self.down == 1 and self.up == 1 and not self.attn
        from .layers import FUSED_RESAMPLE

        if self.down > 1:
            if self.w2c_down:
                # input is the W2C level's ALIGNED merged tensor; the merged
                # composition is required for correctness (not gated on the
                # FUSED_RESAMPLE perf knob)
                h = RingConv(
                    self.out_channels, ring=self.ring, dtype=self.dtype,
                    name="down_conv",
                )(h, fused_resample="down_merged")
            elif FUSED_RESAMPLE in (True, "both", "down") and self.ring:
                # conv + FIR downsample composed into one stride-2 conv
                # (exact; ops/fused_resample.py)
                h = RingConv(
                    self.out_channels, ring=self.ring, dtype=self.dtype,
                    name="down_conv",
                )(h, fused_resample="down")
            else:
                h = RingConv(
                    self.out_channels, ring=self.ring, dtype=self.dtype,
                    name="down_conv",
                )(h)
                h = downsample2x(h, ring=self.ring)
        for i in range(self.num_residual_blocks):
            h = ResidualBlock(
                out_channels=self.out_channels,
                gn_num_groups=self.gn_num_groups,
                gn_eps=self.gn_eps,
                dropout=self.dropout,
                ring=self.ring,
                data_format=self.data_format,
                align_in=self.align_in,
                dtype=self.dtype,
                name=f"res{i}",
            )(h, temb, deterministic=deterministic)
        if self.attn:
            h = SelfAttentionBlock(
                num_heads=self.attn_num_heads,
                gn_num_groups=self.gn_num_groups,
                gn_eps=self.gn_eps,
                dtype=self.dtype,
                name="attn",
            )(h)
        if self.up > 1:
            if self.w2c_up:
                h = RingConv(
                    self.out_channels, ring=self.ring, dtype=self.dtype,
                    name="up_conv",
                )(h, fused_resample="up_merged")  # -> merged, ALIGNED
            elif FUSED_RESAMPLE in (True, "both", "up") and self.ring:
                # FIR upsample + conv composed into one dilated conv
                h = RingConv(
                    self.out_channels, ring=self.ring, dtype=self.dtype,
                    name="up_conv",
                )(h, fused_resample="up")
            else:
                h = upsample2x(h, ring=self.ring)
                h = RingConv(
                    self.out_channels, ring=self.ring, dtype=self.dtype,
                    name="up_conv",
                )(h)
        return h


class EfficientUNet(nn.Module):
    """The flagship denoiser. __call__(images NHWC, timesteps (B,)) -> NHWC."""

    in_channels: int = 2
    resolution: tuple[int, int] = (64, 1024)
    out_channels: Optional[int] = None
    base_channels: int = 64
    temb_channels: Optional[int] = None
    channel_multiplier: Sequence[int] = (1, 2, 4, 8)
    num_residual_blocks: Sequence[int] = (3, 3, 3, 3)
    gn_num_groups: int = 8
    gn_eps: float = 1e-6
    attn_num_heads: int = 8
    coords_encoding: Optional[str] = "fourier_features"
    dropout: float = 0.0
    ring: bool = True
    dtype: Optional[Dtype] = None
    # rematerialize each U-Net level on the backward pass (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for O(levels) activation memory,
    # enabling larger per-chip batches (HBM is the usual TPU bottleneck)
    remat: bool = False
    # remat ONLY the outermost (level-1) blocks: their activations are the
    # largest (full 64x1024 resolution) while their FLOPs are the cheapest
    # per byte, so selective remat frees most of the activation memory for a
    # fraction of whole-net remat's recompute cost (which measured negative,
    # NEXT.md). Composable with neither `remat` (subsumed) nor a reason to:
    # whole-net remat wins only when HBM, not time, is the binding constraint
    remat_level1: bool = False
    # run the outermost (64-channel) level in channels-major (B,C,H,W)
    # layout (W in MXU lanes instead of C_out=64). Mathematically identical;
    # two layout transposes at the level-1/2 boundary. Measured round 1:
    # NEUTRAL-to-slightly-slower in the integrated sampler (XLA's layout
    # assignment already handles level 1 there), despite winning in a
    # standalone A/B — kept as an experiment knob, default off.
    channels_major_l1: bool = False
    # run the outermost level width-pair-merged: (B, 64, W/2, 128) tensors,
    # 3x2 block-kernel ring convs (ops/w2c.py). Exact math, 1.33x level-1
    # conv FLOPs, but full 128-lane MXU outputs instead of 64 — the level-1
    # convs were the round-1 bottleneck (44% of step time at ~30% MFU).
    width_merge_l1: bool = False

    def coords_channels(self) -> int:
        if self.coords_encoding == "spherical_harmonics":
            return 25
        if self.coords_encoding == "polar_coordinates":
            return 2
        if self.coords_encoding == "fourier_features":
            return enc.fourier_features_channels(tuple(self.resolution))
        return 0

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        timesteps: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B = images.shape[0]
        temb_ch = (
            self.base_channels * 4 if self.temb_channels is None else self.temb_channels
        )
        h = images

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (B,))
        temb = TimeEmbedding(
            self.base_channels, temb_ch, dtype=self.dtype, name="time_embedding"
        )(timesteps)

        # spatial coordinate buffer, (H, W, 2): defaults to the polar grid
        # (reference models/efficient_unet.py:218-219); overridden with the
        # sensor ray angles by the trainer (reference train.py:100-107).
        coords = self.variable(
            "buffers",
            "coords",
            lambda: jnp.asarray(enc.generate_polar_coords(*self.resolution)),
        ).value
        if self.coords_encoding == "spherical_harmonics":
            cenc = enc.spherical_harmonics(coords, levels=5)
        elif self.coords_encoding == "polar_coordinates":
            cenc = coords
        elif self.coords_encoding == "fourier_features":
            freqs = jnp.asarray(
                enc.fourier_feature_frequencies(tuple(self.resolution))
            )
            cenc = enc.fourier_features(coords, freqs)
        elif self.coords_encoding is None:
            cenc = None
        else:
            raise ValueError(f"unknown coords_encoding: {self.coords_encoding}")
        if cenc is not None:
            cenc = jnp.broadcast_to(cenc[None], (B, *cenc.shape)).astype(h.dtype)
            h = jnp.concatenate([h, cenc], axis=-1)

        C = [self.base_channels] + [
            self.base_channels * m for m in self.channel_multiplier
        ]
        N = tuple(self.num_residual_blocks)
        cfg = dict(
            gn_num_groups=self.gn_num_groups,
            gn_eps=self.gn_eps,
            attn_num_heads=self.attn_num_heads,
            dropout=self.dropout,
            ring=self.ring,
            dtype=self.dtype,
        )

        # static_argnums: `deterministic` must stay a Python bool under remat
        # (flax Dropout branches on it)
        Block = (
            nn.remat(UNetBlock, static_argnums=(3,)) if self.remat else UNetBlock
        )
        # level-1-only remat (see remat_level1 above)
        BlockL1 = (
            nn.remat(UNetBlock, static_argnums=(3,))
            if (self.remat or self.remat_level1)
            else UNetBlock
        )
        if (self.channels_major_l1 or self.width_merge_l1) and not self.ring:
            raise ValueError(
                "channels_major_l1 / width_merge_l1 require ring convolutions "
                "(the alternative-layout paths only implement the ring "
                "3x3 / 1x1 cases)"
            )
        if self.channels_major_l1 and self.width_merge_l1:
            raise ValueError(
                "channels_major_l1 and width_merge_l1 are mutually exclusive"
            )
        l1_df = "NCHW" if self.channels_major_l1 else (
            "W2C" if self.width_merge_l1 else "NHWC"
        )
        if self.channels_major_l1:
            h = jnp.transpose(h, (0, 3, 1, 2))  # level 1 runs channels-major
        if self.width_merge_l1:
            # level-1 entry: ring conv with the width-pair merge composed
            # into its strided fetch — emits ALIGNED merged (no layout pass)
            h = RingConv(
                C[0], ring=self.ring, dtype=self.dtype, name="in_conv",
            )(h, fused_resample="merge_in")
        else:
            h = RingConv(
                C[0], ring=self.ring, data_format=l1_df, align_in="aligned",
                dtype=self.dtype, name="in_conv",
            )(h)
        # W2C level-1 interior runs the ALIGNED convention: every boundary
        # transform is composed into the adjacent conv (merge_in above,
        # down_merged / up_merged at the level-2 interface below), so no
        # merged<->unmerged layout pass ever materializes at 64ch width
        l1_align = "aligned"
        h1 = BlockL1(
            C[1], N[0], data_format=l1_df, align_in=l1_align, name="d_block1",
            **cfg,
        )(h, temb, deterministic)
        if self.channels_major_l1:
            h1_mid = jnp.transpose(h1, (0, 2, 3, 1))
        else:
            h1_mid = h1  # W2C: d_block2 consumes the merged tensor directly
        h2 = Block(
            C[2], N[1], down=2, w2c_down=self.width_merge_l1, name="d_block2",
            **cfg,
        )(h1_mid, temb, deterministic)
        h3 = Block(C[3], N[2], down=2, name="d_block3", **cfg)(h2, temb, deterministic)
        h4 = Block(C[4], N[3], down=2, attn=True, name="d_block4", **cfg)(h3, temb, deterministic)
        h = Block(C[3], N[3], up=2, attn=True, name="u_block4", **cfg)(h4, temb, deterministic)
        h = Block(C[2], N[2], up=2, name="u_block3", **cfg)(
            jnp.concatenate([h, h3], axis=-1), temb, deterministic
        )
        h = Block(C[1], N[1], up=2, w2c_up=self.width_merge_l1, name="u_block2", **cfg)(
            jnp.concatenate([h, h2], axis=-1), temb, deterministic
        )
        if self.channels_major_l1:
            h = jnp.concatenate([jnp.transpose(h, (0, 3, 1, 2)), h1], axis=1)
        elif self.width_merge_l1:
            h = w2c.phase_concat(h, h1)  # both ALIGNED
        else:
            h = jnp.concatenate([h, h1], axis=-1)
        h = BlockL1(
            C[0], N[0], data_format=l1_df,
            align_in=l1_align if self.width_merge_l1 else "offset",
            name="u_block1", **cfg,
        )(h, temb, deterministic)
        out_ch = self.in_channels if self.out_channels is None else self.out_channels
        h = RingConv(
            out_ch, ring=self.ring, zero_init=True, data_format=l1_df,
            align_in="aligned" if self.width_merge_l1 else "offset",
            dtype=self.dtype, name="out_conv",
        )(h)
        if self.channels_major_l1:
            h = jnp.transpose(h, (0, 2, 3, 1))
        elif self.width_merge_l1:
            # out_conv flips aligned -> offset; the unmerge runs on the tiny
            # out_ch-channel tensor (negligible vs the 64ch re-tile)
            h = w2c.unmerge_width_pairs(h, "offset")
        return h.astype(jnp.float32)
