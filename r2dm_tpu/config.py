"""Configuration system for r2dm_tpu.

Mirrors the reference config surface field-for-field
(/root/reference/utils/option.py:1-77) so that checkpoints round-trip the same
``{data, model, diffusion, training}`` dict. Implemented with pydantic
dataclasses; CLI parsing is provided by :func:`parse_cli` (argparse-based,
replacing the reference's ``simple_parsing`` dependency which is not available
here).

TPU-specific additions live in :class:`TrainingConfig` (``precision``,
``mesh_shape``) and default to settings that reproduce the reference recipe.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Literal, Optional, Tuple

from pydantic.dataclasses import dataclass


@dataclass
class ModelConfig:
    # cf. reference utils/option.py:6-19
    architecture: str = "efficient_unet"
    base_channels: int = 64
    temb_channels: Optional[int] = None
    channel_multiplier: Tuple[int, int, int, int] = (1, 2, 4, 8)
    num_residual_blocks: Tuple[int, int, int, int] = (3, 3, 3, 3)
    gn_num_groups: int = 32 // 4
    gn_eps: float = 1e-6
    attn_num_heads: int = 8
    coords_encoding: Optional[
        Literal["spherical_harmonics", "polar_coordinates", "fourier_features"]
    ] = "fourier_features"
    dropout: float = 0.0


@dataclass
class DiffusionConfig:
    # cf. reference utils/option.py:22-29
    num_training_steps: Optional[int] = None
    num_sampling_steps: int = 1024
    prediction_type: Literal["eps", "v", "x_0"] = "eps"
    loss_type: str = "l2"
    noise_schedule: str = "cosine"
    timestep_type: Literal["continuous", "discrete", "flow"] = "continuous"


@dataclass
class TrainingConfig:
    # cf. reference utils/option.py:32-52
    batch_size_train: int = 8
    batch_size_eval: int = 8
    num_workers: int = 4
    num_steps: int = 300_000
    steps_save_image: int = 5_000
    steps_save_model: int = 10_000
    gradient_accumulation_steps: int = 1
    lr: float = 1e-4
    lr_warmup_steps: int = 10_000
    adam_beta1: float = 0.9
    adam_beta2: float = 0.99
    adam_weight_decay: float = 0.0
    adam_epsilon: float = 1e-8
    ema_decay: float = 0.995
    ema_update_every: int = 10
    # TPU-native: "bf16" runs the denoiser in bfloat16 with fp32 params and
    # fp32 diffusion math (the analogue of the reference's fp16 AMP with
    # fp32-pinned q-steps, utils/option.py:49 + models/diffusion/base.py:111).
    mixed_precision: str = "bf16"
    output_dir: str = "logs/diffusion"
    seed: int = 0
    # TPU-native additions (no reference equivalent; accelerate handles this
    # implicitly for the reference, train.py:45-53).
    mesh_shape: Optional[Tuple[int, ...]] = None  # None = all devices on "data"
    resume: Optional[str] = None  # checkpoint dir to resume from
    profile_dir: Optional[str] = None  # capture a JAX device trace of steps 10-15
    # Host-RSS watchdog: at the 50-step logging boundary, if this process'
    # resident set exceeds this many GB, write the resumable checkpoint and
    # restart — single-host CLI runs re-exec themselves with
    # --training.resume (training continues unattended); multi-host runs
    # exit 0 through the preemption path for the scheduler to restart.
    # Motivated by measured host-side retention of h2d staging buffers in
    # some tunneled TPU runtimes: ~every transferred byte leaks, so a
    # b32 64x1024 run leaks ~21 MB/step and OOM-kills a 125 GB host near
    # step 6k (train.py _host_rss_gb). None disables.
    max_host_rss_gb: Optional[float] = 96.0
    # run the outermost U-Net level width-pair-merged (ops/w2c.py) during
    # training: exact math, identical parameter tree/checkpoints, measured
    # +36% training throughput at batch 32 on the v5e round 2 and +46% over
    # NHWC in round 3 once every level-boundary layout transform was
    # composed into its adjacent conv (ops/fused_resample.py merged ops).
    # efficient_unet only; ignored for other nets.
    width_merge_l1: bool = True
    # compute the GroupNorm/AdaGN FMA+SiLU pass in the activation dtype
    # (models/layers.py GN_ACT_COMPUTE_DTYPE=None): one extra bf16 rounding
    # in the forward, but XLA stops materializing fp32 copies of the norm
    # chains — measured +4.9% train step at b32 (281.5 -> 268.4 ms) and
    # +10.6% b256 sampling (round 3). False forces fp32 (torch autocast
    # parity); fp32 models (goldens, validate_pretrained) are always fp32.
    gn_bf16: bool = True
    # bf16-cotangent policy (training/step.py make_train_step grad_dtype):
    # cast float params to bf16 before differentiation so the whole backward
    # (cotangents + gradient tree) runs in bf16, casting grads back to fp32
    # only at the optimizer update (fp32 master params + fp32 Adam state).
    # Halves grad HBM traffic — targets the W2C fp32-grad-padding cost.
    # Default off pending the device A/B (tools/probe_trainstep.py gradbf16).
    grad_bf16: bool = False


@dataclass
class DataConfig:
    # cf. reference utils/option.py:55-69
    # reference choices: kitti_raw | kitti_360 (utils/option.py:57); we add
    # "synthetic" (procedural stand-in for tests/smoke runs)
    dataset: Literal["kitti_raw", "kitti_360", "synthetic"] = "kitti_360"
    depth_format: Literal["log_depth", "inverse_depth", "depth"] = "log_depth"
    # "<spherical|unfolding>-<width>"; reference offers 1024/2048 widths
    # (utils/option.py:58-64); any width is accepted here
    projection: str = "spherical-1024"
    train_depth: bool = True
    train_reflectance: bool = True
    resolution: Tuple[int, int] = (64, 1024)
    # NOTE: the reference leaves these un-annotated (class constants,
    # utils/option.py:68-69); we expose them as real fields with the same
    # defaults so configs stay compatible.
    min_depth: float = 1.45
    max_depth: float = 80.0
    data_root: Optional[str] = None  # root dir holding raw *.bin scans


@dataclass
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    training: TrainingConfig = dataclasses.field(default_factory=TrainingConfig)


def asdict(cfg: Config) -> dict:
    return dataclasses.asdict(cfg)


def from_dict(d: dict) -> Config:
    """Rebuild a Config from a (possibly torch-checkpoint-sourced) dict.

    Mirrors ``Config(**ckpt["cfg"])`` in the reference
    (utils/inference.py:29). Unknown keys are dropped so reference
    checkpoints (which lack our TPU-only fields) load cleanly.
    """

    def _filter(cls, sub: dict) -> dict:
        names = {f.name for f in dataclasses.fields(cls)}
        return {k: v for k, v in sub.items() if k in names}

    return Config(
        data=DataConfig(**_filter(DataConfig, d.get("data", {}))),
        model=ModelConfig(**_filter(ModelConfig, d.get("model", {}))),
        diffusion=DiffusionConfig(**_filter(DiffusionConfig, d.get("diffusion", {}))),
        training=TrainingConfig(**_filter(TrainingConfig, d.get("training", {}))),
    )


def _add_dataclass_args(parser: argparse.ArgumentParser, cls, prefix: str) -> None:
    for f in dataclasses.fields(cls):
        arg = f"--{prefix}.{f.name}"
        default = f.default
        if isinstance(default, dataclasses._MISSING_TYPE):
            default = None
        if isinstance(default, bool):
            parser.add_argument(
                arg, type=lambda s: s.lower() in ("1", "true", "yes"), default=default
            )
        elif isinstance(default, tuple):
            parser.add_argument(
                arg,
                type=lambda s: tuple(int(x) for x in s.replace(",", " ").split()),
                default=default,
            )
        elif isinstance(default, int):
            parser.add_argument(arg, type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(arg, type=float, default=default)
        else:
            parser.add_argument(arg, type=str, default=default)


def parse_cli(argv=None) -> Config:
    """argparse-based CLI mirroring the reference's nested --data.x/--model.y
    flags (train.py:315-318)."""
    parser = argparse.ArgumentParser()
    _add_dataclass_args(parser, DataConfig, "data")
    _add_dataclass_args(parser, ModelConfig, "model")
    _add_dataclass_args(parser, DiffusionConfig, "diffusion")
    _add_dataclass_args(parser, TrainingConfig, "training")
    ns = vars(parser.parse_args(argv))
    sub = {"data": {}, "model": {}, "diffusion": {}, "training": {}}
    for k, v in ns.items():
        group, name = k.split(".", 1)
        if v is not None or name in ("temb_channels", "num_training_steps"):
            sub[group][name] = v
    return from_dict(sub)
