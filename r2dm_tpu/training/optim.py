"""Optimizer + LR schedule matching the reference training recipe.

Reference: AdamW(lr 1e-4, betas (0.9, 0.99), wd 0, eps 1e-8) with grad clip
1.0 and a cosine-with-warmup LambdaLR (train.py:157-163,185-191,267-268;
utils/training.py:7-24). Here it is one optax chain so the whole update is a
fused on-device computation inside the jitted step.
"""

from __future__ import annotations

import math

import optax

from ..config import TrainingConfig


def cosine_schedule_with_warmup(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: float = 0.5,
) -> optax.Schedule:
    """Exact port of the reference lr_lambda (utils/training.py:14-22)."""
    import jax.numpy as jnp

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(
            1, num_training_steps - num_warmup_steps
        )
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        )
        return base_lr * jnp.where(step < num_warmup_steps, warm, cos)

    return schedule


def make_optimizer(cfg: TrainingConfig) -> tuple[optax.GradientTransformation, optax.Schedule]:
    schedule = cosine_schedule_with_warmup(
        cfg.lr, cfg.lr_warmup_steps, cfg.num_steps
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),  # train.py:267
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        ),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx, schedule
