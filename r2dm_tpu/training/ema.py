"""Exponential moving average of parameters, inside the jitted train step.

Matches the training dynamics of the reference's external ``ema_pytorch.EMA``
dependency (train.py:134-142: beta=cfg.ema_decay, update_every=10, warmup
ramp): decay ramps as ``1 - (1 + step/inv_gamma)^(-power)`` clamped to
[0, beta], parameters are copied verbatim until ``update_after_step``, and
the average only moves every ``update_every`` steps.

TPU-native difference: the EMA is a pytree lerp executed on-device inside the
compiled step on EVERY shard (replicated params make it free), removing the
reference's rank-0-only asymmetry (train.py:134,276).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAConfig(NamedTuple):
    beta: float = 0.995
    update_every: int = 10
    update_after_step: int = 100
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0
    min_value: float = 0.0


def ema_decay(step: jnp.ndarray, cfg: EMAConfig) -> jnp.ndarray:
    """Current decay for ema_pytorch-compatible warmup (0 while copying)."""
    epoch = jnp.clip(
        step.astype(jnp.float32) - cfg.update_after_step - 1.0, min=0.0
    )
    value = 1.0 - (1.0 + epoch / cfg.inv_gamma) ** (-cfg.power)
    value = jnp.clip(value, cfg.min_value, cfg.beta)
    return jnp.where(epoch <= 0.0, 0.0, value)


def ema_update(ema_params, params, step: jnp.ndarray, cfg: EMAConfig):
    """Returns (new_ema_params, effective_decay).

    ``step`` counts update() calls like the reference (one per train step);
    non-update steps leave the average untouched (decay treated as 1).
    """
    decay = ema_decay(step, cfg)
    update_now = (step % cfg.update_every) == 0
    d = jnp.where(update_now, decay, 1.0)
    new_ema = jax.tree.map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params
    )
    return new_ema, decay
