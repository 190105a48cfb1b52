"""The jitted training step: loss + grads + AdamW + EMA as one XLA program.

TPU-native equivalent of the reference hot loop (train.py:259-310):
``accelerator.backward`` + clip + ``optimizer.step`` + ``ema.update`` fuse
into a single compiled step. Data parallelism comes from jit + shardings
(see parallel/mesh.py): batch sharded over 'data', state replicated — XLA
inserts the gradient psum over ICI where accelerate used NCCL all-reduce
(train.py:266).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..parallel.mesh import batch_sharding, replicated
from .ema import EMAConfig, ema_update


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    buffers: Any
    opt_state: Any
    ema_params: Any


def init_train_state(params, buffers, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        buffers=buffers,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )


def make_train_step(
    diffusion,
    tx: optax.GradientTransformation,
    ema_cfg: EMAConfig,
    dropout: float = 0.0,
    grad_dtype=None,
):
    """Returns ``train_step(state, x_0, key, loss_mask) -> (state, metrics)``.

    ``diffusion.loss`` samples timesteps + noise from ``key``
    (reference base.py:141-149); with ``dropout > 0`` a dropout rng stream is
    threaded into the network (training-mode stochasticity; sampling stays
    deterministic). Metrics mirror the reference's logged scalars
    (train.py:273-277): loss, grad norm, ema decay.

    ``grad_dtype`` (e.g. ``jnp.bfloat16``) enables a low-precision-cotangent
    policy: float params are cast to ``grad_dtype`` BEFORE differentiation, so
    every cotangent through the network (and the gradient tree itself) is
    ``grad_dtype``; gradients are cast back to the master-param dtype right
    before the optimizer update, which (with fp32 master params + fp32
    optimizer state) keeps Adam accumulation full-precision. Halves backward
    HBM traffic for grads — the W2C layout doubles fp32 grad padding, which
    this recovers. Off by default; see tools/probe_trainstep.py case
    ``gradbf16`` for the measured verdict.
    """

    def train_step(state: TrainState, x_0, key, loss_mask=None):
        model_kwargs = None
        if dropout > 0.0:
            key, dkey = jax.random.split(key)
            model_kwargs = {"deterministic": False, "rngs": {"dropout": dkey}}

        def loss_fn(params):
            variables = {"params": params}
            if state.buffers:
                variables["buffers"] = state.buffers
            return diffusion.loss(
                variables, x_0, key, loss_mask=loss_mask, model_kwargs=model_kwargs
            )

        if grad_dtype is not None:
            cast_in = jax.tree.map(
                lambda p: p.astype(grad_dtype)
                if jnp.issubdtype(p.dtype, jnp.floating)
                else p,
                state.params,
            )
            loss, grads = jax.value_and_grad(loss_fn)(cast_in)
            grads = jax.tree.map(
                lambda g, p: g.astype(p.dtype), grads, state.params
            )
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        # reference updates EMA after the optimizer step, counting calls from
        # the first step (train.py:270-276)
        ema_params, decay = ema_update(state.ema_params, params, state.step, ema_cfg)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "ema_decay": decay,
        }
        state = state.replace(
            step=new_step,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        )
        return state, metrics

    return train_step


def jit_train_step(train_step, mesh=None, data_format: str = "NHWC"):
    """jit with mesh shardings: state/key replicated, batch split over the
    mesh; donates the state so params update in place (HBM-frugal)."""
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    rep = replicated(mesh)
    bat = batch_sharding(mesh, data_format)
    return jax.jit(
        train_step,
        in_shardings=(rep, bat, rep, None),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
