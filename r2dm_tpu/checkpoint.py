"""Native checkpointing: single-file msgpack pytree checkpoints.

TPU-native replacement for the reference's ``torch.save`` dict
(train.py:294-304): the same logical contents
``{cfg, weights, ema_weights, opt_state, lr_scheduler(implicit), step}``
serialized with flax.serialization (msgpack) so they are framework-neutral
and fast to write from a jitted training loop. ``lr_scheduler`` state is not
stored — our optax schedule is a pure function of ``step`` (the reference's
gap of having no resume path is closed in train.py).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    # to_state_dict turns NamedTuple/custom-node pytrees (optax states) into
    # plain nested dicts that msgpack can serialize
    return jax.tree.map(lambda x: np.asarray(x), serialization.to_state_dict(tree))


def save_checkpoint(
    path: str,
    cfg: dict,
    weights,
    ema_weights=None,
    opt_state=None,
    step: int = 0,
) -> str:
    """Write a single-file checkpoint. ``cfg`` must be a plain dict."""
    payload = {
        "cfg": json.dumps(cfg),
        "step": step,
        "weights": _to_host(weights),
        "ema_weights": _to_host(ema_weights) if ema_weights is not None else {},
        "opt_state": _to_host(opt_state) if opt_state is not None else {},
    }
    data = serialization.msgpack_serialize(payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: no torn checkpoints on preemption
    return path


def load_checkpoint(path: str) -> dict[str, Any]:
    """Read a checkpoint saved by :func:`save_checkpoint`.

    Returns the reference-compatible layout
    {cfg: dict, weights, ema_weights, opt_state, global_step}.
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return {
        "cfg": json.loads(payload["cfg"]),
        "weights": payload["weights"],
        "ema_weights": payload["ema_weights"] or None,
        "opt_state": payload["opt_state"] or None,
        "global_step": int(payload["step"]),
    }


def restore_opt_state(template, stored):
    """Rebuild a typed optax state pytree from the stored (dict-ified) one.

    msgpack round-trips lose NamedTuple types; ``template`` (a freshly
    initialized opt_state) provides the structure to restore into.
    """
    return serialization.from_state_dict(template, stored)
