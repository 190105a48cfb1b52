"""Device-mesh parallelism for training and sampling.

TPU-native replacement for the reference's HF-Accelerate DDP story
(train.py:45-53,193-195: NCCL all-reduce hidden behind accelerator.prepare):
a ``jax.sharding.Mesh`` with two axes,

  - ``data``: batch (data-parallel) axis — gradients are reduced over ICI by
    XLA-inserted psums when the jitted step consumes a batch sharded on this
    axis against replicated parameters (⇔ accelerate's grad sync);
  - ``width``: optional spatial axis sharding the W (azimuth) dimension of
    the 64xW range images — GSPMD partitions the ring convolutions with halo
    collective-permutes over ICI automatically. This is the natural
    "sequence parallel" analogue for this workload (SURVEY.md §5) and lets a
    single scan fan out wide-resolution sampling across chips.

The reference's ``split_batches=True`` (per-rank batch slicing) corresponds
to :func:`shard_batch` placing each host's rows on its local devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Optional[tuple[int, ...]] = None,
    devices: Optional[list] = None,
) -> Mesh:
    """(data,) or (data, width) mesh over the available devices.

    ``mesh_shape=None`` puts every device on the data axis (pure DP, the
    reference's only strategy — SURVEY.md §2.5).
    """
    devices = devices if devices is not None else jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    assert len(mesh_shape) in (1, 2)
    axis_names = ("data",) if len(mesh_shape) == 1 else ("data", "width")
    arr = np.asarray(devices[: int(np.prod(mesh_shape))]).reshape(mesh_shape)
    return Mesh(arr, axis_names)


def parse_mesh(spec, batch_size: Optional[int] = None) -> Optional[Mesh]:
    """CLI mesh spec -> Mesh: '' / 0 / '0' -> None (no mesh), 'N' -> N-way
    data mesh, 'DxW' -> (data, width) mesh. One place for the validation the
    serving CLIs (bench/generate/sample_and_save/evaluate/completion_demo)
    all need: enough devices, and — when ``batch_size`` is given — a batch
    divisible by the data axis."""
    if not spec or str(spec) == "0":
        return None
    try:
        shape = tuple(int(s) for s in str(spec).lower().split("x"))
        assert all(s > 0 for s in shape) and len(shape) in (1, 2)
    except (ValueError, AssertionError):
        raise SystemExit(f"--mesh must be 'N' or 'DxW' with positive ints, got {spec!r}")
    n = int(np.prod(shape))
    if n > len(jax.devices()):
        raise SystemExit(f"--mesh {spec} needs {n} devices, have {len(jax.devices())}")
    if batch_size is not None and batch_size % shape[0]:
        raise SystemExit(
            f"batch size {batch_size} not divisible by the {shape[0]}-way data axis"
        )
    return make_mesh(shape)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, data_format: str = "NHWC") -> NamedSharding:
    """Sharding for an image batch: rows over 'data', W over 'width'."""
    has_width = "width" in mesh.axis_names
    if data_format == "NHWC":
        spec = P("data", None, "width" if has_width else None, None)
    else:  # NCHW
        spec = P("data", None, None, "width" if has_width else None)
    return NamedSharding(mesh, spec)


def shard_batch(mesh: Mesh, batch, data_format: str = "NHWC"):
    """Place a host batch onto the mesh (⇔ accelerate split_batches).

    Single-process: a plain sharded ``device_put``. Multi-process (pod
    slices / the 2-process CPU test): each host holds only its LOCAL slice
    of the global batch (DataLoader contract, data/loader.py:63-66), so the
    global array must be assembled from per-process shards with
    ``jax.make_array_from_process_local_data`` — ``device_put`` would
    misread the local slice as the (too small) global batch.
    """
    sharding = batch_sharding(mesh, data_format)
    multiproc = jax.process_count() > 1

    def place(x):
        sh = sharding if hasattr(x, "ndim") and x.ndim == 4 else replicated(mesh)
        if multiproc:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree.map(place, batch)


def with_width_sharding(mesh: Mesh, x, data_format: str = "NHWC"):
    """Constrain intermediate activations to the width sharding (useful to
    keep GSPMD from re-gathering between U-Net levels)."""
    return jax.lax.with_sharding_constraint(x, batch_sharding(mesh, data_format))
