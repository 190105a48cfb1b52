"""Batching loader + on-device preprocessing.

Replaces the reference's HF DataLoader + host-side preprocess
(train.py:165-183, 201-214). TPU-native split of responsibilities:

  - host side (this loader): sample indices, slice the memmap cache, stack a
    raw NHWC float32 batch {depth, reflectance, mask}; per-host sharding for
    multi-process training (⇔ accelerate split_batches); background-thread
    prefetch so projection/cache reads overlap device compute;
  - device side (:func:`preprocess_batch`, pure jnp): depth conversion ->
    channel concat -> [-1,1] normalization -> nearest-exact resize, fused by
    XLA into the training step so raw planes cross PCIe once.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np

from ..lidar import LiDARUtility
from .datasets import RangeImageDataset


def nearest_exact_resize_jnp(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) nearest-exact resize (torch semantics; fixed gather)."""
    B, H, W, C = x.shape
    out_h, out_w = size
    if (H, W) == (out_h, out_w):
        return x
    rows = jnp.clip(
        jnp.floor((jnp.arange(out_h) + 0.5) * H / out_h), 0, H - 1
    ).astype(jnp.int32)
    cols = jnp.clip(
        jnp.floor((jnp.arange(out_w) + 0.5) * W / out_w), 0, W - 1
    ).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def preprocess_batch(
    lidar_utils: LiDARUtility,
    batch: dict,
    resolution: tuple[int, int],
    train_depth: bool = True,
    train_reflectance: bool = True,
) -> jnp.ndarray:
    """Raw NHWC planes -> normalized training tensor in [-1, 1]
    (reference preprocess, train.py:201-214). Pure jnp; call inside jit."""
    parts = []
    if train_depth:
        parts.append(lidar_utils.convert_depth(batch["depth"]))
    if train_reflectance:
        parts.append(batch["reflectance"])
    x = jnp.concatenate(parts, axis=-1)
    x = lidar_utils.normalize(x)
    return nearest_exact_resize_jnp(x, tuple(resolution))


class DataLoader:
    """Shuffling, endlessly-repeating batch iterator with thread prefetch.

    ``process_index/process_count`` shard rows across hosts (⇔ accelerate
    ``split_batches=True``, train.py:52): every host sees the same global
    shuffle and takes its own slice of each global batch.
    """

    def __init__(
        self,
        dataset: RangeImageDataset,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
    ):
        assert batch_size % process_count == 0
        if len(dataset) < batch_size:
            raise ValueError(
                f"dataset has {len(dataset)} scans but the global batch size "
                f"is {batch_size}; the loader would never yield a batch"
            )
        self.dataset = dataset
        self.global_batch = batch_size
        self.local_batch = batch_size // process_count
        self.seed = seed
        self.shuffle = shuffle
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch

    def _index_stream(self) -> Iterator[np.ndarray]:
        epoch = 0
        n = len(self.dataset)
        while True:
            rng = np.random.default_rng((self.seed, epoch))
            order = rng.permutation(n) if self.shuffle else np.arange(n)
            for i in range(0, n - self.global_batch + 1, self.global_batch):
                global_ids = order[i : i + self.global_batch]
                lo = self.process_index * self.local_batch
                yield global_ids[lo : lo + self.local_batch]
            epoch += 1

    def _make_batch(self, ids: np.ndarray) -> dict:
        planes = np.stack([self.dataset.planes(int(i)) for i in ids])  # (B,H,W,6)
        return {
            "sample_id": ids.astype(np.int32),
            "xyz": planes[..., 0:3],
            "reflectance": planes[..., 3:4],
            "depth": planes[..., 4:5],
            "mask": planes[..., 5:6],
        }

    def __iter__(self) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for ids in self._index_stream():
                    if not put(self._make_batch(ids)):
                        return
            except BaseException as exc:  # surface worker errors, don't hang
                put(exc)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
