"""Profiling / tracing support (a gap in the reference — SURVEY.md §5).

Thin wrappers over the JAX profiler: capture XLA device traces viewable in
TensorBoard/Perfetto, plus a step timer that reports steps/sec and
device-time utilization.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(out_dir: Optional[str]) -> Iterator[None]:
    """``with device_trace("logs/profile"):`` captures a JAX profiler trace
    (no-op when out_dir is None)."""
    if out_dir is None:
        yield
        return
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate_step(step: int):
    """Step annotation so traces group ops per training step."""
    return jax.profiler.StepTraceAnnotation("train", step_num=step)


class Stopwatch:
    """Rolling steps/sec with explicit device synchronization."""

    def __init__(self):
        self.t0 = time.time()
        self.n = 0

    def lap(self, sync=None) -> float:
        if sync is not None:
            jax.block_until_ready(sync)
        self.n += 1
        return self.n / (time.time() - self.t0)
