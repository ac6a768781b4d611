"""Tracing / profiling utilities (SURVEY §5: the reference has none; its only
artifact is the ``-Xptxas=-v`` register printout at build time, setup.py:26).

- ``trace(path)``: context manager around ``jax.profiler`` — produces a
  TensorBoard-loadable trace of XLA ops (the TPU analogue of nsys).
- ``annotate(name)``: ``jax.named_scope`` wrapper so model phases show up by
  name in traces.
- ``Timer``: fetch-synced wall timing harness (tunneled backends can return
  early from ``block_until_ready``; a device→host fetch is the reliable sync
  point — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Name a region in profiler traces: ``with annotate("prefill"): ...``"""
    return jax.named_scope(name)


class Timer:
    """Repeat-timing harness with a device→host fetch as the sync point."""

    def __init__(self, sync: Optional[Callable] = None):
        self._sync = sync or (lambda out: np.asarray(jax.tree.leaves(out)[0]))
        self.records: Dict[str, List[float]] = {}

    def measure(self, name: str, fn: Callable, *args, warmup: int = 2, iters: int = 5):
        for _ in range(warmup):
            self._sync(fn(*args))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            self._sync(fn(*args))
            times.append(time.perf_counter() - t0)
        self.records.setdefault(name, []).extend(times)
        return float(np.percentile(times, 50))

    def report(self) -> Dict[str, float]:
        return {k: float(np.percentile(v, 50)) for k, v in self.records.items()}
