"""Profiling / timing harness (SURVEY.md §5: the reference has none).

Two tools:
  * ``trace(logdir)``: context manager around ``jax.profiler`` producing a
    TensorBoard-viewable device trace of everything inside.
  * ``StepTimer``: wall-clock per-step timing with a hard device fence —
    on the remote ``axon`` platform ``block_until_ready`` can return before
    execution finishes, so the fence fetches a scalar to host.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


def fence(x) -> None:
    """Force completion of the computation producing x (host-fetch fence)."""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


@contextlib.contextmanager
def trace(logdir: str = '/tmp/epnet_trace'):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running scans/sec with warmup exclusion."""

    def __init__(self, batch_size: int, warmup: int = 2):
        self.batch_size = batch_size
        self.warmup = warmup
        self._n = 0
        self._t0 = None

    def step(self, result=None) -> Optional[float]:
        if result is not None:
            fence(result)
        self._n += 1
        if self._n == self.warmup:
            self._t0 = time.perf_counter()
        if self._n > self.warmup and self._t0 is not None:
            dt = time.perf_counter() - self._t0
            return (self._n - self.warmup) * self.batch_size / dt
        return None
