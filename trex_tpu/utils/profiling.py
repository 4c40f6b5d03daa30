"""Profiling hooks: wall-clock timing with device sync + jax.profiler traces.

The reference only has ad-hoc ``time.time`` loops (``benchmark_tree_cost.py:62-97``);
here timing always syncs with ``block_until_ready`` and Perfetto-compatible
traces are one context manager away.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


class Timer:
    """Accumulating wall-clock timer with device synchronization."""

    def __init__(self) -> None:
        self.total = 0.0
        self.count = 0

    @contextlib.contextmanager
    def time(self, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.total += time.perf_counter() - t0
        self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


def timed(fn: Callable, *args, warmup: int = 1, reps: int = 10) -> tuple[float, object]:
    """Mean seconds per call of ``fn(*args)`` after ``warmup`` calls.

    Returns (mean_seconds, last_result). The result is synced once at the end
    (per-rep sync would serialize the dispatch pipeline and overstate cost).
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (view in XProf/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
