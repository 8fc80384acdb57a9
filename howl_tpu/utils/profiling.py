"""Profiling hooks (the reference has none — SURVEY.md §5 gap).

``trace(dir)`` wraps a block in a jax.profiler trace viewable in TensorBoard /
Perfetto; ``StepTimer`` records per-step wall times and reports percentiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import List


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.times: List[float] = []
        self._start = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._start)

    def summary(self) -> dict:
        import numpy as np

        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
        }
