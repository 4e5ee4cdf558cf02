"""Tracing/profiling subsystem.

The reference has none (SURVEY.md §5: one captured-but-unused time.time()).
Here: a ``jax.profiler`` trace context for device timelines (viewable in
TensorBoard/Perfetto) and a lightweight step timer that aggregates host-side
step latencies into percentile summaries.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Collects per-step wall times; summarizes p50/p90/p99 and steps/sec."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        s = sorted(self.times)
        n = len(s)
        return {
            "steps": n,
            "mean_ms": sum(s) / n * 1e3,
            "p50_ms": s[n // 2] * 1e3,
            "p90_ms": s[min(n - 1, int(n * 0.9))] * 1e3,
            "p99_ms": s[min(n - 1, int(n * 0.99))] * 1e3,
            "steps_per_sec": n / sum(s),
        }
