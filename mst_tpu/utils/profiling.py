"""Profiling / tracing hooks.

The reference has no profiling at all (SURVEY.md §5 — tqdm postfix only).
Here: a jax-profiler context for XLA traces viewable in TensorBoard /
Perfetto, and a per-step wall-clock timer whose summary gives the
clips/sec-per-chip north-star metric.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace_profile(log_dir: str = "/tmp/jax_trace"):
    """Capture an XLA profile for everything inside the context."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing + throughput summary."""

    def __init__(self, items_per_step: int = 1, warmup: int = 2):
        self.items = items_per_step
        self.warmup = warmup
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        t = np.asarray(self.times[self.warmup :] or self.times)
        return {
            "steps": len(self.times),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
            "items_per_sec": float(self.items / t.mean()),
        }
