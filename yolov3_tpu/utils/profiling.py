"""Observability: step timing, throughput, jax.profiler traces, NaN debug.

The reference has no tracing/profiling at all (SURVEY §5) — its only
telemetry is per-batch loss logging. TPU-native equivalents here:
  * StepTimer — wall-clock per-step stats (p50/p95/mean) and images/sec,
    cheap enough to leave on;
  * trace(dir) — context manager around jax.profiler.start_trace /
    stop_trace for TensorBoard-viewable device traces;
  * enable_nan_debug() — jax.config.debug_nans, the single-device analog
    of a sanitizer pass (reference has none).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class StepTimer:
    def __init__(self, images_per_step: int = 0):
        self.images_per_step = images_per_step
        self.durations: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.durations.append(time.perf_counter() - self._t0)
        return False

    def stats(self) -> dict:
        if not self.durations:
            return {}
        d = np.asarray(self.durations)
        out = {
            "steps": len(d),
            "mean_ms": float(d.mean() * 1000),
            "p50_ms": float(np.percentile(d, 50) * 1000),
            "p95_ms": float(np.percentile(d, 95) * 1000),
        }
        if self.images_per_step:
            out["images_per_sec"] = float(self.images_per_step / d.mean())
        return out


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """Device trace via jax.profiler (TensorBoard format). No-op if dir is
    falsy."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debug():
    import jax

    jax.config.update("jax_debug_nans", True)
