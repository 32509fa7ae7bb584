"""utils/profiling.py: StepTimer stats and the trace context manager."""

import os

import numpy as np

from yolov3_tpu.utils.profiling import StepTimer, trace


def test_step_timer_stats():
    t = StepTimer(images_per_step=8)
    for _ in range(5):
        with t:
            pass
    s = t.stats()
    assert s["steps"] == 5
    assert s["p50_ms"] >= 0 and s["p95_ms"] >= s["p50_ms"]
    assert s["images_per_sec"] > 0
    assert np.isfinite(s["mean_ms"])


def test_step_timer_empty_stats():
    assert StepTimer().stats() == {}


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must not start a trace (start_trace(None) would raise)


def test_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    d = str(tmp_path / "trace")
    with trace(d):
        float(jnp.sum(jnp.ones((4, 4))))
    # jax.profiler writes plugins/profile/<ts>/ under the trace dir
    found = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert found, "trace produced no files"
