"""Opt-in subsampled BN statistics (layers.set_bn_stats_subsample).

Training-throughput lever (PERF.md): batch mean/var estimated from every
s-th spatial row/column. These pin that it is (a) exact when the
subsample is statistically sufficient, (b) a close estimator on real
activations, and (c) OFF by default.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.models import layers as L


@pytest.fixture()
def subsample2():
    L.set_bn_stats_subsample(2)
    try:
        yield
    finally:
        L.set_bn_stats_subsample(1)


def _bn_inputs(c=8):
    p = {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,))}
    s = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    return p, s


def test_exact_on_channel_constant(subsample2):
    """Per-channel-constant input: any spatial subsample sees the same
    values, so stats — and therefore outputs and new state — are exact."""
    p, s = _bn_inputs()
    x = jnp.broadcast_to(jnp.arange(8, dtype=jnp.float32), (2, 6, 6, 8))
    y_sub, st_sub = L.batch_norm(x, p, s, train=True)
    L.set_bn_stats_subsample(1)
    y_ref, st_ref = L.batch_norm(x, p, s, train=True)
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_sub["mean"]),
                               np.asarray(st_ref["mean"]), atol=1e-6)


def test_close_estimator_on_random(subsample2):
    p, s = _bn_inputs()
    x = jnp.asarray(np.random.RandomState(0).randn(8, 32, 32, 8), jnp.float32)
    y_sub, st_sub = L.batch_norm(x, p, s, train=True)
    L.set_bn_stats_subsample(1)
    y_ref, st_ref = L.batch_norm(x, p, s, train=True)
    # 8·16·16 = 2048 samples/channel: stderr of the mean ~ 1/sqrt(2048)
    assert np.abs(np.asarray(st_sub["mean"]) - np.asarray(st_ref["mean"])).max() < 0.05
    assert np.abs(np.asarray(y_sub) - np.asarray(y_ref)).max() < 0.2
    assert y_sub.shape == x.shape  # normalization still covers every pixel


def test_gradients_flow(subsample2):
    p, s = _bn_inputs(4)

    def loss(x):
        y, _ = L.batch_norm(x, p, s, train=True)
        return jnp.sum(y * y)

    g = jax.grad(loss)(jnp.asarray(
        np.random.RandomState(1).randn(2, 8, 8, 4), jnp.float32))
    assert np.isfinite(np.asarray(g)).all()


def test_default_off():
    assert L._bn_stats_subsample() == 1


def test_env_override(monkeypatch):
    monkeypatch.setenv("YOLOV3_BN_STATS_SUBSAMPLE", "4")
    assert L._bn_stats_subsample() == 4


def test_eval_mode_unaffected(subsample2):
    """Inference uses running stats — subsampling must not touch it."""
    p, s = _bn_inputs()
    x = jnp.asarray(np.random.RandomState(2).randn(2, 6, 6, 8), jnp.float32)
    y_sub, _ = L.batch_norm(x, p, s, train=False)
    L.set_bn_stats_subsample(1)
    y_ref, _ = L.batch_norm(x, p, s, train=False)
    np.testing.assert_array_equal(np.asarray(y_sub), np.asarray(y_ref))
