"""Fused Pallas BN-statistics kernel (ops/pallas/bn_stats.py): numeric
parity with the jnp one-pass statistics, gradient parity of the custom
VJP, odd-size padding, and the batch_norm env-gate integration."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.ops.pallas.bn_stats import bn_moments, bn_sums


@pytest.mark.parametrize("shape", [(4, 8, 8, 32), (2, 13, 13, 256),
                                   (8, 16, 16, 128), (1, 7, 7, 64)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_sums_match_jnp(shape, dtype):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape) * 2 + 0.5, dtype)
    s, s2 = bn_sums(x, interpret=True)
    x32 = x.astype(jnp.float32)
    ref_s = jnp.sum(x32, axis=(0, 1, 2))
    ref_s2 = jnp.sum(x32 * x32, axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s),
                               rtol=3e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(ref_s2),
                               rtol=3e-5, atol=2e-3)


def test_odd_row_count_pads_neutrally():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 5, 7, 32), jnp.float32)  # 105 rows, g=4
    s, s2 = bn_sums(x, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(x).sum((0, 1, 2)),
                               rtol=3e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s2),
                               (np.asarray(x) ** 2).sum((0, 1, 2)),
                               rtol=3e-5, atol=2e-3)


def test_wide_channels():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 4, 1024), jnp.bfloat16)
    s, s2 = bn_sums(x, interpret=True)
    x32 = np.asarray(x, np.float32)
    np.testing.assert_allclose(np.asarray(s), x32.sum((0, 1, 2)),
                               rtol=3e-5, atol=2e-2)
    np.testing.assert_allclose(np.asarray(s2), (x32 ** 2).sum((0, 1, 2)),
                               rtol=3e-5, atol=2e-2)


def test_moments_and_gradients_match_jnp_version():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 6, 6, 64), jnp.float32)

    def jnp_loss(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.maximum(jnp.mean(x32 * x32, axis=(0, 1, 2)) - mean * mean, 0.0)
        return jnp.sum(jnp.sin(mean) + jnp.cos(var) * var)

    def pallas_loss(x):
        mean, var = bn_moments(x, True)
        return jnp.sum(jnp.sin(mean) + jnp.cos(var) * var)

    v1, g1 = jax.value_and_grad(jnp_loss)(x)
    v2, g2 = jax.value_and_grad(pallas_loss)(x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-6)


def test_batch_norm_env_gate_parity(monkeypatch):
    """batch_norm(train=True) with YOLOV3_PALLAS_BN_STATS=1 returns the
    same outputs/new-state as the jnp path (interpret mode on CPU)."""
    from yolov3_tpu.models.layers import batch_norm

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 32), jnp.float32)
    params = {"gamma": jnp.asarray(rng.rand(32), jnp.float32),
              "beta": jnp.asarray(rng.randn(32), jnp.float32)}
    state = {"mean": jnp.zeros(32), "var": jnp.ones(32)}

    y_ref, st_ref = batch_norm(x, params, state, train=True)
    monkeypatch.setenv("YOLOV3_PALLAS_BN_STATS", "1")
    y_pl, st_pl = batch_norm(x, params, state, train=True)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pl),
                               rtol=1e-5, atol=1e-5)
    for k in st_ref:
        np.testing.assert_allclose(np.asarray(st_ref[k]), np.asarray(st_pl[k]),
                                   rtol=1e-5, atol=1e-6)


def test_batch_norm_env_gate_parity_phases(monkeypatch):
    from yolov3_tpu.models.layers import batch_norm

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 128), jnp.float32)  # 4 phases × 32
    params = {"gamma": jnp.asarray(rng.rand(32), jnp.float32),
              "beta": jnp.asarray(rng.randn(32), jnp.float32)}
    state = {"mean": jnp.zeros(32), "var": jnp.ones(32)}

    y_ref, st_ref = batch_norm(x, params, state, train=True, phases=4)
    monkeypatch.setenv("YOLOV3_PALLAS_BN_STATS", "1")
    y_pl, st_pl = batch_norm(x, params, state, train=True, phases=4)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pl),
                               rtol=1e-5, atol=1e-5)
    for k in st_ref:
        np.testing.assert_allclose(np.asarray(st_ref[k]), np.asarray(st_pl[k]),
                                   rtol=1e-5, atol=1e-6)
