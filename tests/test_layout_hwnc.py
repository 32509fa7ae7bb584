"""Whole-model (H,W,B,C)-logical layout flip (layers.set_layout("hwnc")).

The flip is a perf lever for the int8 serving path (PERF.md conv1x1
post-mortem: XLA lays in-model int8 activations out {3,0,2,1}, i.e.
row-major for logical HWBC — running the whole network HWBC-logical
removes every batch-minor layout reconciliation). These tests pin that
the flip is semantically invisible: callers keep NHWC in/out and every
tier (fp32, bf16, int8, int8_chain) produces the same numbers.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.apps.inference_app import make_predictor
from yolov3_tpu.models import apply_model, init_model, parse_model_config
from yolov3_tpu.models import layers as L


@pytest.fixture(scope="module")
def setup(repo_root):
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    return spec, params, state


@pytest.fixture()
def hwnc():
    L.set_layout("hwnc")
    try:
        yield
    finally:
        L.set_layout("nhwc")


ANCHORS = np.array([[0.1, 0.1], [0.2, 0.2], [0.3, 0.3],
                    [0.4, 0.4], [0.5, 0.5], [0.6, 0.6]], np.float32).reshape(2, 3, 2)


def test_forward_parity_fp32(setup, hwnc):
    """tiny covers conv(s1/s2 via pad), maxpool (incl. the stride-1 SAME
    pool), upsample, route — all the layout-sensitive ops."""
    spec, params, state = setup
    x = jnp.asarray(np.random.RandomState(0).rand(2, 96, 96, 3), jnp.float32)
    ref, _ = apply_model(spec, params, state, x, train=False)
    L.set_layout("nhwc")
    base, _ = apply_model(spec, params, state, x, train=False)
    L.set_layout("hwnc")
    assert len(ref) == len(base)
    for a, b in zip(ref, base):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_train_mode_parity(setup, hwnc):
    """BN batch statistics reduce over axes (0,1,2) in BOTH layouts
    (channel stays minor), so train-mode outputs and the updated running
    stats must match the NHWC build."""
    spec, params, state = setup
    x = jnp.asarray(np.random.RandomState(1).rand(2, 96, 96, 3), jnp.float32)
    out_h, st_h = apply_model(spec, params, state, x, train=True)
    L.set_layout("nhwc")
    out_n, st_n = apply_model(spec, params, state, x, train=True)
    L.set_layout("hwnc")
    for a, b in zip(out_h, out_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    la, lb = jax.tree_util.tree_leaves(st_h), jax.tree_util.tree_leaves(st_n)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("tier", ["int8", "int8_chain"])
def test_int8_predictor_parity(setup, hwnc, tier):
    """The serving tiers the flip exists for: identical detections in
    both layouts (integer conv results are layout-invariant, so this is
    near-exact — tolerance covers fp requant order only)."""
    spec, params, state = setup
    rng = np.random.RandomState(2)
    calib = [rng.rand(2, 96, 96, 3).astype(np.float32)]
    x = jnp.asarray(rng.rand(2, 96, 96, 3), jnp.float32)

    outs = {}
    for mode in ("hwnc", "nhwc"):
        L.set_layout(mode)
        predict = make_predictor(spec, params, state, ANCHORS, 3, 10, 0.5,
                                 0.05, quantize=tier,
                                 calibration_batches=calib)
        outs[mode] = [np.asarray(t) for t in predict(x)]
    L.set_layout("hwnc")
    for a, b in zip(outs["hwnc"], outs["nhwc"]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_env_override(setup, monkeypatch):
    monkeypatch.setenv("YOLOV3_LAYOUT", "hwnc")
    assert L.layout() == "hwnc"
    monkeypatch.delenv("YOLOV3_LAYOUT")
    assert L.layout() == "nhwc"
