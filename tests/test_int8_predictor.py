"""App-level int8 predictor: calibrate → quantize → fused predict (CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.apps.inference_app import make_predictor
from yolov3_tpu.models import parse_model_config, init_model


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


ANCHORS = np.array([[0.1, 0.1], [0.2, 0.2], [0.3, 0.3],
                    [0.4, 0.4], [0.5, 0.5], [0.6, 0.6]], np.float32).reshape(2, 3, 2)


def test_int8_predictor_runs(setup):
    spec, params, state = setup
    rng = np.random.RandomState(0)
    calib = [rng.rand(2, 96, 96, 3).astype(np.float32)]
    predict = make_predictor(
        spec, params, state, ANCHORS, 3, 10, 0.5, 0.05,
        quantize="int8", calibration_batches=calib,
    )
    out = predict(jnp.asarray(rng.rand(1, 96, 96, 3), jnp.float32))
    bboxes, class_idx, scores, selected, num_valid = map(np.asarray, out)
    assert selected.shape == (1, 10)
    assert 0 <= int(num_valid[0]) <= 10
    assert np.isfinite(scores).all()


def test_int8_chain_predictor_matches_int8(setup):
    """quantize='int8_chain' (QAct end-to-end int8) must agree with the
    per-conv 'int8' tier — same calibration, same math modulo one extra
    rounding per edge."""
    spec, params, state = setup
    rng = np.random.RandomState(1)
    calib = [rng.rand(2, 96, 96, 3).astype(np.float32)]
    x = jnp.asarray(rng.rand(2, 96, 96, 3), jnp.float32)
    outs = {}
    for tier in ("int8", "int8_chain"):
        predict = make_predictor(
            spec, params, state, ANCHORS, 3, 10, 0.5, 0.05,
            quantize=tier, calibration_batches=calib,
        )
        bboxes, class_idx, scores, selected, num_valid = map(np.asarray, predict(x))
        assert np.isfinite(scores).all()
        outs[tier] = scores
    # same candidate score field within quantization noise
    a, b = outs["int8"], outs["int8_chain"]
    assert np.abs(a - b).max() < 0.1


def test_int8_predictor_requires_calibration(setup):
    spec, params, state = setup
    with pytest.raises(ValueError, match="calibration"):
        make_predictor(spec, params, state, ANCHORS, 3, 10, 0.5, 0.05, quantize="int8")
