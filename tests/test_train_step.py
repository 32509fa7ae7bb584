import os

import jax
import numpy as np
import pytest

from yolov3_tpu.models import parse_model_config, init_model
from yolov3_tpu.models.network import head_grid_sizes
from yolov3_tpu.models.transfer import trainable_mask
from yolov3_tpu.parallel.train_step import (
    init_train_state,
    make_adam,
    make_eval_step,
    make_train_step,
)

ANCHORS = np.array(
    [[0.1, 0.1], [0.2, 0.2], [0.3, 0.3],
     [0.4, 0.4], [0.5, 0.5], [0.6, 0.6]], np.float32).reshape(2, 3, 2)


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


def _batch(rng, b=2, size=160):
    images = rng.rand(b, size, size, 3).astype(np.float32)
    labels = np.zeros((b, 10, 6), np.float32)
    labels[:, 0] = [0.3, 0.3, 0.55, 0.55, 1, 1]
    labels[:, 1] = [0.1, 0.6, 0.25, 0.75, 1, 2]
    return images, labels


def test_loss_decreases(setup):
    spec, params, state = setup
    rng = np.random.RandomState(0)
    grid_sizes = head_grid_sizes(spec, 160)
    optimizer = make_adam(1e-3)
    step = make_train_step(spec, ANCHORS, grid_sizes, batch_size=2, optimizer=optimizer)
    ts = init_train_state(params, state, optimizer)
    images, labels = _batch(rng)
    losses = []
    for _ in range(8):
        ts, metrics = step(ts, images, labels)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0]
    assert int(ts["step"]) == 8


def test_eval_step_runs(setup):
    spec, params, state = setup
    rng = np.random.RandomState(0)
    grid_sizes = head_grid_sizes(spec, 160)
    eval_step = make_eval_step(spec, ANCHORS, grid_sizes, batch_size=2)
    images, labels = _batch(rng)
    metrics = eval_step(params, state, images, labels)
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.asarray(metrics["per_grid_per_source"]).shape == (2, 4)


def test_frozen_params_unchanged(setup):
    spec, params, state = setup
    rng = np.random.RandomState(0)
    grid_sizes = head_grid_sizes(spec, 160)
    optimizer = make_adam(1e-2)
    mask = trainable_mask(params, ["backbone"])
    step = make_train_step(spec, ANCHORS, grid_sizes, batch_size=2,
                           optimizer=optimizer, trainable_mask=mask,
                           bn_frozen=("backbone",))
    ts = init_train_state(params, state, optimizer)
    images, labels = _batch(rng)
    before = jax.tree.map(np.asarray, params["backbone"])
    before_head = np.asarray(params["head0"]["layer2"]["kernel"])
    ts, _ = step(ts, images, labels)
    after = ts["params"]["backbone"]
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(before_head, np.asarray(ts["params"]["head0"]["layer2"]["kernel"]))
