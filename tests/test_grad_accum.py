import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.models import parse_model_config, init_model
from yolov3_tpu.models.network import head_grid_sizes
from yolov3_tpu.parallel.train_step import init_train_state, make_adam, make_train_step

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


def test_accum_matches_full_batch_on_duplicated_data(setup):
    """With the batch = two identical halves, microbatch BN statistics equal
    full-batch statistics, so accum_steps=2 must reproduce accum_steps=1
    exactly (same grads → same update)."""
    spec, params, state = setup
    gs = head_grid_sizes(spec, 96)
    opt = make_adam(1e-3)
    rng = np.random.RandomState(0)
    half_img = rng.rand(2, 96, 96, 3).astype(np.float32)
    half_lab = np.zeros((2, 5, 6), np.float32)
    half_lab[:, 0] = [0.2, 0.2, 0.6, 0.6, 1, 1]
    # strided split (i % accum) ⇒ interleave copies so each microbatch
    # equals the half-batch
    images = np.repeat(half_img, 2, axis=0)
    labels = np.repeat(half_lab, 2, axis=0)

    step1 = make_train_step(spec, ANCHORS, gs, 4, opt)
    ts1 = init_train_state(params, state, opt)
    ts1, m1 = step1(ts1, jnp.asarray(images), jnp.asarray(labels))

    step2 = make_train_step(spec, ANCHORS, gs, 4, opt, accum_steps=2)
    ts2 = init_train_state(params, state, opt)
    ts2, m2 = step2(ts2, jnp.asarray(images), jnp.asarray(labels))

    np.testing.assert_allclose(float(m1["total_loss"]), float(m2["total_loss"]), rtol=2e-5)
    k1 = np.asarray(ts1["params"]["head0"]["layer2"]["kernel"])
    k2 = np.asarray(ts2["params"]["head0"]["layer2"]["kernel"])
    np.testing.assert_allclose(k1, k2, atol=1e-6)
    # (BN running stats legitimately differ: momentum applies once per
    # microbatch under accumulation — inherent to sequential microbatching)


def test_accum_rejects_indivisible_batch(setup):
    spec, params, state = setup
    gs = head_grid_sizes(spec, 96)
    opt = make_adam(1e-3)
    step = make_train_step(spec, ANCHORS, gs, 3, opt, accum_steps=2)
    ts = init_train_state(params, state, opt)
    with pytest.raises(ValueError, match="divisible"):
        step(ts, jnp.zeros((3, 96, 96, 3)), jnp.zeros((3, 5, 6)))
