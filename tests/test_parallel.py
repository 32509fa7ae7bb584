"""Multi-chip (virtual 8-device CPU mesh) data-parallel tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.models import parse_model_config, init_model
from yolov3_tpu.models.network import head_grid_sizes
from yolov3_tpu.parallel.mesh import batch_sharding, make_mesh
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


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_sharded_step_matches_single_device(setup):
    spec, params, state = setup
    grid_sizes = head_grid_sizes(spec, 96)
    optimizer = make_adam(1e-3)
    rng = np.random.RandomState(0)
    images = rng.rand(8, 96, 96, 3).astype(np.float32)
    labels = np.zeros((8, 5, 6), np.float32)
    labels[:, 0] = [0.2, 0.2, 0.5, 0.5, 1, 1]

    step1 = make_train_step(spec, ANCHORS, grid_sizes, batch_size=8, optimizer=optimizer)
    ts1 = init_train_state(params, state, optimizer)
    ts1, m1 = step1(ts1, jnp.asarray(images), jnp.asarray(labels))

    mesh = make_mesh()
    stepN = make_train_step(spec, ANCHORS, grid_sizes, batch_size=8,
                            optimizer=optimizer, mesh=mesh)
    tsN = init_train_state(params, state, optimizer)
    sharded = jax.device_put(jnp.asarray(images), batch_sharding(mesh))
    sharded_labels = jax.device_put(jnp.asarray(labels), batch_sharding(mesh))
    tsN, mN = stepN(tsN, sharded, sharded_labels)

    np.testing.assert_allclose(float(m1["total_loss"]), float(mN["total_loss"]), rtol=1e-5)
    # updated params identical across the sharded/unsharded paths
    k1 = np.asarray(ts1["params"]["head0"]["layer2"]["kernel"])
    kN = np.asarray(tsN["params"]["head0"]["layer2"]["kernel"])
    np.testing.assert_allclose(k1, kN, atol=2e-6)


def test_sync_bn_over_global_batch(setup):
    """Batch-sharded training must reduce BN statistics over the global
    batch (sync-BN), not per-shard."""
    spec, params, state = setup
    grid_sizes = head_grid_sizes(spec, 96)
    optimizer = make_adam(0.0)  # no param movement; isolate BN state
    rng = np.random.RandomState(1)
    # deliberately non-iid shards: shard i has mean offset i
    images = rng.rand(8, 96, 96, 3).astype(np.float32)
    images += np.arange(8, dtype=np.float32).reshape(8, 1, 1, 1)
    labels = np.zeros((8, 5, 6), np.float32)
    labels[:, 0] = [0.2, 0.2, 0.5, 0.5, 1, 1]

    step1 = make_train_step(spec, ANCHORS, grid_sizes, batch_size=8, optimizer=optimizer)
    ts1 = init_train_state(params, state, optimizer)
    ts1, _ = step1(ts1, jnp.asarray(images), jnp.asarray(labels))

    mesh = make_mesh()
    stepN = make_train_step(spec, ANCHORS, grid_sizes, batch_size=8,
                            optimizer=optimizer, mesh=mesh)
    tsN = init_train_state(params, state, optimizer)
    tsN, _ = stepN(
        tsN,
        jax.device_put(jnp.asarray(images), batch_sharding(mesh)),
        jax.device_put(jnp.asarray(labels), batch_sharding(mesh)),
    )
    m1 = np.asarray(ts1["bn_state"]["backbone"]["layer1"]["mean"])
    mN = np.asarray(tsN["bn_state"]["backbone"]["layer1"]["mean"])
    np.testing.assert_allclose(m1, mN, rtol=1e-4)


def test_sharded_predictor_matches_single_device(setup):
    """Batch-sharded DP serving (make_predictor(mesh=...)): outputs must be
    identical to the single-device predictor — the pipeline is per-image
    independent, so sharding may not change any value."""
    from yolov3_tpu.apps.inference_app import make_predictor

    spec, params, state = setup
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(8, 96, 96, 3).astype(np.float32))

    kw = dict(anchors_table=ANCHORS, nclasses=3, yolo_max_boxes=20,
              nms_iou_threshold=0.5, nms_score_threshold=0.1)
    p1 = make_predictor(spec, params, state, **kw)
    pN = make_predictor(spec, params, state, mesh=make_mesh(), **kw)

    out1 = p1(images)
    outN = pN(images)
    for a, b in zip(out1, outN):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)
    # the sharded outputs really are distributed over the data axis
    shardings = {d.device for d in outN[0].addressable_shards}
    assert len(shardings) == 8


def test_sharded_int8_predictor_matches_single_device(setup):
    """DP serving composes with the int8 tier (and its S2D stem rewrite):
    tiny has no rewritable stem (no-op) but the quantized path must still
    shard cleanly."""
    from yolov3_tpu.apps.inference_app import make_predictor

    spec, params, state = setup
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(8, 96, 96, 3).astype(np.float32))
    calib = [rng.rand(2, 96, 96, 3).astype(np.float32)]

    kw = dict(anchors_table=ANCHORS, nclasses=3, yolo_max_boxes=20,
              nms_iou_threshold=0.5, nms_score_threshold=0.1,
              quantize="int8", calibration_batches=calib)
    p1 = make_predictor(spec, params, state, **kw)
    pN = make_predictor(spec, params, state, mesh=make_mesh(), **kw)
    # sharded vs unsharded are different XLA programs — the fp decode tail
    # may reassociate (ulp-level); the int8 conv stack itself is exact
    for a, b in zip(p1(images), pN(images)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)


def test_sharded_eval_sweep_predictor(setup):
    """Batch-sharded evaluate-sweep predictor (scalar thresholds replicate,
    images shard) matches the single-device sweep."""
    from yolov3_tpu.apps.evaluate_app import make_sweepable_predictor

    spec, params, state = setup
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(8, 96, 96, 3).astype(np.float32))

    p1 = make_sweepable_predictor(spec, params, state, ANCHORS, 3, 20)
    pN = make_sweepable_predictor(spec, params, state, ANCHORS, 3, 20, mesh=make_mesh())
    for th in (0.004, 0.5):
        for a, b in zip(p1(images, 0.5, th), pN(images, 0.5, th)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)
