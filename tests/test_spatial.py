"""Spatial partitioning (SP) tests on the virtual 8-device CPU mesh.

The second real mesh axis for this model family (parallel/mesh.py): image
rows shard over a 'spatial' axis and GSPMD partitions every conv
spatially, inserting halo exchanges. These tests pin the semantics — a
spatially-sharded program must compute the SAME values as the unsharded
one (sharding is an execution layout, never a math change).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.models import parse_model_config, init_model
from yolov3_tpu.models.network import head_grid_sizes
from yolov3_tpu.parallel.mesh import (
    SPATIAL_AXIS,
    batch_sharding,
    image_sharding,
    make_data_parallel_mesh,
    make_mesh,
)
from yolov3_tpu.parallel.train_step import init_train_state, make_adam, make_train_step

ANCHORS = np.array(
    [[0.1, 0.1], [0.2, 0.2], [0.3, 0.3],
     [0.4, 0.4], [0.5, 0.5], [0.6, 0.6]], np.float32).reshape(2, 3, 2)


@pytest.fixture(scope="module")
def setup(repo_root):
    import os

    spec = parse_model_config(
        os.path.join(repo_root, "config/models/yolov3_tiny/model.yaml"), nclasses=3)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    return spec, params, state


def test_mesh_axes():
    mesh = make_mesh(spatial=4)
    assert mesh.axis_names == ("data", SPATIAL_AXIS)
    assert mesh.devices.shape == (2, 4)
    # image sharding splits (batch, H); batch sharding leaves H whole
    assert image_sharding(mesh).spec == jax.sharding.PartitionSpec("data", "spatial")
    assert batch_sharding(mesh).spec == jax.sharding.PartitionSpec("data")


def test_mesh_validation():
    with pytest.raises(ValueError, match="divide the device count"):
        make_mesh(spatial=3)  # 3 does not divide 8
    with pytest.raises(ValueError, match="divisible"):
        make_data_parallel_mesh(batch_size=3, spatial=2)  # data axis 4, 3 % 4
    # pure SP: data axis 1 serves any batch, including 1
    mesh = make_data_parallel_mesh(batch_size=1, spatial=8)
    assert mesh.devices.shape == (1, 8)


def test_spatial_predictor_matches_single_device(setup):
    """Forward+decode+NMS under (data=2 × spatial=4): identical detections
    to the unsharded predictor (halo exchanges must be value-neutral)."""
    from yolov3_tpu.apps.inference_app import make_predictor

    spec, params, state = setup
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(4, 96, 96, 3).astype(np.float32))

    kw = dict(anchors_table=ANCHORS, nclasses=3, yolo_max_boxes=20,
              nms_iou_threshold=0.5, nms_score_threshold=0.1)
    p1 = make_predictor(spec, params, state, **kw)
    pS = make_predictor(spec, params, state, mesh=make_mesh(spatial=4), **kw)

    for a, b in zip(p1(images), pS(images)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)


def test_pure_spatial_batch_one(setup):
    """The B=1 latency configuration: one image over ALL 8 devices
    (data axis 1, spatial 8)."""
    from yolov3_tpu.apps.inference_app import make_predictor

    spec, params, state = setup
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(1, 96, 96, 3).astype(np.float32))

    kw = dict(anchors_table=ANCHORS, nclasses=3, yolo_max_boxes=20,
              nms_iou_threshold=0.5, nms_score_threshold=0.1)
    p1 = make_predictor(spec, params, state, **kw)
    pS = make_predictor(spec, params, state,
                        mesh=make_data_parallel_mesh(1, spatial=8), **kw)

    out1, outS = p1(images), pS(images)
    for a, b in zip(out1, outS):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-5)
    # the input really was row-sharded over all 8 devices
    sharded = jax.device_put(images, image_sharding(make_data_parallel_mesh(1, spatial=8)))
    assert len({s.device for s in sharded.addressable_shards}) == 8


def test_spatial_train_step_matches_single_device(setup):
    """One full train step (assignment + fwd + loss + grads + Adam) on a
    (data=4 × spatial=2) mesh vs single device: same loss, same updated
    params. Sync-BN must reduce over the global batch AND all row shards."""
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

    mesh = make_mesh(spatial=2)
    stepS = make_train_step(spec, ANCHORS, grid_sizes, batch_size=8,
                            optimizer=optimizer, mesh=mesh)
    tsS = init_train_state(params, state, optimizer)
    tsS, mS = stepS(
        tsS,
        jax.device_put(jnp.asarray(images), image_sharding(mesh)),
        jax.device_put(jnp.asarray(labels), batch_sharding(mesh)),
    )

    np.testing.assert_allclose(float(m1["total_loss"]), float(mS["total_loss"]), rtol=1e-5)
    k1 = np.asarray(ts1["params"]["head0"]["layer2"]["kernel"])
    kS = np.asarray(tsS["params"]["head0"]["layer2"]["kernel"])
    np.testing.assert_allclose(k1, kS, atol=2e-6)
    b1 = np.asarray(ts1["bn_state"]["backbone"]["layer1"]["mean"])
    bS = np.asarray(tsS["bn_state"]["backbone"]["layer1"]["mean"])
    np.testing.assert_allclose(b1, bS, rtol=1e-4)


def test_train_app_spatial_e2e(repo_root, toy_dataset, tmp_path):
    """`spatial_partitioning: 2` through the train APP (config key → 2-D
    mesh → sharded steps → checkpoint), one epoch on the toy dataset; a
    bad factor is rejected before any compile."""
    import os

    import yaml

    from .conftest import absolutize_run_config
    from yolov3_tpu.apps.train_app import Train

    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        cfg = yaml.safe_load(open("config/train_config.yaml"))
    finally:
        os.chdir(cwd)
    cfg.update(image_size=96, epochs=1, batch_size=8, training_mode="fit",
               output_checkpoints_path=f"{tmp_path}/sp.tf",
               spatial_partitioning=2)
    absolutize_run_config(cfg, root=repo_root)
    os.chdir(tmp_path)
    try:
        bad = dict(cfg, spatial_partitioning=3)  # 3 does not divide 8
        with pytest.raises(ValueError, match="spatial_partitioning"):
            Train()(**bad)
        Train()(**cfg)
    finally:
        os.chdir(cwd)
    assert os.path.exists(f"{tmp_path}/sp.tf.npz")
