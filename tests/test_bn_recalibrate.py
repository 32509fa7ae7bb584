"""BN recalibration (tools/bn_recalibrate.py) — AdaBN-style serving-
resolution calibration.

The algebra under test: `recalibrate` recovers each batch's statistics
from the post-EMA state (batch = (new - m*old)/(1-m)) and averages them.
Exact property: after recalibrating on a single batch, the state IS that
batch's statistics, so the train-mode EMA update on the same batch is a
fixed point (new = m*batch + (1-m)*batch = batch).
"""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_spec():
    from yolov3_tpu.models import parse_model_config

    return parse_model_config(
        os.path.join(REPO, "config/models/yolov3_tiny/model.yaml"), nclasses=3)


def test_single_batch_recalibration_is_ema_fixed_point():
    from tools.bn_recalibrate import recalibrate
    from yolov3_tpu.models import apply_model, init_model
    from yolov3_tpu.models.layers import BN_MOMENTUM

    spec = _tiny_spec()
    params, state = init_model(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(3)
    batch = rng.rand(4, 96, 96, 3).astype(np.float32)

    new_state, n = recalibrate(spec, params, state, [batch], BN_MOMENTUM)
    assert n == 1

    _, after = apply_model(spec, params, new_state,
                           jnp.asarray(batch), train=True)
    flat_a, _ = jax.tree_util.tree_flatten(new_state)
    flat_b, _ = jax.tree_util.tree_flatten(after)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_two_batch_recalibration_averages():
    """With two batches the result is the mean of the two single-batch
    recalibrations — linearity of the estimator."""
    from tools.bn_recalibrate import recalibrate
    from yolov3_tpu.models import init_model
    from yolov3_tpu.models.layers import BN_MOMENTUM

    spec = _tiny_spec()
    params, state = init_model(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(4)
    b1 = rng.rand(4, 96, 96, 3).astype(np.float32)
    b2 = rng.rand(4, 96, 96, 3).astype(np.float32)

    s1, _ = recalibrate(spec, params, state, [b1], BN_MOMENTUM)
    s2, _ = recalibrate(spec, params, state, [b2], BN_MOMENTUM)
    s12, _ = recalibrate(spec, params, state, [b1, b2], BN_MOMENTUM)

    mean = jax.tree.map(lambda a, b: (a + b) / 2, s1, s2)
    fa, _ = jax.tree_util.tree_flatten(s12)
    fb, _ = jax.tree_util.tree_flatten(mean)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_cli_writes_sibling_checkpoint(tmp_path):
    """End-to-end through the CLI on the bundled trained toy checkpoint:
    writes <ckpt>.cal<size> loadable by the standard loader, with stats
    that actually moved."""
    out = str(tmp_path / "recal.tf")
    r = subprocess.run(
        [sys.executable, "tools/bn_recalibrate.py",
         "--ckpt", "checkpoints/output/yolov3_train_tiny.tf",
         "--model_config", "config/models/yolov3_tiny/model.yaml",
         "--data_root", "datasets/shapes_toy", "--image_size", "96",
         "--batches", "1", "--batch_size", "8", "--out", out],
        cwd=REPO, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out + ".npz")

    from yolov3_tpu.io.resolve import load_weights
    from yolov3_tpu.models import init_model

    spec = _tiny_spec()
    params, state = init_model(jax.random.PRNGKey(0), spec)
    p0, s0 = load_weights(spec, params, state,
                          os.path.join(REPO, "checkpoints/output/yolov3_train_tiny.tf"))
    p1, s1 = load_weights(spec, params, state, out)
    # params byte-identical, stats changed
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree_util.tree_leaves(s0),
                                jax.tree_util.tree_leaves(s1)))
    assert moved
