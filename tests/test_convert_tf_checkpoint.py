"""Roundtrip test for the legacy Keras TF-checkpoint path:
synthetic TF-format checkpoint → load_tf_keras_checkpoint →
tools/convert_tf_checkpoint.py → native .npz → values identical.

Keras 3 (this environment) can no longer *write* the TF-format checkpoints
the reference produced (TF 2.8 save_weights — reference train.py:76-78), so
the fixture is built with tf.train.Checkpoint using the identical Keras
object-graph layout (layer_with_weights-<i>/layer_with_weights-<j>/<leaf>
/.ATTRIBUTES/VARIABLE_VALUE), which is what the reader walks
(yolov3_tpu/io/checkpoint.py::_weighted_layer_paths).
"""

import os

import numpy as np
import pytest

from .conftest import has_tf

pytestmark = pytest.mark.skipif(not has_tf(), reason="tensorflow unavailable")

import jax  # noqa: E402

from yolov3_tpu.models import init_model, parse_model_config  # noqa: E402


@pytest.fixture()
def tiny_spec(repo_root):
    return parse_model_config(
        os.path.join(repo_root, "config/models/yolov3_tiny/model.yaml"), nclasses=7
    )


def _write_keras_style_tf_checkpoint(spec, params, state, prefix):
    """Write (params, state) as a Keras-object-graph TF checkpoint."""
    import tensorflow as tf

    root = tf.train.Checkpoint()
    keep_alive = []  # tf.train.Checkpoint tracks by weak-ish attrs; keep refs
    for sm_idx, sm in enumerate(spec.sub_models):
        sm_node = tf.train.Checkpoint()
        root._track_trackable(sm_node, f"layer_with_weights-{sm_idx}")
        keep_alive.append(sm_node)
        wl = 0
        for i, layer in enumerate(sm.layers):
            if layer.kind != "convolutional":
                continue
            entry = params[sm.name][f"layer{i}"]
            conv_node = tf.train.Checkpoint(
                kernel=tf.Variable(np.asarray(entry["kernel"])),
                **({} if "bn" in entry else {"bias": tf.Variable(np.asarray(entry["bias"]))}),
            )
            sm_node._track_trackable(conv_node, f"layer_with_weights-{wl}")
            keep_alive.append(conv_node)
            wl += 1
            if "bn" in entry:
                st = state[sm.name][f"layer{i}"]
                bn_node = tf.train.Checkpoint(
                    gamma=tf.Variable(np.asarray(entry["bn"]["gamma"])),
                    beta=tf.Variable(np.asarray(entry["bn"]["beta"])),
                    moving_mean=tf.Variable(np.asarray(st["mean"])),
                    moving_variance=tf.Variable(np.asarray(st["var"])),
                )
                sm_node._track_trackable(bn_node, f"layer_with_weights-{wl}")
                keep_alive.append(bn_node)
                wl += 1
    root.write(prefix)
    return prefix


def test_tf_checkpoint_reader_and_convert_tool_roundtrip(tmp_path, tiny_spec):
    from yolov3_tpu.io.checkpoint import load_checkpoint
    from yolov3_tpu.io.resolve import load_weights

    # source-of-truth params (distinct seed from the init the loaders use)
    src_params, src_state = init_model(jax.random.PRNGKey(42), tiny_spec)
    prefix = str(tmp_path / "yolov3_train_tiny.tf")
    _write_keras_style_tf_checkpoint(tiny_spec, src_params, src_state, prefix)

    # 1) transparent legacy load via resolve.load_weights
    p0, s0 = init_model(jax.random.PRNGKey(0), tiny_spec)
    p1, s1 = load_weights(tiny_spec, p0, s0, prefix)
    first_conv = sorted(src_params["backbone"])[0]
    np.testing.assert_allclose(
        np.asarray(p1["backbone"][first_conv]["kernel"]),
        np.asarray(src_params["backbone"][first_conv]["kernel"]),
    )

    # 2) one-shot conversion tool → native npz
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import convert_tf_checkpoint

    out = str(tmp_path / "converted.npz")
    convert_tf_checkpoint.main([
        "--model-config", "config/models/yolov3_tiny/model.yaml",
        "--nclasses", "7", "--input", prefix, "--output", out,
    ])
    tree, _ = load_checkpoint(out)

    from yolov3_tpu.io.checkpoint import _flatten

    src_flat = _flatten({"params": src_params, "bn_state": src_state})
    conv_flat = _flatten(tree)
    assert set(src_flat) == set(conv_flat)
    for key in src_flat:
        np.testing.assert_allclose(conv_flat[key], src_flat[key], err_msg=key)
