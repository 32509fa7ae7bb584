"""TFJS export (utilities/convert_model_to_tfjs.py): the jax2tf SavedModel
leg runs end-to-end — export, reload in TF, and verify the TF graph
reproduces the JAX forward (reference utilities/convert_model_to_tfjs.py
shells out on a Keras SavedModel; ours exports the JAX model via jax2tf).
The tensorflowjs CLI leg stays gated (not installed in this image)."""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                "utilities"))


def test_jax2tf_saved_model_roundtrip(repo_root, tmp_path):
    import jax
    from yolov3_tpu.models import parse_model_config, init_model, apply_model, fold_batch_norm
    from yolov3_tpu.io.resolve import save_weights
    from convert_model_to_tfjs import export_saved_model

    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    ckpt = str(tmp_path / "w")
    save_weights(spec, params, state, ckpt)
    names = tmp_path / "c.names"
    names.write_text("a\nb\nc\n")

    out_dir = str(tmp_path / "saved_model")
    cfg = os.path.join(repo_root, "config/models/yolov3_tiny/model.yaml")
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        export_saved_model(cfg, ckpt, str(names), 96, out_dir)
    finally:
        os.chdir(cwd)
    assert os.path.exists(os.path.join(out_dir, "saved_model.pb"))

    # reload and compare against the folded JAX forward
    x = np.random.RandomState(0).rand(1, 96, 96, 3).astype(np.float32)
    module = tf.saved_model.load(out_dir)
    tf_outs = module(tf.constant(x))

    folded = fold_batch_norm(params, state)
    jax_outs, _ = apply_model(spec, folded, {}, x, train=False)
    assert len(tf_outs) == len(jax_outs) == 2  # tiny: 2 heads
    for t, j in zip(tf_outs, jax_outs):
        np.testing.assert_allclose(np.asarray(t), np.asarray(j), atol=2e-5)
