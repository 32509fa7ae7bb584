import os

import jax
import numpy as np
import pytest

from yolov3_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from yolov3_tpu.io.darknet import load_darknet_weights, save_darknet_weights
from yolov3_tpu.io.resolve import load_weights, save_weights
from yolov3_tpu.models import parse_model_config, init_model, apply_model


@pytest.fixture(scope="module")
def tiny_spec(repo_root):
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        return parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)


def test_npz_checkpoint_roundtrip(tmp_path, tiny_spec):
    params, state = init_model(jax.random.PRNGKey(0), tiny_spec)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, {"params": params, "bn_state": state}, step=7)
    tree, step = load_checkpoint(path, like={"params": params, "bn_state": state})
    assert step == 7
    for a, b in zip(jax.tree.leaves(tree["params"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_partial_load_expect_partial_semantics(tmp_path, tiny_spec):
    """Native .npz sub-tree checkpoints load partially through
    resolve.load_weights (Keras expect_partial parity — same contract as
    the TF-format reader): present leaves restore, missing leaves keep
    their template values, and a disjoint checkpoint still raises."""
    params, state = init_model(jax.random.PRNGKey(1), tiny_spec)
    bb = tiny_spec.sub_models[0].name
    path = str(tmp_path / "backbone_only.npz")
    save_checkpoint(path, {"params": {bb: params[bb]},
                           "bn_state": {bb: state.get(bb, {})}})

    tmpl_p, tmpl_s = init_model(jax.random.PRNGKey(9), tiny_spec)
    out_p, out_s = load_weights(tiny_spec, tmpl_p, tmpl_s, path)
    for a, b in zip(jax.tree.leaves(out_p[bb]), jax.tree.leaves(params[bb])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    other = tiny_spec.sub_models[-1].name
    for a, b in zip(jax.tree.leaves(out_p[other]), jax.tree.leaves(tmpl_p[other])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a checkpoint sharing no keys with the template must still fail loudly
    bogus = str(tmp_path / "bogus.npz")
    save_checkpoint(bogus, {"unrelated": {"x": np.zeros(3, np.float32)}})
    with pytest.raises(ValueError, match="matched no"):
        load_weights(tiny_spec, tmpl_p, tmpl_s, bogus)

    # strict mode (resume path) still rejects missing keys
    with pytest.raises(ValueError, match="missing keys"):
        load_checkpoint(path, like={"params": tmpl_p, "bn_state": tmpl_s})


def test_darknet_roundtrip(tmp_path, tiny_spec):
    params, state = init_model(jax.random.PRNGKey(5), tiny_spec)
    # perturb BN state so the roundtrip is non-trivial
    state = jax.tree.map(lambda x: x + 0.25, state)
    path = str(tmp_path / "model.weights")
    save_darknet_weights(tiny_spec, params, state, path)
    params2, state2 = load_darknet_weights(tiny_spec, path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_darknet_truncated_raises(tmp_path, tiny_spec):
    params, state = init_model(jax.random.PRNGKey(5), tiny_spec)
    path = str(tmp_path / "model.weights")
    save_darknet_weights(tiny_spec, params, state, path)
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) // 2])
    with pytest.raises(ValueError):
        load_darknet_weights(tiny_spec, path)


def test_save_load_weights_tf_style_path(tmp_path, tiny_spec):
    """Config paths like 'foo.tf' get a native .npz beside them and load back."""
    params, state = init_model(jax.random.PRNGKey(0), tiny_spec)
    prefix = str(tmp_path / "yolov3_train_tiny.tf")
    save_weights(tiny_spec, params, state, prefix)
    assert os.path.exists(prefix + ".npz")
    p2, s2 = init_model(jax.random.PRNGKey(9), tiny_spec)
    p2, s2 = load_weights(tiny_spec, p2, s2, prefix)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_converted_weights_forward_consistency(tmp_path, tiny_spec):
    """convert → save → load → forward produces identical outputs."""
    import jax.numpy as jnp

    params, state = init_model(jax.random.PRNGKey(5), tiny_spec)
    path = str(tmp_path / "model.weights")
    save_darknet_weights(tiny_spec, params, state, path)
    params2, state2 = load_darknet_weights(tiny_spec, path)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    a, _ = apply_model(tiny_spec, params, state, x)
    b, _ = apply_model(tiny_spec, params2, state2, x)
    for u, v in zip(a, b):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), rtol=1e-6)


def test_darknet_roundtrip_spp(repo_root, tmp_path):
    """The SPP variant's conv walk (convs interleaved with param-free
    maxpool/route layers in neck0) through the Darknet format: a real
    yolov3-spp.weights imports through the exact same path."""
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_spp/model.yaml", nclasses=1)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(2), spec)
    state = jax.tree.map(lambda x: x + 0.125, state)
    path = str(tmp_path / "spp.weights")
    save_darknet_weights(spec, params, state, path)
    params2, state2 = load_darknet_weights(spec, path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
