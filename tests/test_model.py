import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.models import parse_model_config, init_model, apply_model, fold_batch_norm
from yolov3_tpu.models.network import head_grid_sizes, param_count, state_count


def _cfg(repo_root, arch):
    return os.path.join(repo_root, "config", "models", arch, "model.yaml")


@pytest.fixture(scope="module")
def tiny_spec(repo_root):
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        return parse_model_config(_cfg(repo_root, "yolov3_tiny"), nclasses=3)
    finally:
        os.chdir(cwd)


@pytest.fixture(scope="module")
def full_spec(repo_root):
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        return parse_model_config(_cfg(repo_root, "yolov3"), nclasses=80)
    finally:
        os.chdir(cwd)


def test_param_count_matches_keras_yolov3(full_spec):
    """61,949,149 trainable + 52,608 BN statistics = 62,001,757 — the exact
    Keras param count of YOLOv3 @ 80 classes."""
    params, state = init_model(jax.random.PRNGKey(0), full_spec)
    assert param_count(params) == 61_949_149
    assert state_count(state) == 52_608


def test_thin_heads_variant_builds_and_matches_keras(repo_root):
    """Bundled thin-heads wiring (reference model_thin_heads.yaml: necks
    export [-2,-1]; heads consume the final tap, the next neck's lateral
    branch the -2 tap). Golden 62,165,597 = the reference Keras
    count_params() of its thin-heads build @ 80 classes (incl. BN stats)."""
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config(
            os.path.join(repo_root, "config", "models", "yolov3", "model_thin_heads.yaml"),
            nclasses=80)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    assert param_count(params) + state_count(state) == 62_165_597
    assert head_grid_sizes(spec, 416) == (13, 26, 52)


def test_forward_shapes_tiny(tiny_spec):
    params, state = init_model(jax.random.PRNGKey(0), tiny_spec)
    x = jnp.zeros((2, 416, 416, 3))
    outs, _ = jax.jit(lambda p, s, x: apply_model(tiny_spec, p, s, x))(params, state, x)
    assert [o.shape for o in outs] == [(2, 13, 13, 3, 8), (2, 26, 26, 3, 8)]


def test_grid_sizes_derived_from_graph(tiny_spec, full_spec):
    assert head_grid_sizes(tiny_spec, 416) == (13, 26)
    assert head_grid_sizes(full_spec, 416) == (13, 26, 52)
    # resolution-polymorphic (the reference DSL hardcodes 416-only reshapes)
    assert head_grid_sizes(full_spec, 608) == (19, 38, 76)


def test_output_stage_truncation(tiny_spec):
    backbone_spec = tiny_spec.with_output_stage("backbone")
    params, state = init_model(jax.random.PRNGKey(0), backbone_spec)
    x = jnp.zeros((1, 416, 416, 3))
    outs, _ = apply_model(backbone_spec, params, state, x)
    # tiny backbone exposes two taps (outputs_layers -5, -1)
    assert len(outs) == 2


def test_bn_fold_equivalence(tiny_spec):
    params, state = init_model(jax.random.PRNGKey(1), tiny_spec)
    # randomize BN state so folding is non-trivial
    state = jax.tree.map(
        lambda x: x + jax.random.uniform(jax.random.PRNGKey(2), x.shape) * 0.3, state
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 128, 128, 3))
    outs, _ = apply_model(tiny_spec, params, state, x, train=False)
    folded = fold_batch_norm(params, state)
    outs_folded, _ = apply_model(tiny_spec, folded, {}, x, train=False)
    for a, b in zip(outs, outs_folded):
        # fp32 reassociation: scale-into-kernel vs normalize-activations
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_train_mode_updates_bn_state(tiny_spec):
    params, state = init_model(jax.random.PRNGKey(0), tiny_spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) + 3.0
    _, new_state = apply_model(tiny_spec, params, state, x, train=True)
    mean0 = state["backbone"]["layer1"]["mean"]
    mean1 = new_state["backbone"]["layer1"]["mean"]
    assert not np.allclose(np.asarray(mean0), np.asarray(mean1))
    # frozen: unchanged
    _, frozen_state = apply_model(tiny_spec, params, state, x, train=True,
                                  bn_frozen=("backbone",))
    assert "backbone" not in frozen_state or np.allclose(
        np.asarray(frozen_state["backbone"]["layer1"]["mean"]), np.asarray(mean0)
    )


def test_spp_variant_builds_and_matches_keras(repo_root):
    """Bundled YOLOv3-SPP (Darknet mainline yolov3-spp.cfg: stride-1
    maxpools 5/9/13 + cascaded pairwise concats in neck0 → 2048-ch squeeze).
    Golden 63,052,381 = the reference Keras count_params() of the same
    config @ 80 classes (incl. BN stats), verified via
    core/parse_model.py's build of config/models/yolov3_spp/model.yaml."""
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config(
            os.path.join(repo_root, "config", "models", "yolov3_spp", "model.yaml"),
            nclasses=80)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    assert param_count(params) + state_count(state) == 63_052_381
    assert head_grid_sizes(spec, 416) == (13, 26, 52)
    # the SPP block is grid-preserving at any input resolution
    assert head_grid_sizes(spec, 608) == (19, 38, 76)
