"""Darknet .cfg model configs (models/darknet_cfg.py) — extension.

The killer check: the canonical yolov3-tiny.cfg must be ARCHITECTURALLY
IDENTICAL to the bundled tiny YAML DSL — same parameter count, and, with
the same Darknet .weights imported into both, the same forward outputs."""

import jax
import numpy as np
import pytest

from yolov3_tpu.models import init_model, parse_model_config
from yolov3_tpu.models.network import apply_model, param_count

TINY_CFG = """
[net]
# training hyperparameters are ignored by the model parser
width=416
height=416
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=64
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=128
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=256
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=512
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=1

[convolutional]
batch_normalize=1
filters=1024
size=3
stride=1
pad=1
activation=leaky

###########

[convolutional]
batch_normalize=1
filters=256
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=512
size=3
stride=1
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=255
activation=linear

[yolo]
mask = 3,4,5
anchors = 10,14,  23,27,  37,58,  81,82,  135,169,  344,319
classes=80
num=6
jitter=.3

[route]
layers = -4

[convolutional]
batch_normalize=1
filters=128
size=1
stride=1
pad=1
activation=leaky

[upsample]
stride=2

[route]
layers = -1, 8

[convolutional]
batch_normalize=1
filters=256
size=3
stride=1
pad=1
activation=leaky

[convolutional]
size=1
stride=1
pad=1
filters=255
activation=linear

[yolo]
mask = 0,1,2
anchors = 10,14,  23,27,  37,58,  81,82,  135,169,  344,319
classes=80
num=6
"""


@pytest.fixture(scope="module")
def tiny_cfg_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "yolov3-tiny.cfg"
    p.write_text(TINY_CFG)
    return str(p)


def test_cfg_matches_yaml_dsl_params_and_forward(tiny_cfg_path, repo_root):
    """cfg spec == bundled tiny YAML spec: identical parameter count, and
    identical forward outputs when the same .weights file is imported
    into both (the conv walk order must agree too)."""
    import os

    from yolov3_tpu.io.darknet import load_darknet_weights, save_darknet_weights

    nclasses = 80
    cfg_spec = parse_model_config(tiny_cfg_path, nclasses)
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        yaml_spec = parse_model_config("config/models/yolov3_tiny/model.yaml",
                                       nclasses)
    finally:
        os.chdir(cwd)

    params_cfg, state_cfg = init_model(jax.random.PRNGKey(0), cfg_spec)
    params_yaml, state_yaml = init_model(jax.random.PRNGKey(0), yaml_spec)
    # 8,852,366 trainable (Keras's 8,858,734 total additionally counts the
    # 6,368 BN moving statistics, which live in `state` here)
    assert param_count(params_cfg) == param_count(params_yaml) == 8_852_366

    # one .weights file drives both specs to the same forward
    weights = tiny_cfg_path + ".weights"
    save_darknet_weights(cfg_spec, params_cfg, state_cfg, weights)
    p1, s1 = load_darknet_weights(cfg_spec, weights)
    p2, s2 = load_darknet_weights(yaml_spec, weights)
    x = np.random.RandomState(0).rand(1, 96, 96, 3).astype(np.float32)
    out1, _ = apply_model(cfg_spec, p1, s1, x, train=False)
    out2, _ = apply_model(yaml_spec, p2, s2, x, train=False)
    assert len(out1) == len(out2) == 2
    for a, b in zip(out1, out2):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_cfg_head_adapts_to_nclasses(tiny_cfg_path):
    """classes=80 cfg + a 3-class run: the convs feeding each [yolo] are
    re-parameterized to 3*(3+5)=24 filters, everything else unchanged."""
    spec = parse_model_config(tiny_cfg_path, 3)
    (sub,) = spec.sub_models
    yolo_idx = [i for i, l in enumerate(sub.layers) if l.kind == "yolo"]
    assert sub.outputs_layers == tuple(yolo_idx)
    for i in yolo_idx:
        assert sub.layers[i - 1]["filters"] == 3 * (3 + 5)
    # a non-head conv is untouched
    assert sub.layers[0]["filters"] == 16


def test_cfg_errors(tmp_path):
    bad = tmp_path / "region.cfg"
    bad.write_text("[net]\nwidth=416\n[region]\nclasses=20\n")
    with pytest.raises(ValueError, match=r"unsupported section \[region\]"):
        parse_model_config(str(bad), 20)

    mismatch = tmp_path / "mismatch.cfg"
    mismatch.write_text(
        "[convolutional]\nfilters=100\nsize=1\nstride=1\nactivation=linear\n"
        "[yolo]\nmask = 0,1,2\nclasses=80\n")
    with pytest.raises(ValueError, match="don't match"):
        parse_model_config(str(mismatch), 3)


MINI_RES_CFG = """
[net]
width=64

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=4
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear

[convolutional]
size=1
stride=1
pad=1
filters=24
activation=linear

[yolo]
mask = 0,1,2
classes=3
num=3
"""

MINI_RES_YAML = """
sub_models_configs:
  - name: model
    outputs_layers: [5]
    layers_config:
      - {type: convolutional, filters: 8, size: 3, stride: 2, pad: 1, activation: leaky, batch_normalize: 1}
      - {type: convolutional, filters: 4, size: 1, stride: 1, pad: 1, activation: leaky, batch_normalize: 1}
      - {type: convolutional, filters: 8, size: 3, stride: 1, pad: 1, activation: leaky, batch_normalize: 1}
      - {type: shortcut, from: -3, activation: linear}
      - {type: convolutional, filters: '3*(5+nclasses)', size: 1, stride: 1, pad: 1, activation: linear}
      - {type: yolo}
output_stage: model
"""


def test_cfg_residual_block_matches_yaml(tmp_path):
    """A shortcut (residual) cfg — the construct the full yolov3.cfg is
    built from — produces the same forward as the equivalent YAML DSL
    with shared Darknet weights (incl. the stride-2 Darknet padding)."""
    from yolov3_tpu.io.darknet import load_darknet_weights, save_darknet_weights

    cfg_path = tmp_path / "mini.cfg"
    cfg_path.write_text(MINI_RES_CFG)
    yaml_path = tmp_path / "mini.yaml"
    yaml_path.write_text(MINI_RES_YAML)

    spec_cfg = parse_model_config(str(cfg_path), 3)
    spec_yaml = parse_model_config(str(yaml_path), 3)
    params, state = init_model(jax.random.PRNGKey(1), spec_cfg)
    weights = str(tmp_path / "mini.weights")
    save_darknet_weights(spec_cfg, params, state, weights)
    p1, s1 = load_darknet_weights(spec_cfg, weights)
    p2, s2 = load_darknet_weights(spec_yaml, weights)
    x = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
    (o1,), _ = apply_model(spec_cfg, p1, s1, x, train=False)
    (o2,), _ = apply_model(spec_yaml, p2, s2, x, train=False)
    assert o1.shape == o2.shape
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


@pytest.mark.parametrize("family,nclasses", [
    ("yolov3", 80), ("yolov3_tiny", 3), ("yolov3_spp", 80)])
def test_cfg_emitter_roundtrip(family, nclasses, tmp_path, repo_root):
    """write_darknet_cfg ∘ parse_darknet_cfg is forward-identity for all
    three bundled families: the emitted cfg, parsed back, produces the
    same outputs as the original YAML DSL with shared .weights — i.e. the
    emitter expresses sub-model graphs (incl. yolov3's 23 shortcuts and
    SPP's cascaded routes) correctly in Darknet's flat indexing."""
    import os

    from yolov3_tpu.io.darknet import load_darknet_weights, save_darknet_weights
    from yolov3_tpu.models.darknet_cfg import write_darknet_cfg

    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec_yaml = parse_model_config(f"config/models/{family}/model.yaml",
                                       nclasses)
    finally:
        os.chdir(cwd)
    cfg_path = str(tmp_path / f"{family}.cfg")
    write_darknet_cfg(spec_yaml, cfg_path, image_size=416)
    spec_cfg = parse_model_config(cfg_path, nclasses)

    params, state = init_model(jax.random.PRNGKey(0), spec_yaml)
    assert param_count(init_model(jax.random.PRNGKey(0), spec_cfg)[0]) \
        == param_count(params)
    weights = str(tmp_path / f"{family}.weights")
    save_darknet_weights(spec_yaml, params, state, weights)
    p1, s1 = load_darknet_weights(spec_yaml, weights)
    p2, s2 = load_darknet_weights(spec_cfg, weights)
    x = np.random.RandomState(0).rand(1, 96, 96, 3).astype(np.float32)
    out1, _ = apply_model(spec_yaml, p1, s1, x, train=False)
    out2, _ = apply_model(spec_cfg, p2, s2, x, train=False)
    assert len(out1) == len(out2)
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
