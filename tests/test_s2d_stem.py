"""Space-to-depth stem rewrite (ops/s2d.py): bit-exactness + eligibility.

The transform must be EXACT (same int32 sums → same int8 activations →
identical model outputs), not merely close — it ships un-gated in the int8
serving tier.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.models import parse_model_config, init_model, apply_model, fold_batch_norm
from yolov3_tpu.models.spec import LayerSpec, ModelSpec, SubModelSpec, _attrs
from yolov3_tpu.ops.quantize import calibrate_scales, quantize_params
from yolov3_tpu.ops.s2d import s2d_stem


def _conv(filters, size, stride, bn=True, activation="leaky"):
    return LayerSpec(kind="convolutional", attrs=_attrs({
        "filters": filters, "size": size, "stride": stride, "pad": 1,
        "batch_normalize": bn, "activation": activation}))


def _mini_spec(nclasses=3):
    """Darknet-style stem + residual block + detection head in one sub-model."""
    layers = (
        _conv(8, 3, 1),                 # stem conv0
        _conv(16, 3, 2),                # stem conv1 (downsample)
        _conv(8, 1, 1),                 # res-block squeeze
        _conv(16, 3, 1),                # res-block expand
        LayerSpec(kind="shortcut", attrs=_attrs({"from": -3})),
        _conv(32, 3, 2),
        _conv(3 * (5 + nclasses), 1, 1, bn=False, activation="linear"),
        LayerSpec(kind="yolo", attrs=_attrs({})),
    )
    sm = SubModelSpec(name="model_head", layers=layers, inputs=None,
                      outputs_layers=(len(layers) - 1,))
    return ModelSpec(sub_models=(sm,), output_stage="head", nclasses=nclasses)


@pytest.mark.parametrize("chain", [False, True])
def test_bit_exact_forward(chain):
    spec = _mini_spec()
    params, state = init_model(jax.random.PRNGKey(0), spec)
    folded = fold_batch_norm(params, state)
    rng = np.random.RandomState(0)
    calib = [rng.rand(2, 64, 64, 3).astype(np.float32)]
    in_am, out_am = calibrate_scales(spec, folded, calib)
    qparams = quantize_params(spec, folded, in_am,
                              out_absmax=out_am if chain else None)

    spec2, qparams2 = s2d_stem(spec, qparams)
    assert spec2 is not spec, "transform should apply to the Darknet stem"
    l0, l1 = spec2.sub_models[0].layers[:2]
    assert (l0["size"], l0["stride"], l0["filters"]) == (4, 2, 32)
    assert l0["explicit_pad"] == ((1, 2), (1, 2))
    assert (l1["size"], l1["stride"]) == (2, 1)
    assert qparams2["model_head"]["layer0"]["kernel_q"].shape == (4, 4, 3, 32)
    assert qparams2["model_head"]["layer1"]["kernel_q"].shape == (2, 2, 32, 16)

    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    ref, _ = jax.jit(lambda p, x: apply_model(spec, p, {}, x))(qparams, x)
    out, _ = jax.jit(lambda p, x: apply_model(spec2, p, {}, x))(qparams2, x)
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))


def test_applies_to_full_yolov3_config(repo_root):
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3/model.yaml", nclasses=80)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    folded = fold_batch_norm(params, state)
    # fake calibration scales (positive) — enough to quantize every conv
    absmax = {(sm.name, f"layer{i}"): 1.0
              for sm in spec.sub_models
              for i, l in enumerate(sm.layers) if l.kind == "convolutional"}
    qparams = quantize_params(spec, folded, absmax)
    spec2, qparams2 = s2d_stem(spec, qparams)
    assert spec2 is not spec
    sm0 = spec2.sub_models[0]
    i0 = next(i for i, l in enumerate(sm0.layers) if l.kind == "convolutional")
    assert sm0.layers[i0]["filters"] == 128  # 4 × 32
    assert qparams2[sm0.name][f"layer{i0}"]["w_scale"].shape == (128,)
    assert qparams2[sm0.name][f"layer{i0 + 1}"]["kernel_q"].shape == (2, 2, 128, 64)
    # downstream layers untouched
    assert spec2.sub_models[1:] == spec.sub_models[1:]
    assert sm0.layers[i0 + 2:] == spec.sub_models[0].layers[i0 + 2:]


def test_noop_cases(repo_root):
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        tiny = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(1), tiny)
    folded = fold_batch_norm(params, state)
    absmax = {(sm.name, f"layer{i}"): 1.0
              for sm in tiny.sub_models
              for i, l in enumerate(sm.layers) if l.kind == "convolutional"}
    qparams = quantize_params(tiny, folded, absmax)
    spec2, qparams2 = s2d_stem(tiny, qparams)
    # tiny's stem is conv s1 + maxpool — pattern does not match
    assert spec2 is tiny and qparams2 is qparams

    # fp (unquantized) params: no-op as well
    full = _mini_spec()
    fparams, fstate = init_model(jax.random.PRNGKey(2), full)
    ffolded = fold_batch_norm(fparams, fstate)
    spec3, p3 = s2d_stem(full, ffolded)
    assert spec3 is full and p3 is ffolded


def test_guard_negative_route_reference_to_stem():
    """Route/shortcut indices are position-relative when negative
    (network.py resolves them against the layers-so-far list). A route at
    position 3 with layers: [-3] references layer 0 — the stem conv — so
    the rewrite must refuse (its output layout changes)."""
    nclasses = 3
    layers = (
        _conv(8, 3, 1),                 # 0: stem conv0 — referenced below!
        _conv(16, 3, 2),                # 1
        _conv(16, 1, 1),                # 2
        LayerSpec(kind="route", attrs=_attrs({"source": {"layers": [-3]}})),  # -> layer 0
        _conv(3 * (5 + nclasses), 1, 1, bn=False, activation="linear"),
        LayerSpec(kind="yolo", attrs=_attrs({})),
    )
    sm = SubModelSpec(name="model_head", layers=layers, inputs=None,
                      outputs_layers=(len(layers) - 1,))
    spec = ModelSpec(sub_models=(sm,), output_stage="head", nclasses=nclasses)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    folded = fold_batch_norm(params, state)
    absmax = {(sm.name, f"layer{i}"): 1.0 for i, l in enumerate(layers)
              if l.kind == "convolutional"}
    qparams = quantize_params(spec, folded, absmax)
    spec2, q2 = s2d_stem(spec, qparams)
    assert spec2 is spec and q2 is qparams


def test_guard_odd_image_size():
    spec = _mini_spec()
    params, state = init_model(jax.random.PRNGKey(0), spec)
    folded = fold_batch_norm(params, state)
    absmax = {(spec.sub_models[0].name, f"layer{i}"): 1.0
              for i, l in enumerate(spec.sub_models[0].layers)
              if l.kind == "convolutional"}
    qparams = quantize_params(spec, folded, absmax)
    spec2, q2 = s2d_stem(spec, qparams, image_size=417)
    assert spec2 is spec and q2 is qparams
    spec3, _ = s2d_stem(spec, qparams, image_size=416)
    assert spec3 is not spec
