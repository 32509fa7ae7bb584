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


def test_train_rewrite_loss_grads_bn_state_match():
    """s2d_stem_train is a pure reschedule: loss, gradients (w.r.t. the
    ORIGINAL params), and new BN running stats must match the un-rewritten
    spec to fp32 summation-order tolerance."""
    import jax.numpy as jnp

    from yolov3_tpu.ops.assign import assign_targets
    from yolov3_tpu.ops.loss import yolo_loss_terms
    from yolov3_tpu.ops.s2d import s2d_stem_train

    spec = _mini_spec()
    spec2 = s2d_stem_train(spec)
    assert spec2 is not spec
    l0, l1 = spec2.sub_models[0].layers[:2]
    assert l0["s2d_phase"] == "conv0" and l0["filters"] == 32
    assert l1["s2d_phase"] == "conv1"

    params, state = init_model(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    labels = np.zeros((2, 4, 6), np.float32)
    labels[:, 0] = [0.2, 0.2, 0.55, 0.6, 1, 1]
    labels[:, 1] = [0.5, 0.4, 0.9, 0.8, 1, 2]
    labels = jnp.asarray(labels)
    anchors = jnp.asarray(rng.rand(1, 3, 2).astype(np.float32) * 0.5 + 0.05)
    y_true = assign_targets(labels, anchors, (16,))

    def loss(p, s, this_spec):
        outs, new_bn = apply_model(this_spec, p, s, images, train=True)
        total = sum(jnp.sum(yolo_loss_terms(t, o, anchors[i], spec.nclasses))
                    for i, (t, o) in enumerate(zip(y_true, outs)))
        return total, new_bn

    (l_ref, bn_ref), g_ref = jax.jit(
        jax.value_and_grad(loss, has_aux=True), static_argnums=2)(params, state, spec)
    (l_new, bn_new), g_new = jax.jit(
        jax.value_and_grad(loss, has_aux=True), static_argnums=2)(params, state, spec2)

    np.testing.assert_allclose(float(l_ref), float(l_new), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5), bn_ref, bn_new)

    # gradients: mathematically identical; fp32 summation reordering leaves
    # ~5e-5 relative norm (measured) — per-leaf norm-ratio check is robust
    # to elementwise cancellation on near-zero entries
    def norm_close(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-30)
        assert rel < 1e-3, f"grad relnorm {rel:.2e}"

    jax.tree.map(norm_close, g_ref, g_new)
    # gradient pytrees have identical structure (original param shapes)
    assert jax.tree.structure(g_ref) == jax.tree.structure(g_new)


def test_train_rewrite_eval_mode_and_noop():
    """Inference-mode BN (running stats) path matches too; tiny no-ops."""
    from yolov3_tpu.ops.s2d import s2d_stem_train

    spec = _mini_spec()
    spec2 = s2d_stem_train(spec)
    params, state = init_model(jax.random.PRNGKey(3), spec)
    rng = np.random.RandomState(1)
    x = np.asarray(rng.rand(2, 32, 32, 3), np.float32)
    ref, _ = jax.jit(lambda p, s, x: apply_model(spec, p, s, x))(params, state, x)
    out, _ = jax.jit(lambda p, s, x: apply_model(spec2, p, s, x))(params, state, x)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o), rtol=1e-4, atol=1e-5)

    assert s2d_stem_train(spec, image_size=417) is spec

    # bias-only (no BN) stem conv: refuse (per-channel bias can't tile)
    nclasses = 3
    layers = (
        _conv(8, 3, 1, bn=False),
        _conv(16, 3, 2),
        _conv(3 * (5 + nclasses), 1, 1, bn=False, activation="linear"),
        LayerSpec(kind="yolo", attrs=_attrs({})),
    )
    sm = SubModelSpec(name="model_head", layers=layers, inputs=None,
                      outputs_layers=(len(layers) - 1,))
    nospec = ModelSpec(sub_models=(sm,), output_stage="head", nclasses=nclasses)
    assert s2d_stem_train(nospec) is nospec


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
