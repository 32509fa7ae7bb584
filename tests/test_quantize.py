"""int8 PTQ: calibration + quantized forward numerics (CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.models import parse_model_config, init_model, apply_model, fold_batch_norm
from yolov3_tpu.ops.quantize import calibrate_activation_scales, quantize_params


@pytest.fixture(scope="module")
def setup(repo_root):
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    folded = fold_batch_norm(params, state)
    return spec, folded


def test_calibration_covers_all_convs(setup):
    spec, folded = setup
    rng = np.random.RandomState(0)
    absmax = calibrate_activation_scales(spec, folded, [rng.rand(2, 96, 96, 3).astype(np.float32)])
    nconvs = sum(1 for sm in spec.sub_models for l in sm.layers if l.kind == "convolutional")
    assert len(absmax) == nconvs
    assert all(v > 0 for v in absmax.values())


def test_quantized_forward_close_to_fp(setup):
    spec, folded = setup
    rng = np.random.RandomState(1)
    calib = [rng.rand(2, 96, 96, 3).astype(np.float32)]
    absmax = calibrate_activation_scales(spec, folded, calib)
    qparams = quantize_params(spec, folded, absmax)

    x = jnp.asarray(rng.rand(1, 96, 96, 3).astype(np.float32))
    ref, _ = apply_model(spec, folded, {}, x)
    q, _ = apply_model(spec, qparams, {}, x)
    for r, qq in zip(ref, q):
        r, qq = np.asarray(r), np.asarray(qq)
        rel = np.abs(r - qq).max() / (np.abs(r).max() + 1e-9)
        assert rel < 0.15, f"int8 rel error {rel}"


def test_final_head_convs_not_quantized(setup):
    spec, folded = setup
    rng = np.random.RandomState(2)
    absmax = calibrate_activation_scales(spec, folded, [rng.rand(1, 96, 96, 3).astype(np.float32)])
    qparams = quantize_params(spec, folded, absmax)
    for sm in spec.sub_models:
        if not any(l.kind == "yolo" for l in sm.layers):
            continue
        conv_idx = [i for i, l in enumerate(sm.layers) if l.kind == "convolutional"]
        final = qparams[sm.name][f"layer{conv_idx[-1]}"]
        assert "kernel" in final and "kernel_q" not in final
