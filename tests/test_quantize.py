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


def test_chain_forward_close_to_fp_and_per_conv_int8(setup):
    """Chain mode (int8 activations between convs, requant in the conv
    epilogue) must match fp to the same tolerance as per-conv int8 — the
    producer's out_scale is calibrated on the same tensor as the consumer's
    in_scale, so linear conv→conv edges requantize identically."""
    spec, folded = setup
    rng = np.random.RandomState(3)
    calib = [rng.rand(2, 96, 96, 3).astype(np.float32)]
    from yolov3_tpu.ops.quantize import calibrate_scales

    in_am, out_am = calibrate_scales(spec, folded, calib)
    q_old = quantize_params(spec, folded, in_am)
    q_chain = quantize_params(spec, folded, in_am, out_absmax=out_am)

    x = jnp.asarray(rng.rand(1, 96, 96, 3).astype(np.float32))
    f = jax.jit(lambda p: apply_model(spec, p, {}, x)[0])
    ref, old, chain = f(folded), f(q_old), f(q_chain)
    for r, o, c in zip(ref, old, chain):
        r, o, c = np.asarray(r), np.asarray(o), np.asarray(c)
        rel_old = np.abs(r - o).max() / (np.abs(r).max() + 1e-9)
        rel_chain = np.abs(r - c).max() / (np.abs(r).max() + 1e-9)
        assert rel_chain < 0.15, f"chain rel error {rel_chain}"
        # chain adds at most ~one extra rounding per edge over per-conv int8
        assert rel_chain < 2.0 * rel_old + 0.02, (rel_chain, rel_old)


def test_chain_scales_cover_all_quantized_convs(setup):
    spec, folded = setup
    rng = np.random.RandomState(4)
    from yolov3_tpu.ops.quantize import calibrate_scales

    in_am, out_am = calibrate_scales(spec, folded, [rng.rand(1, 96, 96, 3).astype(np.float32)])
    q = quantize_params(spec, folded, in_am, out_absmax=out_am)
    for sm in spec.sub_models:
        for key, entry in q[sm.name].items():
            if "kernel_q" in entry:
                assert "out_scale" in entry, (sm.name, key)


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
