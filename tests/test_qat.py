"""Weight-only QAT (ops/quantize.py::fake_quant_weights): lattice match with
the PTQ serving tier, BN-fold commutation, STE gradients, train-step e2e."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.models import fold_batch_norm, init_model, parse_model_config
from yolov3_tpu.ops.quantize import (fake_quant_kernel, fake_quant_weights,
                                     head_conv_taps, quantize_params)


@pytest.fixture(scope="module")
def tiny(repo_root):
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(3), spec)
    # nonzero BN statistics (incl. a few negative gammas) so folding is nontrivial
    state = jax.tree.map(lambda x: x + 0.3, state)
    params = jax.tree.map(lambda x: x, params)
    for sm in params.values():
        for entry in sm.values():
            if "bn" in entry:
                g = np.array(entry["bn"]["gamma"])
                g[::3] = -g[::3] - 0.1
                entry["bn"]["gamma"] = jnp.asarray(g)
    return spec, params, state


def test_fake_quant_matches_ptq_lattice_after_fold(tiny):
    """fold(fake_quant(params)) must equal dequant(PTQ(fold(params))) for
    every quantized conv — the lattice commutes with BN folding, so QAT
    trains against exactly the serving tier's weight error."""
    spec, params, state = tiny
    folded = fold_batch_norm(params, state)

    # serving-side: PTQ on folded kernels (activation scales irrelevant to
    # the weight lattice — give every conv a dummy positive absmax)
    taps = {(sm.name, f"layer{i}"): 1.0
            for sm in spec.sub_models
            for i, l in enumerate(sm.layers) if l.kind == "convolutional"}
    q = quantize_params(spec, folded, taps)

    # QAT-side: fake-quant the UNFOLDED masters, then fold
    folded_fq = fold_batch_norm(fake_quant_weights(spec, params), state)

    final = head_conv_taps(spec)
    checked = 0
    for sm in spec.sub_models:
        for key, entry in q[sm.name].items():
            if "kernel_q" not in entry:
                continue
            assert (sm.name, key) not in final
            dequant = np.asarray(entry["kernel_q"], np.float32) * np.asarray(entry["w_scale"])
            got = np.asarray(folded_fq[sm.name][key]["kernel"], np.float32)
            # exact in real arithmetic; in fp a value sitting on a .5
            # rounding tie can flip one lattice step when the fold factor
            # multiplies through — tolerate a vanishing fraction of
            # ≤1-step diffs, nothing more
            step = np.asarray(entry["w_scale"])[None, None, None, :]
            diff = np.abs(got - dequant)
            assert (diff <= step * 1.001).all(), f"{sm.name}/{key}: >1 lattice step"
            frac = (diff > step * 1e-3).mean()
            assert frac < 1e-4, f"{sm.name}/{key}: {frac:.2%} tie flips"
            checked += 1
    assert checked >= 5


def test_head_convs_not_fake_quanted(tiny):
    spec, params, _ = tiny
    fq = fake_quant_weights(spec, params)
    for sm_name, key in head_conv_taps(spec):
        np.testing.assert_array_equal(np.asarray(fq[sm_name][key]["kernel"]),
                                      np.asarray(params[sm_name][key]["kernel"]))


def test_ste_gradient_is_identity():
    k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 8))
    g = jax.grad(lambda w: jnp.sum(fake_quant_kernel(w) * 2.0))(k)
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(k), rtol=1e-6)


def test_qat_train_step_runs_and_learns(tiny):
    from yolov3_tpu.models.network import head_grid_sizes
    from yolov3_tpu.parallel.train_step import (init_train_state, make_adam,
                                                make_train_step)

    spec, params, state = tiny
    image_size, batch = 96, 4
    grids = head_grid_sizes(spec, image_size)
    anchors = np.abs(np.random.RandomState(0).randn(len(grids), 3, 2)) * 0.2 + 0.05
    optimizer = make_adam(1e-3)
    step = make_train_step(spec, anchors.astype(np.float32), grids, batch,
                           optimizer, qat=True)
    ts = init_train_state(params, state, optimizer)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, image_size, image_size, 3), jnp.float32)
    labels = np.zeros((batch, 4, 6), np.float32)
    labels[:, 0] = [0.3, 0.3, 0.6, 0.6, 1, 1]
    labels = jnp.asarray(labels)

    losses = []
    for _ in range(8):
        ts, metrics = step(ts, images, labels)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses))
    # masters keep learning through the lattice (overfit one fixed batch)
    assert min(losses[4:]) < losses[0]
    # masters moved off the initial values (STE passed gradients through)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ts["params"]))
    )
    assert moved


# ---------------------------------------------------------------------------
# Activation QAT (qat: 'full')
# ---------------------------------------------------------------------------


def test_fake_quant_activation_lattice():
    """Forward snaps to the per-tensor symmetric int8 lattice with the
    serving scheme: dynamic absmax/127 scale, round-half-even, clip ±127."""
    from yolov3_tpu.ops.quantize import fake_quant_activation

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4)) * 3.0
    got = np.asarray(fake_quant_activation(x))
    x32 = np.asarray(x, np.float32)
    scale = max(np.abs(x32).max(), 1e-12) / 127.0
    want = np.clip(np.round(x32 / scale), -127, 127) * scale
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    # integers on the lattice
    ints = got / scale
    np.testing.assert_allclose(ints, np.round(ints), atol=1e-4)


def test_fake_quant_activation_ste_gradient():
    from yolov3_tpu.ops.quantize import fake_quant_activation

    x = jax.random.normal(jax.random.PRNGKey(2), (4, 6))
    g = jax.grad(lambda v: jnp.sum(fake_quant_activation(v) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0 * np.ones_like(x), rtol=1e-6)


def test_activation_transform_skips_head_convs(tiny):
    from yolov3_tpu.ops.quantize import make_activation_fake_quant

    spec, _, _ = tiny
    transform = make_activation_fake_quant(spec)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 4, 4, 8), jnp.float32)
    sm_name, key = next(iter(head_conv_taps(spec)))
    assert transform(sm_name, key, x) is x  # head conv input untouched
    first = spec.sub_models[0]
    quanted = transform(first.name, "layer0", x)
    assert quanted is not x
    assert not np.array_equal(np.asarray(quanted), np.asarray(x))


def test_full_qat_forward_differs_from_weights_only(tiny):
    """qat='full' must actually perturb the training forward vs
    weights-only QAT (the activation rounding reaches the loss)."""
    from yolov3_tpu.models.network import head_grid_sizes
    from yolov3_tpu.parallel.train_step import _loss_and_metrics

    spec, params, state = tiny
    image_size, batch = 96, 2
    grids = head_grid_sizes(spec, image_size)
    anchors = jnp.asarray(
        np.abs(np.random.RandomState(0).randn(len(grids), 3, 2)) * 0.2 + 0.05,
        jnp.float32)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(batch, image_size, image_size, 3), jnp.float32)
    labels = np.zeros((batch, 4, 6), np.float32)
    labels[:, 0] = [0.3, 0.3, 0.6, 0.6, 1, 1]
    labels = jnp.asarray(labels)

    def loss(mode):
        total, _ = _loss_and_metrics(
            spec, params, state, images, labels, anchors, grids,
            batch, (), True, qat=mode)
        return float(total)

    lw, lf = loss("weights"), loss("full")
    assert np.isfinite(lw) and np.isfinite(lf)
    assert lw != lf


def test_full_qat_train_step_runs_and_learns(tiny):
    from yolov3_tpu.models.network import head_grid_sizes
    from yolov3_tpu.parallel.train_step import (init_train_state, make_adam,
                                                make_train_step)

    spec, params, state = tiny
    image_size, batch = 96, 4
    grids = head_grid_sizes(spec, image_size)
    anchors = np.abs(np.random.RandomState(0).randn(len(grids), 3, 2)) * 0.2 + 0.05
    optimizer = make_adam(1e-3)
    step = make_train_step(spec, anchors.astype(np.float32), grids, batch,
                           optimizer, qat="full")
    ts = init_train_state(params, state, optimizer)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, image_size, image_size, 3), jnp.float32)
    labels = np.zeros((batch, 4, 6), np.float32)
    labels[:, 0] = [0.3, 0.3, 0.6, 0.6, 1, 1]
    labels = jnp.asarray(labels)

    losses = []
    for _ in range(8):
        ts, metrics = step(ts, images, labels)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses))
    assert min(losses[4:]) < losses[0]


def test_qat_mode_parsing():
    """Config vocabulary: true→'weights', 'full'→'full', dict forms,
    bad strings rejected."""
    from yolov3_tpu.apps.train_app import parse_qat_mode

    assert parse_qat_mode(False) is False
    assert parse_qat_mode(None) is False
    assert parse_qat_mode(True) == "weights"
    assert parse_qat_mode("weights") == "weights"
    assert parse_qat_mode("Full") == "full"
    assert parse_qat_mode({"weights": True}) == "weights"
    assert parse_qat_mode({"weights": True, "activations": True}) == "full"
    assert parse_qat_mode({"activations": True}) == "full"
    assert parse_qat_mode({"weights": False}) is False
    # activations-only: weights explicitly off must NOT silently fake-quant
    # them (round-2 advisor finding)
    assert parse_qat_mode("activations") == "activations"
    assert parse_qat_mode({"weights": False, "activations": True}) == "activations"
    with pytest.raises(ValueError):
        parse_qat_mode("int8")

    from yolov3_tpu.apps.train_app import parse_qat_min_k2cin

    assert parse_qat_min_k2cin(True) == 0
    assert parse_qat_min_k2cin({"weights": True}) == 0
    assert parse_qat_min_k2cin({"weights": True, "min_k2cin": 2048}) == 2048


def test_activation_fake_quant_min_k2cin_matches_serving_skips(tiny):
    """With a min_k2cin threshold (serving's mixed-precision mode), the
    activation-QAT transform must pass through exactly the conv inputs the
    serving tier leaves in bf16 — shared skip set via quantized_conv_skips
    (round-2 advisor finding: the lattice must match the deployed config)."""
    from yolov3_tpu.ops.quantize import make_activation_fake_quant, quantized_conv_skips

    spec, params, state = tiny
    thresh = 9 * 128  # skips the small-contraction stem convs on tiny
    skips = quantized_conv_skips(spec, min_k2cin=thresh)
    assert skips > quantized_conv_skips(spec)  # strictly more than head taps

    transform = make_activation_fake_quant(spec, min_k2cin=thresh)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4), jnp.float32)
    for sm in spec.sub_models:
        for i, layer in enumerate(sm.layers):
            if layer.kind != "convolutional":
                continue
            key = f"layer{i}"
            y = transform(sm.name, key, x)
            if (sm.name, key) in skips:
                assert y is x  # untouched, same object
            else:
                assert not np.array_equal(np.asarray(y), np.asarray(x))

    # weight side honors the same threshold
    fq = fake_quant_weights(spec, params, min_k2cin=thresh)
    for sm in spec.sub_models:
        for key, entry in params[sm.name].items():
            if "kernel" not in entry:
                continue
            same = np.array_equal(np.asarray(fq[sm.name][key]["kernel"]),
                                  np.asarray(entry["kernel"]))
            assert same == ((sm.name, key) in skips)


def test_full_qat_then_int8_chain_serving(tiny):
    """The workflow qat='full' exists for: train a few steps on the full
    lattice, PTQ-quantize the result to the int8_chain serving tier, and
    check the quantized forward tracks the fp forward of the SAME trained
    weights (the QAT-trained network must at minimum survive its own
    serving quantization with bounded output error)."""
    from yolov3_tpu.models import apply_model, fold_batch_norm
    from yolov3_tpu.models.network import head_grid_sizes
    from yolov3_tpu.ops.quantize import calibrate_scales, quantize_params
    from yolov3_tpu.parallel.train_step import (init_train_state, make_adam,
                                                make_train_step)

    spec, params, state = tiny
    image_size, batch = 96, 2
    grids = head_grid_sizes(spec, image_size)
    anchors = np.abs(np.random.RandomState(0).randn(len(grids), 3, 2)) * 0.2 + 0.05
    step = make_train_step(spec, anchors.astype(np.float32), grids, batch,
                           make_adam(1e-3), qat="full")
    ts = init_train_state(params, state, make_adam(1e-3))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, image_size, image_size, 3), jnp.float32)
    labels = np.zeros((batch, 4, 6), np.float32)
    labels[:, 0] = [0.3, 0.3, 0.6, 0.6, 1, 1]
    labels = jnp.asarray(labels)
    for _ in range(3):
        ts, _ = step(ts, images, labels)

    folded = fold_batch_norm(ts["params"], ts["bn_state"])
    calib = [np.asarray(images)]
    in_am, out_am = calibrate_scales(spec, folded, calib)
    qparams = quantize_params(spec, folded, in_am, out_absmax=out_am)

    fp_outs, _ = apply_model(spec, folded, {}, images, train=False)
    q_outs, _ = apply_model(spec, qparams, {}, images, train=False)
    for fp, q in zip(fp_outs, q_outs):
        fp, q = np.asarray(fp, np.float32), np.asarray(q, np.float32)
        assert np.isfinite(q).all()
        # raw head logits; int8 error stays bounded relative to the
        # logit spread (loose functional gate, not a bit-exactness claim)
        span = max(fp.max() - fp.min(), 1.0)
        assert np.abs(fp - q).max() / span < 0.15
