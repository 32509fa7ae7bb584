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
