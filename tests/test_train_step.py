import os

import jax
import numpy as np
import pytest

from yolov3_tpu.models import parse_model_config, init_model
from yolov3_tpu.models.network import head_grid_sizes
from yolov3_tpu.models.transfer import trainable_mask
from yolov3_tpu.parallel.train_step import (
    init_train_state,
    make_adam,
    make_eval_step,
    make_train_step,
)

ANCHORS = np.array(
    [[0.1, 0.1], [0.2, 0.2], [0.3, 0.3],
     [0.4, 0.4], [0.5, 0.5], [0.6, 0.6]], np.float32).reshape(2, 3, 2)


@pytest.fixture(scope="module")
def setup(repo_root):
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    return spec, params, state


def _batch(rng, b=2, size=160):
    images = rng.rand(b, size, size, 3).astype(np.float32)
    labels = np.zeros((b, 10, 6), np.float32)
    labels[:, 0] = [0.3, 0.3, 0.55, 0.55, 1, 1]
    labels[:, 1] = [0.1, 0.6, 0.25, 0.75, 1, 2]
    return images, labels


def test_loss_decreases(setup):
    spec, params, state = setup
    rng = np.random.RandomState(0)
    grid_sizes = head_grid_sizes(spec, 160)
    optimizer = make_adam(1e-3)
    step = make_train_step(spec, ANCHORS, grid_sizes, batch_size=2, optimizer=optimizer)
    ts = init_train_state(params, state, optimizer)
    images, labels = _batch(rng)
    losses = []
    for _ in range(8):
        ts, metrics = step(ts, images, labels)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0]
    assert int(ts["step"]) == 8


def test_eval_step_runs(setup):
    spec, params, state = setup
    rng = np.random.RandomState(0)
    grid_sizes = head_grid_sizes(spec, 160)
    eval_step = make_eval_step(spec, ANCHORS, grid_sizes, batch_size=2)
    images, labels = _batch(rng)
    metrics = eval_step(params, state, images, labels)
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.asarray(metrics["per_grid_per_source"]).shape == (2, 4)


def test_frozen_params_unchanged(setup):
    spec, params, state = setup
    rng = np.random.RandomState(0)
    grid_sizes = head_grid_sizes(spec, 160)
    optimizer = make_adam(1e-2)
    mask = trainable_mask(params, ["backbone"])
    step = make_train_step(spec, ANCHORS, grid_sizes, batch_size=2,
                           optimizer=optimizer, trainable_mask=mask,
                           bn_frozen=("backbone",))
    ts = init_train_state(params, state, optimizer)
    images, labels = _batch(rng)
    before = jax.tree.map(np.asarray, params["backbone"])
    before_head = np.asarray(params["head0"]["layer2"]["kernel"])
    ts, _ = step(ts, images, labels)
    after = ts["params"]["backbone"]
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(before_head, np.asarray(ts["params"]["head0"]["layer2"]["kernel"]))


def test_grad_clip_norm(setup):
    """grad_clip_norm clips the GLOBAL gradient norm before Adam: with a
    tiny clip the first step's params must move as if the gradient were
    rescaled to that norm — exactly optax's clip_by_global_norm math —
    while the unclipped step differs."""
    import jax.numpy as jnp
    import optax

    from yolov3_tpu.parallel.train_step import make_adam

    spec, params, state = setup
    rng = np.random.RandomState(1)
    grid_sizes = head_grid_sizes(spec, 160)
    images, labels = _batch(rng)

    def first_step(optimizer):
        step = make_train_step(spec, ANCHORS, grid_sizes, batch_size=2,
                               optimizer=optimizer)
        ts = init_train_state(params, state, optimizer)
        ts, _ = step(ts, images, labels)
        return ts["params"]

    clip = 1e-3  # far below the real gradient norm → always active
    p_clip = first_step(make_adam(1e-3, grad_clip_norm=clip))
    p_free = first_step(make_adam(1e-3))

    diff_clip = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), p_clip, params))
    diff_free = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), p_free, params))
    # both moved, but differently (clip engaged)
    assert max(diff_clip) > 0 and max(diff_free) > 0
    assert any(abs(a - b) > 1e-9 for a, b in zip(diff_clip, diff_free))
    # Adam's per-step move is bounded by ~lr regardless of clip; the real
    # assertion is the transform wiring: chain(clip, adam) == our optimizer
    opt_ref = optax.chain(optax.clip_by_global_norm(clip),
                          optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-7))
    opt_got = make_adam(1e-3, grad_clip_norm=clip)
    g = jax.tree.map(lambda x: jnp.ones_like(x) * 7.0, params)
    s_ref = opt_ref.init(params)
    s_got = opt_got.init(params)
    u_ref, _ = opt_ref.update(g, s_ref, params)
    u_got, _ = opt_got.update(g, s_got, params)
    for a, b in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u_got)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_epoch_learning_rate_schedule():
    from yolov3_tpu.parallel.train_step import epoch_learning_rate

    sched = {"type": "cosine", "warmup_epochs": 2, "min_lr_fraction": 0.1}
    base = 1e-3
    # warmup ramp
    assert abs(epoch_learning_rate(base, 1, 10, sched) - base / 2) < 1e-12
    assert abs(epoch_learning_rate(base, 2, 10, sched) - base) < 1e-12
    # monotone decay after warmup, floor at min_lr_fraction
    vals = [epoch_learning_rate(base, e, 10, sched) for e in range(3, 11)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert abs(vals[-1] - base * 0.1) < 1e-9
    # string shorthand
    assert epoch_learning_rate(base, 1, 4, "cosine") == base

    import pytest

    with pytest.raises(ValueError):
        epoch_learning_rate(base, 1, 4, {"type": "linear"})


def test_scheduled_adam_hyperparam_mutation(setup):
    """make_adam_scheduled: setting opt_state.hyperparams['learning_rate']
    between steps changes the update magnitude (the app's per-epoch
    schedule path), and lr=0 freezes the params exactly."""
    import jax.numpy as jnp

    from yolov3_tpu.parallel.train_step import make_adam_scheduled

    spec, params, state = setup
    rng = np.random.RandomState(0)
    images, labels = _batch(rng)
    grids = head_grid_sizes(spec, 160)
    optimizer = make_adam_scheduled(1e-3)
    step = make_train_step(spec, ANCHORS, grids, images.shape[0], optimizer)
    ts = init_train_state(params, state, optimizer)

    # freeze via hyperparams: lr = 0 → params bit-identical after a step
    hp = dict(ts["opt_state"].hyperparams)
    hp["learning_rate"] = jnp.float32(0.0)
    ts0 = {**ts, "opt_state": ts["opt_state"]._replace(hyperparams=hp)}
    ts0_after, _ = step(ts0, images, labels)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ts0_after["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restore a real lr → params move
    ts = init_train_state(params, state, optimizer)
    ts_after, _ = step(ts, images, labels)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ts_after["params"]))
    )
    assert moved


def test_sgd_optimizer_option(setup):
    """optimizer: sgd — the update equals raw optax.sgd on the same
    gradient, and a training step still reduces loss."""
    import jax.numpy as jnp
    import optax

    from yolov3_tpu.parallel.train_step import make_adam

    spec, params, state = setup
    opt_got = make_adam(1e-3, optimizer={"type": "sgd", "momentum": 0.9,
                                         "nesterov": True})
    opt_ref = optax.sgd(1e-3, momentum=0.9, nesterov=True)
    g = jax.tree.map(lambda x: jnp.ones_like(x) * 0.5, params)
    u_ref, _ = opt_ref.update(g, opt_ref.init(params), params)
    u_got, _ = opt_got.update(g, opt_got.init(params), params)
    for a, b in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u_got)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    rng = np.random.RandomState(2)
    grid_sizes = head_grid_sizes(spec, 160)
    optimizer = make_adam(1e-3, optimizer="sgd")
    step = make_train_step(spec, ANCHORS, grid_sizes, batch_size=2,
                           optimizer=optimizer)
    ts = init_train_state(params, state, optimizer)
    images, labels = _batch(rng)
    losses = []
    for _ in range(6):
        ts, metrics = step(ts, images, labels)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0]

    with pytest.raises(ValueError, match="unknown optimizer"):
        make_adam(1e-3, optimizer="adagrad")


def test_optimizer_config_strictness():
    from yolov3_tpu.parallel.train_step import make_adam

    with pytest.raises(ValueError, match="needs a 'type'"):
        make_adam(1e-3, optimizer={"momentum": 0.95})
    with pytest.raises(ValueError, match="unknown sgd optimizer keys"):
        make_adam(1e-3, optimizer={"type": "sgd", "momentun": 0.95})


@pytest.mark.parametrize("remat", [True, "conv"])
def test_remat_matches_no_remat(setup, remat):
    """Both remat modes are pure rescheduling: one train step must produce
    the same loss and parameters as remat=False (bitwise-close; XLA may
    reassociate across the checkpoint boundary). remat='conv' saves only
    the checkpoint_name-tagged conv outputs and recomputes the BN/leaky/
    pool tail; remat=True recomputes whole sub-models."""
    spec, params, state = setup
    rng = np.random.RandomState(3)
    grid_sizes = head_grid_sizes(spec, 160)
    images, labels = _batch(rng)
    optimizer = make_adam(1e-3)

    def one_step(remat_mode):
        step = make_train_step(spec, ANCHORS, grid_sizes, batch_size=2,
                               optimizer=optimizer, remat=remat_mode)
        ts = init_train_state(params, state, optimizer)
        ts, metrics = step(ts, images, labels)
        return float(metrics["total_loss"]), ts["params"]

    loss_ref, params_ref = one_step(False)
    loss_rm, params_rm = one_step(remat)
    assert loss_rm == pytest.approx(loss_ref, rel=1e-6)
    flat_ref = jax.tree.leaves(params_ref)
    flat_rm = jax.tree.leaves(params_rm)
    for a, b in zip(flat_ref, flat_rm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7)


def test_remat_invalid_value_rejected():
    from yolov3_tpu.apps.train_app import Train

    with pytest.raises(ValueError, match="remat"):
        Train()(model_config_file="x", anchors_file="x", image_size=96,
                training_mode="fit", batch_size=1, epochs=1,
                learning_rate=1e-3, classes_name_file="x",
                max_dataset_examples=None, max_bboxes=10,
                debug_mode=False, early_stop_patience=1,
                render_dataset_example=False,
                transfer_learning_config={}, dataset_config={},
                output_checkpoints_path="x", early_stopping=False,
                weights_save_peroid=1, remat="convv")
