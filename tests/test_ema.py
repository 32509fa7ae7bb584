"""EMA shadow weights (`ema:` train-config extension).

The reference has no weight-averaging capability (SURVEY §5 checkpoint —
Keras save_weights only); this is a framework extension: an exponential
moving average of params + BN statistics maintained inside the jitted
train step and saved as a `<ckpt>.ema.npz` sibling checkpoint.
"""

import os

import jax
import numpy as np
import pytest
import yaml

from yolov3_tpu.models import parse_model_config, init_model
from yolov3_tpu.models.network import head_grid_sizes
from yolov3_tpu.parallel.train_step import (
    init_train_state,
    make_adam,
    make_train_step,
)

from .conftest import absolutize_run_config

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


def _batch(rng, b=2, size=96):
    images = rng.rand(b, size, size, 3).astype(np.float32)
    labels = np.zeros((b, 10, 6), np.float32)
    labels[:, 0] = [0.3, 0.3, 0.55, 0.55, 1, 1]
    return images, labels


def _leaf(tree):
    # tiny backbone layer0 is a route; layer1 is the first conv
    return np.asarray(tree["backbone"]["layer1"]["kernel"])


def test_ema_math_exact(setup):
    """EMA leaves equal the hand-computed average of the observed params
    trajectory under the warmup schedule min(decay, (1+t)/(10+t))."""
    spec, params, state = setup
    grid_sizes = head_grid_sizes(spec, 96)
    optimizer = make_adam(1e-2)
    decay = 0.7
    step = make_train_step(spec, ANCHORS, grid_sizes, batch_size=2,
                           optimizer=optimizer, ema_decay=decay)
    ts = init_train_state(params, state, optimizer, ema=True)
    rng = np.random.RandomState(0)
    images, labels = _batch(rng)

    expected = _leaf(params).copy()
    for t in range(3):
        ts, _ = step(ts, images, labels)
        d = min(decay, (1.0 + t) / (10.0 + t))
        expected = expected + (1.0 - d) * (_leaf(ts["params"]) - expected)
        np.testing.assert_allclose(_leaf(ts["ema"]["params"]), expected,
                                   rtol=0, atol=1e-6)
    # BN statistics are averaged too
    assert "bn_state" in ts["ema"]
    # ... and the shadow lags the raw weights (decay < 1)
    assert not np.allclose(_leaf(ts["ema"]["params"]), _leaf(ts["params"]))


def test_ema_warmup_off(setup):
    """warmup=False applies the configured decay from step 0."""
    spec, params, state = setup
    grid_sizes = head_grid_sizes(spec, 96)
    optimizer = make_adam(1e-2)
    step = make_train_step(spec, ANCHORS, grid_sizes, batch_size=2,
                           optimizer=optimizer, ema_decay=0.5, ema_warmup=False)
    ts = init_train_state(params, state, optimizer, ema=True)
    images, labels = _batch(np.random.RandomState(0))
    init_leaf = _leaf(params).copy()
    ts, _ = step(ts, images, labels)
    np.testing.assert_allclose(
        _leaf(ts["ema"]["params"]),
        0.5 * init_leaf + 0.5 * _leaf(ts["params"]),
        rtol=0, atol=1e-6)


@pytest.fixture(scope="module")
def workdir(repo_root, tmp_path_factory, toy_dataset):
    out = tmp_path_factory.mktemp("ema_e2e")
    cwd = os.getcwd()
    os.chdir(repo_root)
    yield str(out)
    os.chdir(cwd)


def _train_cfg(workdir, name, **over):
    cfg = yaml.safe_load(open("config/train_config.yaml"))
    cfg.update(image_size=96, epochs=1, batch_size=8, training_mode="fit",
               output_checkpoints_path=f"{workdir}/{name}.tf")
    cfg.update(over)
    absolutize_run_config(cfg)
    return cfg


def test_train_app_ema_sibling_checkpoint(workdir):
    """`ema: true` writes a loadable .ema.npz sibling that differs from the
    raw checkpoint and serves through the inference app."""
    from yolov3_tpu.apps.train_app import Train
    from yolov3_tpu.io.checkpoint import load_checkpoint

    cfg = _train_cfg(workdir, "ema_run", epochs=2,
                     ema={"decay": 0.9, "warmup": True})
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        Train()(**cfg)
    finally:
        os.chdir(cwd)
    raw = f"{workdir}/ema_run.tf.npz"
    ema = f"{workdir}/ema_run.tf.ema.npz"
    assert os.path.exists(raw) and os.path.exists(ema)
    raw_tree, _ = load_checkpoint(raw)
    ema_tree, step = load_checkpoint(ema)
    assert step == 2
    k = "backbone/layer1/kernel"
    raw_leaf = raw_tree["params"]["backbone"]["layer1"]["kernel"]
    ema_leaf = ema_tree["params"]["backbone"]["layer1"]["kernel"]
    assert raw_leaf.shape == ema_leaf.shape
    assert not np.allclose(raw_leaf, ema_leaf), k

    # the EMA sibling is a normal weights checkpoint: inference loads it
    from yolov3_tpu.apps.inference_app import Inference

    det = yaml.safe_load(open("config/detect_config.yaml"))
    det["image_size"] = 96
    det["input_weights_path"] = f"{workdir}/ema_run.tf.ema"
    det["output_dir"] = f"{workdir}/detect_ema"
    absolutize_run_config(det)
    Inference()(**det)
    assert os.path.exists(f"{workdir}/detect_ema/detect.txt")


def test_resume_seeds_ema_from_pre_ema_checkpoint(workdir):
    """Enabling `ema:` when resuming a run that didn't have it seeds the
    shadow from the restored weights instead of failing the strict load."""
    from yolov3_tpu.apps.train_app import Train
    from yolov3_tpu.io.checkpoint import load_checkpoint

    cfg = _train_cfg(workdir, "ema_resume")
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        Train()(**cfg)  # epoch 1, no EMA
        cfg2 = dict(cfg, epochs=2, resume=True, ema=True)
        Train()(**cfg2)  # resumes at epoch 2 with EMA newly on
    finally:
        os.chdir(cwd)
    ema_tree, step = load_checkpoint(f"{workdir}/ema_resume.tf.ema.npz")
    assert step == 2
    state_tree, _ = load_checkpoint(f"{workdir}/ema_resume.tf.train_state.npz")
    assert "ema" in state_tree  # resumable EMA state is in the train state


def test_ema_validation_monitoring(workdir):
    """use_for_validation: the val pass and early stopping run on the EMA
    shadow (smoke: completes, writes both checkpoints)."""
    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ema_val", epochs=2, early_stopping=True,
                     early_stop_patience=1,
                     ema={"decay": 0.5, "use_for_validation": True})
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        Train()(**cfg)
    finally:
        os.chdir(cwd)
    assert os.path.exists(f"{workdir}/ema_val.tf.npz")
    assert os.path.exists(f"{workdir}/ema_val.tf.ema.npz")


def test_ema_scalar_shorthand_and_validation(workdir, caplog):
    """`ema: 0.97` is honored as the decay; out-of-range / non-numeric
    values raise instead of silently training with the default."""
    import logging

    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ema_scalar", ema=0.97)
    bad_cfgs = [_train_cfg(workdir, "ema_bad", ema=bad)
                for bad in ({"decay": 1.5}, {"decay": -0.1}, "0.9")]
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        with caplog.at_level(logging.INFO):
            Train()(**cfg)
        assert any("ema: decay 0.97" in r.getMessage() for r in caplog.records)

        for bad_cfg in bad_cfgs:
            with pytest.raises(ValueError, match="ema"):
                Train()(**bad_cfg)
    finally:
        os.chdir(cwd)


def test_early_stop_restores_best_into_ema_shadow(workdir, monkeypatch):
    """With use_for_validation, early stopping restores the best snapshot
    into the EMA shadow: the final .ema.npz equals the best-epoch EMA
    (bit-identical to a run stopped at that epoch), while the RAW params
    stay the last-epoch weights, coherent with the saved optimizer moments
    (a later resume must not continue from averaged weights)."""
    import yolov3_tpu.apps.train_app as train_app_mod
    from yolov3_tpu.apps.train_app import Train
    from yolov3_tpu.io.checkpoint import load_checkpoint

    # scripted validation: every call reports a strictly WORSE loss, so
    # epoch 1 is the best epoch and patience=1 stops the run at epoch 2 —
    # deterministic, no lr tuning (eval has no effect on the weights)
    calls = {"n": 0}

    def fake_make_eval_step(*a, **k):
        def eval_step(params, bn_state, images, labels):
            calls["n"] += 1
            return {"total_loss": float(calls["n"])}
        return eval_step

    monkeypatch.setattr(train_app_mod, "make_eval_step", fake_make_eval_step)

    ema = {"decay": 0.5, "use_for_validation": True, "warmup": False}
    cfg_ref = _train_cfg(workdir, "ema_best_ref", epochs=1, ema=ema)
    cfg_es = _train_cfg(workdir, "ema_best", epochs=4, early_stopping=True,
                        early_stop_patience=1, ema=ema)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        Train()(**cfg_ref)
        state = Train()(**cfg_es)
    finally:
        os.chdir(cwd)
    stopped_epoch = int(np.asarray(state["step"])) // 4  # 4 steps/epoch
    assert stopped_epoch == 2, "early stopping should trigger at epoch 2"

    ref_ema, _ = load_checkpoint(f"{workdir}/ema_best_ref.tf.ema.npz")
    got_ema, _ = load_checkpoint(f"{workdir}/ema_best.tf.ema.npz")
    got_raw, _ = load_checkpoint(f"{workdir}/ema_best.tf.npz")
    k = lambda t: t["params"]["backbone"]["layer1"]["kernel"]
    # best epoch was 1 → the shadow was restored to the epoch-1 EMA, which
    # is bit-identical to the 1-epoch run's final EMA (same seed/data/jit)
    np.testing.assert_array_equal(k(got_ema), k(ref_ema))
    # raw weights are NOT the averaged ones (resume coherence)
    assert not np.allclose(k(got_raw), k(got_ema))

    # the train state resumes strictly (structure intact after the restore)
    st, _ = load_checkpoint(
        f"{workdir}/ema_best.tf.train_state.npz",
        like={k_: v for k_, v in state.items()})
    assert "ema" in st
