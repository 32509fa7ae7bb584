"""Multi-scale training (`multi_scale:` train-config extension).

Darknet trains YOLOv3 over random input resolutions; the TF reference
dropped that capability. Here each size is its own statically-shaped
compiled step (lazy, cached) — the TPU-native formulation — and the
validation pass stays at the base image_size.
"""

import logging
import os

import numpy as np
import pytest
import yaml

from .conftest import absolutize_run_config


@pytest.fixture(scope="module")
def workdir(repo_root, tmp_path_factory, toy_dataset):
    out = tmp_path_factory.mktemp("ms_e2e")
    cwd = os.getcwd()
    os.chdir(repo_root)
    yield str(out)
    os.chdir(cwd)


def _train_cfg(workdir, name, **over):
    cfg = yaml.safe_load(open("config/train_config.yaml"))
    cfg.update(image_size=96, epochs=2, batch_size=8, training_mode="fit",
               output_checkpoints_path=f"{workdir}/{name}.tf")
    cfg.update(over)
    absolutize_run_config(cfg)
    return cfg


def test_multi_scale_cycle_e2e(workdir, caplog):
    """Two epochs cycling [64, 96]: both sizes actually train (the per-size
    steps run on differently-shaped batches) and the checkpoint saves."""
    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ms_run", multi_scale=[64, 96])
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        with caplog.at_level(logging.INFO):
            Train()(**cfg)
    finally:
        os.chdir(cwd)
    msgs = [r.getMessage() for r in caplog.records]
    assert any("multi_scale image_size 64" in m for m in msgs)
    assert any("multi_scale image_size 96" in m for m in msgs)
    assert os.path.exists(f"{workdir}/ms_run.tf.npz")


def test_multi_scale_random_mode_resume_deterministic(workdir, caplog):
    """mode: random picks sizes keyed by (seed, epoch): a run interrupted
    after epoch 2 and resumed to epoch 3 sees the SAME size sequence a
    straight-through 3-epoch run sees. (A stateful per-epoch RNG would pass
    a rerun-equality check but diverge on resume — this is the actual
    guarantee.)"""
    from yolov3_tpu.apps.train_app import Train

    def run(name, epochs, resume=False):
        cfg = _train_cfg(workdir, name, epochs=epochs, resume=resume,
                         multi_scale={"sizes": [64, 96], "mode": "random"})
        cwd = os.getcwd()
        os.chdir(workdir)
        try:
            with caplog.at_level(logging.INFO):
                Train()(**cfg)
        finally:
            os.chdir(cwd)
        seq = [m.split()[-1] for m in (r.getMessage() for r in caplog.records)
               if "multi_scale image_size" in m]
        caplog.clear()
        return seq

    full = run("ms_rand_full", epochs=3)
    part = run("ms_rand_part", epochs=2)
    cont = run("ms_rand_part", epochs=3, resume=True)  # trains epoch 3 only
    assert len(full) == 3 and len(part) == 2 and len(cont) == 1
    assert part + cont == full


def test_multi_scale_stride_probe_base_independent(workdir):
    """The stride check derives the model's true max stride (32) from a
    power-of-two probe, independent of the base image_size (64 here: the
    naive image_size // min(grid) would also give 32, but an unaligned
    base can't reach this code — it fails model build first — so the
    probe is the only base-independent derivation)."""
    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ms_probe", image_size=64, multi_scale=[80])
    cwd = os.getcwd()
    os.chdir(workdir)  # Train dumps model_summary.txt to cwd before raising
    try:
        with pytest.raises(ValueError, match="max stride 32"):
            Train()(**cfg)
    finally:
        os.chdir(cwd)


def test_multi_scale_rejects_bad_size(workdir):
    """Sizes must be divisible by the model's max stride (static grids)."""
    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ms_bad", multi_scale=[70])
    cwd = os.getcwd()
    os.chdir(workdir)  # Train dumps model_summary.txt to cwd before raising
    try:
        with pytest.raises(ValueError, match="max stride"):
            Train()(**cfg)
    finally:
        os.chdir(cwd)


def test_multi_scale_rejects_bad_mode(workdir):
    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ms_badmode",
                     multi_scale={"sizes": [64], "mode": "sometimes"})
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        with pytest.raises(ValueError, match="cycle|random"):
            Train()(**cfg)
    finally:
        os.chdir(cwd)


def test_shuffle_with_multiscale_e2e(workdir, caplog):
    """`shuffle: true` composes with multi-scale (the per-epoch shuffled
    view wraps the per-size dataset) and trains end-to-end."""
    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ms_shuffle", multi_scale=[64, 96],
                     shuffle=True)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        with caplog.at_level(logging.INFO):
            Train()(**cfg)
    finally:
        os.chdir(cwd)
    msgs = [r.getMessage() for r in caplog.records]
    assert any("shuffle: buffer 1024" in m for m in msgs)
    assert os.path.exists(f"{workdir}/ms_shuffle.tf.npz")


def test_multi_scale_device_dataset_e2e(workdir, caplog):
    """device_dataset + multi_scale: the split stages once at image_size
    and the 64-scale epoch runs as a device-side bilinear downscale of
    each gathered batch (stream feeds are tunnel-bound on remote chips,
    so this is the path that makes multi-scale usable with HBM staging)."""
    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ms_dd_run", multi_scale=[64, 96],
                     device_dataset={"dtype": "uint8"}, shuffle=True)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        with caplog.at_level(logging.INFO):
            Train()(**cfg)
    finally:
        os.chdir(cwd)
    msgs = [r.getMessage() for r in caplog.records]
    assert any("device_dataset: staged" in m for m in msgs)
    assert any("multi_scale image_size 64" in m for m in msgs)
    assert os.path.exists(f"{workdir}/ms_dd_run.tf.npz")


def test_multi_scale_step_interval_e2e(workdir, caplog):
    """`interval: N` (steps) — Darknet's actual regime (resize every 10
    batches, darknet detector.c). Sub-epoch cycling is what keeps the BN
    running statistics blended across scales: per-EPOCH cycling lets them
    chase the last-trained scale (measured 0.22 vs 0.87 mAP@0.5 at the
    non-final scale on the 608-staged flagship). Here: 2 epochs, 4
    batches each (32 toy images / B=8), interval 2 over [64, 96] — both
    sizes train within ONE epoch and the per-size batch counts are
    logged and balanced."""
    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ms_int_run",
                     multi_scale={"sizes": [64, 96], "interval": 2},
                     device_dataset={"dtype": "uint8"})
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        with caplog.at_level(logging.INFO):
            Train()(**cfg)
    finally:
        os.chdir(cwd)
    msgs = [r.getMessage() for r in caplog.records]
    assert any("interval 2" in m for m in msgs)
    used = [m for m in msgs if "multi_scale batches per size" in m]
    assert len(used) == 2  # one histogram per epoch
    # 4 batches / interval 2 / 2 sizes -> 2 batches at each size per epoch
    assert "{64: 2, 96: 2}" in used[0]
    assert os.path.exists(f"{workdir}/ms_int_run.tf.npz")


def test_multi_scale_step_interval_requires_device_dataset(workdir):
    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ms_int_bad",
                     multi_scale={"sizes": [64, 96], "interval": 2})
    with pytest.raises(ValueError, match="requires\\s+device_dataset"):
        Train()(**cfg)


def test_multi_scale_device_dataset_rejects_upscale(workdir):
    """Sizes above image_size can't come from a fixed staged corpus."""
    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ms_dd_bad", multi_scale=[96, 128],
                     device_dataset=True)
    with pytest.raises(ValueError, match="size <= image_size"):
        Train()(**cfg)
