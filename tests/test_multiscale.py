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


def test_multi_scale_random_mode_deterministic(workdir, caplog):
    """mode: random picks sizes keyed by (seed, epoch) — rerunning yields
    the identical size sequence (resume determinism)."""
    from yolov3_tpu.apps.train_app import Train

    def run(name):
        cfg = _train_cfg(workdir, name, epochs=3,
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

    assert run("ms_rand_a") == run("ms_rand_b")


def test_multi_scale_rejects_bad_size(workdir):
    """Sizes must be divisible by the model's max stride (static grids)."""
    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ms_bad", multi_scale=[70])
    with pytest.raises(ValueError, match="max stride"):
        Train()(**cfg)


def test_multi_scale_rejects_bad_mode(workdir):
    from yolov3_tpu.apps.train_app import Train

    cfg = _train_cfg(workdir, "ms_badmode",
                     multi_scale={"sizes": [64], "mode": "sometimes"})
    with pytest.raises(ValueError, match="cycle|random"):
        Train()(**cfg)
