"""Interop: unmodified reference run/model configs work with this framework."""

import inspect
import os

import pytest
import yaml

from .conftest import REFERENCE, has_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference mount unavailable")


def test_reference_model_configs_parse():
    import jax
    from yolov3_tpu.models import parse_model_config, init_model
    from yolov3_tpu.models.network import head_grid_sizes

    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        for arch, nc in (("yolov3", 80), ("yolov3_tiny", 7)):
            spec = parse_model_config(f"config/models/{arch}/model.yaml", nc)
            assert head_grid_sizes(spec, 416)[0] == 13
    finally:
        os.chdir(cwd)


def test_reference_train_config_binds_to_train_app():
    """The reference train_config.yaml **splats cleanly into our Train app."""
    from yolov3_tpu.apps.train_app import Train

    with open(os.path.join(REFERENCE, "config/train_config.yaml")) as f:
        cfg = yaml.safe_load(f)
    sig = inspect.signature(Train.__call__)
    # must bind without error (kwargs catch-all covers extras)
    sig.bind(None, **cfg)


def test_reference_detect_config_binds_to_inference_app():
    from yolov3_tpu.apps.inference_app import Inference

    with open(os.path.join(REFERENCE, "config/detect_config.yaml")) as f:
        cfg = yaml.safe_load(f)
    sig = inspect.signature(Inference.__call__)
    sig.bind(None, **cfg)


def test_reference_evaluate_config_schema():
    with open(os.path.join(REFERENCE, "config/evaluate_config.yaml")) as f:
        cfg = yaml.safe_load(f)
    assert "evaluate_nms_score_thresholds" in cfg


def test_reference_train_config_e2e():
    """A reference user switches over: the reference's own
    config/train_config.yaml runs our train app END-TO-END on the
    reference's own bundled dataset (data_files mode,
    datasets/shapes/large_circle), with only run-length/output-path
    overrides (epochs, checkpoint path). One eager_tf epoch at the
    config's native 416² on yolov3-tiny, then the checkpoint must exist
    and the logged loss be finite."""
    import tempfile

    import numpy as np

    import jax

    from yolov3_tpu.apps.train_app import Train
    from yolov3_tpu.io.checkpoint import load_checkpoint
    from yolov3_tpu.io.resolve import native_path

    with open(os.path.join(REFERENCE, "config/train_config.yaml")) as f:
        cfg = yaml.safe_load(f)
    assert cfg["dataset_config"]["input_data_source"] == "data_files"
    assert cfg["image_size"] == 416 and cfg["training_mode"] == "eager_tf"

    # absolutize the mount-relative data/model paths so the run can happen
    # from a scratch cwd — the reference mount stays untouched (the train
    # app writes model_summary.txt and checkpoints relative to cwd)
    def _abs(p):
        return p if os.path.isabs(p) else os.path.join(REFERENCE, p)

    for split in ("train", "valid"):
        entry = cfg["dataset_config"]["data_files"][split]
        entry["images_dir"] = _abs(entry["images_dir"])
        entry["annotations"] = _abs(entry["annotations"])
    cfg["classes_name_file"] = _abs(cfg["classes_name_file"])
    cfg["anchors_file"] = _abs(cfg["anchors_file"])
    cfg["model_config_file"] = _abs(cfg["model_config_file"])

    with tempfile.TemporaryDirectory() as tmp:
        cfg["epochs"] = 1
        cfg["output_checkpoints_path"] = os.path.join(tmp, "ref_cfg_train.tf")
        cwd = os.getcwd()
        os.chdir(tmp)  # scratch cwd for cwd-relative artifacts (model_summary.txt)
        try:
            Train()(**cfg)
        finally:
            os.chdir(cwd)
        ckpt = native_path(cfg["output_checkpoints_path"])
        assert os.path.exists(ckpt)
        tree, _ = load_checkpoint(ckpt)
        assert all(np.isfinite(leaf).all() for leaf in jax.tree.leaves(tree))


def test_pets_transfer_learning_smoke():
    """BASELINE configs[2] on the REAL Oxford Pets by-breed COCO export
    (reference mount): bundled config/train_config_pets.yaml drives a
    frozen-backbone transfer run end-to-end — backbone transferred from a
    (synthetic) COCO-80 checkpoint and bit-frozen, necks/heads train on
    real pet images. Overrides are run-length only (examples/epochs/batch/
    image_size/output path)."""
    import tempfile

    import jax
    import numpy as np

    from yolov3_tpu.apps.train_app import Train
    from yolov3_tpu.io.resolve import load_weights, save_weights
    from yolov3_tpu.models import init_model, parse_model_config

    from yolov3_tpu.config import load_yaml  # ${VAR:-default} substitution

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cwd = os.getcwd()
    os.chdir(repo)
    try:
        cfg = load_yaml("config/train_config_pets.yaml")
        from .conftest import absolutize_run_config

        absolutize_run_config(cfg, repo)  # Train runs from a scratch cwd

        with tempfile.TemporaryDirectory() as tmp:
            os.chdir(tmp)
            # synthetic stand-in for the converted COCO checkpoint (no real
            # yolov3.weights exists in this zero-egress env — BASELINE.md)
            spec80 = parse_model_config(cfg["model_config_file"], nclasses=80)
            p80, s80 = init_model(jax.random.PRNGKey(7), spec80)
            src_ckpt = os.path.join(tmp, "coco80.tf")
            save_weights(spec80, p80, s80, src_ckpt)
            cfg["transfer_learning_config"]["input_weights_path"] = src_ckpt

            cfg["image_size"] = 224
            cfg["batch_size"] = 4
            cfg["epochs"] = 1
            cfg["max_dataset_examples"] = 8
            cfg["early_stopping"] = False
            cfg["output_checkpoints_path"] = os.path.join(tmp, "pets.tf")
            Train()(**cfg)

            nclasses = sum(1 for _ in open(cfg["classes_name_file"]))
            spec = parse_model_config(cfg["model_config_file"], nclasses)
            init_p, init_s = init_model(jax.random.PRNGKey(0), spec)
            out_p, _ = load_weights(spec, init_p, init_s, cfg["output_checkpoints_path"])

            # backbone: transferred from the COCO checkpoint AND frozen —
            # must be bit-equal to the source (classes don't touch it)
            for a, b in zip(jax.tree.leaves(p80["backbone"]),
                            jax.tree.leaves(out_p["backbone"])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

            # heads (fresh init for 37 classes) must have trained
            head_sm = [sm.name for sm in spec.sub_models if "head" in sm.name][0]
            moved = any(
                not np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(init_p[head_sm]),
                                jax.tree.leaves(out_p[head_sm]))
            )
            assert moved, "head params did not change"
    finally:
        os.chdir(cwd)


def test_reference_compact_config_parses():
    from yolov3_tpu.models.compact_spec import parse_compact_model_config

    spec = parse_compact_model_config(
        os.path.join(REFERENCE, "config/models/yolov3_tiny/yolov3_tiny.yaml"), nclasses=7
    )
    nconvs = sum(1 for l in spec.sub_models[0].layers if l.kind == "convolutional")
    assert nconvs == 13
    assert len(spec.output_sub_models) == 1
