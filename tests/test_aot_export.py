"""AOT serving artifacts (export/aot.py + utilities/export_serving_artifact.py).

New capability — the reference's only deployment artifact is a Keras
SavedModel for the TFJS converter (reference inference.py:105-107). Here
the fused forward+decode+NMS program is serialized via jax.export with a
symbolic batch dimension; these tests pin: bit-exact roundtrip vs the live
predictor, any-batch-size execution from one artifact, manifest contents,
the producer CLI, serving straight from an artifact, and the
format-version guard."""

import io
import json
import os
import threading
import urllib.request
import zipfile

import jax
import numpy as np
import pytest
from PIL import Image

from yolov3_tpu.apps.inference_app import build_serving_predictor
from yolov3_tpu.export.aot import (
    FORMAT_VERSION,
    MANIFEST_NAME,
    export_detector,
    load_detector_artifact,
    save_detector_artifact,
)
from yolov3_tpu.io.resolve import save_weights
from yolov3_tpu.models import init_model, parse_model_config

IMAGE_SIZE = 96


@pytest.fixture(scope="module")
def tiny_setup(repo_root, toy_dataset, tmp_path_factory):
    """(predictor, config dict, artifact path) for a random-init tiny model."""
    tmp = tmp_path_factory.mktemp("aot")
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, bn_state = init_model(jax.random.PRNGKey(0), spec)
    weights = str(tmp / "aot_weights")
    save_weights(spec, params, bn_state, weights)

    cfg = {
        "model_config_file": os.path.join(
            repo_root, "config/models/yolov3_tiny/model.yaml"),
        "classes_name_file": os.path.join(toy_dataset, "class.names"),
        "anchors_file": os.path.join(toy_dataset, "anchors/anchors_tiny.txt"),
        "input_weights_path": weights,
        "image_size": IMAGE_SIZE,
        "yolo_max_boxes": 10,
        "nms_iou_threshold": 0.5,
        "nms_score_threshold": 0.05,
    }
    predictor, class_names, model_name = build_serving_predictor(**cfg)

    exported = export_detector(predictor, IMAGE_SIZE, platforms=("cpu",))
    artifact = str(tmp / "tiny.yoloexp")
    save_detector_artifact(artifact, exported, {
        "model_name": model_name,
        "image_size": IMAGE_SIZE,
        "class_names": list(class_names),
        "quantize": None,
    })
    return predictor, cfg, artifact


def test_roundtrip_bit_exact_any_batch(tiny_setup):
    """One artifact (symbolic batch) reproduces the live predictor
    bit-exactly at several batch sizes."""
    predictor, _, artifact = tiny_setup
    loaded, manifest = load_detector_artifact(artifact)
    assert manifest["image_size"] == IMAGE_SIZE
    rng = np.random.RandomState(0)
    for batch in (1, 3):
        x = rng.rand(batch, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32)
        got = [np.asarray(o) for o in loaded(x)]
        want = [np.asarray(o) for o in predictor(x)]
        assert len(got) == len(want) == 5
        for g, w in zip(got, want):
            assert g.shape == w.shape and g.dtype == w.dtype
            assert np.array_equal(g, w)


def test_manifest_contents(tiny_setup):
    _, _, artifact = tiny_setup
    with zipfile.ZipFile(artifact) as zf:
        manifest = json.loads(zf.read(MANIFEST_NAME).decode())
    assert manifest["format_version"] == FORMAT_VERSION
    assert manifest["framework"] == "yolov3_tpu"
    assert manifest["jax_version"] == jax.__version__
    assert manifest["platforms"] == ["cpu"]
    assert manifest["class_names"] == ["circle", "square", "triangle"]
    assert manifest["created_unix"] > 0


def test_future_format_version_rejected(tiny_setup, tmp_path):
    _, _, artifact = tiny_setup
    bumped = str(tmp_path / "future.yoloexp")
    with zipfile.ZipFile(artifact) as zin, zipfile.ZipFile(bumped, "w") as zout:
        for name in zin.namelist():
            data = zin.read(name)
            if name == MANIFEST_NAME:
                m = json.loads(data.decode())
                m["format_version"] = FORMAT_VERSION + 1
                data = json.dumps(m).encode()
            zout.writestr(name, data)
    with pytest.raises(ValueError, match="format_version"):
        load_detector_artifact(bumped)


def test_export_cli(tiny_setup, tmp_path):
    """The producer CLI writes a loadable artifact with the config's NMS
    metadata (multi-platform lowering by default)."""
    import sys

    import yaml

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "utilities"))
    from export_serving_artifact import main

    predictor, cfg, _ = tiny_setup
    cfg_path = str(tmp_path / "export_cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out = str(tmp_path / "cli.yoloexp")
    main(["--config", cfg_path, "--out", out, "--platforms", "cpu,tpu"])

    loaded, manifest = load_detector_artifact(out)
    assert manifest["platforms"] == ["cpu", "tpu"]
    assert manifest["nms_score_threshold"] == pytest.approx(0.05)
    assert manifest["yolo_max_boxes"] == 10
    assert manifest["source_config"] == os.path.abspath(cfg_path)
    x = np.random.RandomState(1).rand(2, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32)
    for g, w in zip(loaded(x), predictor(x)):
        assert np.array_equal(np.asarray(g), np.asarray(w))


def test_int8_tier_artifact_roundtrip(tiny_setup, toy_dataset, tmp_path):
    """The flagship serving tier (int8 PTQ + S2D stem) exports and
    reloads bit-exactly — quantized weights and calibrated scales are
    baked into the artifact."""
    _, cfg, _ = tiny_setup
    cfg = dict(cfg, quantize="int8",
               calibration_images_dir=os.path.join(toy_dataset, "coco", "images"))
    predictor, class_names, _ = build_serving_predictor(**cfg)
    exported = export_detector(predictor, IMAGE_SIZE, platforms=("cpu",))
    artifact = str(tmp_path / "int8.yoloexp")
    save_detector_artifact(artifact, exported, {
        "image_size": IMAGE_SIZE, "class_names": list(class_names),
        "quantize": "int8"})
    loaded, manifest = load_detector_artifact(artifact)
    assert manifest["quantize"] == "int8"
    x = np.random.RandomState(3).rand(2, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32)
    for g, w in zip(loaded(x), predictor(x)):
        assert np.array_equal(np.asarray(g), np.asarray(w))


def test_serve_from_artifact(tiny_setup):
    """serve.py's `artifact:` key — the server runs the deserialized
    program and returns the same detections as the live predictor."""
    from yolov3_tpu.apps.inference_app import gather_valid_detections
    from yolov3_tpu.apps.serve_app import Serve
    from yolov3_tpu.data.image import decode_image, resize_bilinear

    predictor, _, artifact = tiny_setup
    httpd, app = Serve()(
        artifact=artifact,
        host="127.0.0.1",
        port=0,
        batch_buckets=[1, 2],
        batch_timeout_ms=1,
        warmup=False,  # roundtrip test already compiled these shapes
        serve_forever=False,
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{httpd.server_address[1]}/healthz",
            timeout=30).read())
        assert health["image_size"] == IMAGE_SIZE
        assert health["classes"] == 3

        arr = (np.random.RandomState(2).rand(60, 80, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}/detect",
            data=buf.getvalue(), method="POST")
        body = json.loads(urllib.request.urlopen(req, timeout=120).read())

        image = resize_bilinear(
            decode_image(buf.getvalue()).astype(np.float32) / 255.0,
            IMAGE_SIZE, IMAGE_SIZE)
        out = predictor(image[None])
        bb, cc, ss = gather_valid_detections(*[np.asarray(o)[0] for o in out])
        assert len(body["detections"]) == len(bb)
        for det, box, cls, score in zip(body["detections"], bb, cc, ss):
            assert det["class_id"] == int(cls)
            assert det["score"] == pytest.approx(float(score), abs=1e-6)
            assert np.allclose(det["box_normalized"], box, atol=1e-6)
    finally:
        httpd.shutdown()
        app.shutdown()
        thread.join(timeout=5)
