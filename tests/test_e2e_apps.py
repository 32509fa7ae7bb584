"""End-to-end application-level tests on the toy dataset (small sizes,
CPU): train → checkpoint → inference → evaluate, and the darknet convert
path. These exercise the same code paths as the CLIs."""

import os

import numpy as np
import pytest
import yaml

from .conftest import absolutize_run_config


@pytest.fixture(scope="module")
def workdir(repo_root, tmp_path_factory, toy_dataset):
    out = tmp_path_factory.mktemp("e2e")
    cwd = os.getcwd()
    os.chdir(repo_root)
    yield str(out)
    os.chdir(cwd)


@pytest.fixture(scope="module")
def trained_checkpoint(workdir):
    from yolov3_tpu.apps.train_app import Train

    cfg = yaml.safe_load(open("config/train_config.yaml"))
    cfg["image_size"] = 96
    cfg["epochs"] = 1
    cfg["batch_size"] = 8
    cfg["training_mode"] = "fit"
    cfg["output_checkpoints_path"] = f"{workdir}/yolov3_tiny.tf"
    absolutize_run_config(cfg)  # train from a scratch cwd (see conftest)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        Train()(**cfg)
    finally:
        os.chdir(cwd)
    assert os.path.exists(f"{workdir}/yolov3_tiny.tf.npz")
    return cfg["output_checkpoints_path"]


def test_train_then_inference(workdir, trained_checkpoint):
    from yolov3_tpu.apps.inference_app import Inference

    cfg = yaml.safe_load(open("config/detect_config.yaml"))
    cfg["image_size"] = 96
    cfg["input_weights_path"] = trained_checkpoint
    cfg["output_dir"] = f"{workdir}/detect_out"
    results = Inference()(**cfg)
    detect_txt = f"{workdir}/detect_out/detect.txt"
    assert os.path.exists(detect_txt)
    lines = open(detect_txt).readlines()
    assert len(lines) == 8  # toy test split size
    assert os.path.exists(f"{workdir}/detect_out/detect_0.jpg")


def test_inference_int8_chain_app(workdir, trained_checkpoint):
    """The int8_chain serving tier through the Inference APP (config key →
    calibration collection → QAct predictor) — regression for the gate that
    only collected calibration batches for plain int8."""
    from yolov3_tpu.apps.inference_app import Inference

    cfg = yaml.safe_load(open("config/detect_config.yaml"))
    cfg["image_size"] = 96
    cfg["input_weights_path"] = trained_checkpoint
    cfg["output_dir"] = f"{workdir}/detect_out_chain"
    cfg["quantize"] = "int8_chain"
    Inference()(**cfg)
    lines = open(f"{workdir}/detect_out_chain/detect.txt").readlines()
    assert len(lines) == 8


def test_evaluate_partial_tail_batch(workdir, trained_checkpoint):
    """A tail batch shorter than batch_size: padding images must be dropped
    by COUNT — the gt histogram equals the gt count of exactly the real
    images (a padding image that draws a spurious detection must not count)."""
    from yolov3_tpu.apps.evaluate_app import evaluate
    from yolov3_tpu.data.tfrecord import parse_tfrecords

    detect_cfg = yaml.safe_load(open("config/detect_config.yaml"))
    detect_cfg["image_size"] = 96
    detect_cfg["input_weights_path"] = os.path.abspath(trained_checkpoint)
    for key in ("model_config_file", "tfrecords_dir", "classes_name_file", "anchors_file"):
        detect_cfg[key] = os.path.abspath(detect_cfg[key])

    n_real = 6  # batch_size is 8 → one padded tail batch
    expected_gts = 0
    for i, (_, lab) in enumerate(parse_tfrecords(
            detect_cfg["tfrecords_dir"], 96, detect_cfg["yolo_max_boxes"],
            detect_cfg["classes_name_file"])):
        if i >= n_real:
            break
        expected_gts += int((lab[:, 4] != 0).sum())

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        evaluate({"evaluate_nms_score_thresholds": [0.004]}, detect_cfg,
                 max_eval_images=n_real)
        got = int(np.load("gts_0.004.npy").sum())
    finally:
        os.chdir(cwd)
    assert got == expected_gts, f"gt count {got} != expected {expected_gts}"


def test_train_then_evaluate(workdir, trained_checkpoint):
    from yolov3_tpu.apps.evaluate_app import evaluate

    detect_cfg = yaml.safe_load(open("config/detect_config.yaml"))
    detect_cfg["image_size"] = 96
    detect_cfg["input_weights_path"] = os.path.abspath(trained_checkpoint)
    for key in ("model_config_file", "tfrecords_dir", "classes_name_file", "anchors_file"):
        detect_cfg[key] = os.path.abspath(detect_cfg[key])
    cwd = os.getcwd()
    os.chdir(workdir)  # .npy histograms land here
    try:
        results = evaluate(
            {"evaluate_nms_score_thresholds": [0.1],
             "results_json": f"{workdir}/eval_results.json"},
            detect_cfg, max_eval_images=8)
    finally:
        os.chdir(cwd)
    assert len(results) == 1
    r = results[0]
    assert r["recall"].shape == (3,)
    assert "map50" in r

    # machine-readable summary (results_json evaluate key, extension)
    import json

    summary = json.load(open(f"{workdir}/eval_results.json"))
    assert summary["class_names"] == ["circle", "square", "triangle"]
    (entry,) = summary["sweep"]
    assert entry["score_threshold"] == 0.1
    assert len(entry["recall"]) == 3 and len(entry["precision"]) == 3
    # each sweep entry records its wall throughput (benchmarks/README
    # promise: eval artifacts pin img/s alongside mAP)
    assert entry["wall_seconds"] > 0
    assert entry["images_per_sec"] == pytest.approx(
        8 / entry["wall_seconds"], rel=0.01)
    np.testing.assert_allclose(
        [0.0 if v is None else v for v in entry["recall"]],
        np.nan_to_num(r["recall"]), atol=1e-9)
    assert entry["counters"]["tp"] == np.asarray(
        r["counters"]["tp"]).tolist()
    # every toy image has gt boxes — the evaluator must have seen them
    assert os.path.exists(f"{workdir}/gts_0.1.npy")
    assert np.load(f"{workdir}/gts_0.1.npy").sum() > 0


def test_inference_video_mode(workdir, trained_checkpoint, toy_dataset):
    """`input_data_source: video_file` (extension — the reference has no
    video path): frames batch through the same compiled predictor, the
    annotated stream lands in detect.mp4 at the source fps/size, detect.txt
    gets one line per frame."""
    cv2 = pytest.importorskip("cv2")
    from yolov3_tpu.apps.inference_app import Inference
    from yolov3_tpu.config import dir_filelist

    files = dir_filelist(os.path.join(toy_dataset, "coco", "images"),
                         (".jpg",))[:6]
    assert len(files) == 6
    frames = [cv2.imread(f) for f in files]
    h, w = frames[0].shape[:2]
    video_in = f"{workdir}/toy_in.mp4"
    vw = cv2.VideoWriter(video_in, cv2.VideoWriter_fourcc(*"mp4v"), 5.0, (w, h))
    assert vw.isOpened()
    for fr in frames:
        vw.write(fr)
    vw.release()

    cfg = yaml.safe_load(open("config/detect_config.yaml"))
    cfg["image_size"] = 96
    cfg["input_weights_path"] = trained_checkpoint
    cfg["input_data_source"] = "video_file"
    cfg["video_file_path"] = video_in
    cfg["output_dir"] = f"{workdir}/detect_video"
    results = Inference()(**cfg)

    assert len(results) == 6  # one entry per frame, none for tail padding
    lines = open(f"{workdir}/detect_video/detect.txt").readlines()
    assert len(lines) == 6
    # the toy shapes survive mp4 compression — the model must see them
    assert any(len(names) > 0 for names, _, _ in results)

    out = cv2.VideoCapture(f"{workdir}/detect_video/detect.mp4")
    assert out.isOpened()
    n = 0
    while True:
        ok, frame = out.read()
        if not ok:
            break
        assert frame.shape == (h, w, 3)  # annotated at the SOURCE size
        n += 1
    out.release()
    assert n == 6
    # no per-frame jpgs in video mode
    assert not [f for f in os.listdir(f"{workdir}/detect_video")
                if f.startswith("detect_") and f.endswith(".jpg")]


def test_inference_letterbox_square_equals_plain(workdir, trained_checkpoint):
    """`letterbox: true` (extension): on SQUARE inputs the letterbox is the
    identity geometry, so detections must match the plain-resize default
    (classes exact, boxes/scores at float tolerance — the letterbox path
    un-maps boxes and renders on the original pixels)."""
    from yolov3_tpu.apps.inference_app import Inference

    cfg = yaml.safe_load(open("config/detect_config.yaml"))
    cfg["image_size"] = 96
    cfg["input_weights_path"] = trained_checkpoint
    cfg["input_data_source"] = "images_dir"

    cfg["output_dir"] = f"{workdir}/detect_plain"
    plain = Inference()(**cfg)
    cfg["output_dir"] = f"{workdir}/detect_letterbox"
    cfg["letterbox"] = True
    boxed = Inference()(**cfg)

    assert len(plain) == len(boxed) > 0
    assert any(len(names) for names, _, _ in plain)
    for (n_a, b_a, s_a), (n_b, b_b, s_b) in zip(plain, boxed):
        assert n_a == n_b
        np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_b), atol=1e-6)
        # letterbox mode clips un-mapped boxes to the image — clip the
        # plain boxes too (decode can emit slightly out-of-range coords)
        np.testing.assert_allclose(
            np.clip(np.asarray(b_a).reshape(-1, 4), 0.0, 1.0),
            np.asarray(b_b).reshape(-1, 4), atol=1e-5)
    # letterbox renders on the ORIGINAL pixels — annotated jpg at 256²
    from PIL import Image

    im = Image.open(f"{workdir}/detect_letterbox/detect_0.jpg")
    assert im.size == (256, 256)


def test_evaluate_coco_export(workdir, trained_checkpoint):
    """`coco_export_dir` writes the pycocotools interchange pair for the
    LOWEST sweep threshold: detections.json (results list) +
    ground_truth.json (COCO dataset dict), pixel xywh in the network-input
    frame, category ids 1-based."""
    import json

    from yolov3_tpu.apps.evaluate_app import evaluate
    from yolov3_tpu.data.tfrecord import parse_tfrecords

    detect_cfg = yaml.safe_load(open("config/detect_config.yaml"))
    detect_cfg["image_size"] = 96
    detect_cfg["input_weights_path"] = os.path.abspath(trained_checkpoint)
    for key in ("model_config_file", "tfrecords_dir", "classes_name_file", "anchors_file"):
        detect_cfg[key] = os.path.abspath(detect_cfg[key])

    n_images = 6
    expected_gts = 0
    for i, (_, lab) in enumerate(parse_tfrecords(
            detect_cfg["tfrecords_dir"], 96, detect_cfg["yolo_max_boxes"],
            detect_cfg["classes_name_file"])):
        if i >= n_images:
            break
        expected_gts += int((lab[:, 4] != 0).sum())

    export_dir = f"{workdir}/coco_export"
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        evaluate({"evaluate_nms_score_thresholds": [0.5, 0.1],
                  "coco_export_dir": export_dir},
                 detect_cfg, max_eval_images=n_images)
    finally:
        os.chdir(cwd)

    gt = json.load(open(f"{export_dir}/ground_truth.json"))
    dets = json.load(open(f"{export_dir}/detections.json"))
    assert len(gt["images"]) == n_images
    assert [c["name"] for c in gt["categories"]] == ["circle", "square", "triangle"]
    assert len(gt["annotations"]) == expected_gts
    image_ids = {im["id"] for im in gt["images"]}
    for ann in gt["annotations"]:
        assert ann["image_id"] in image_ids
        assert 1 <= ann["category_id"] <= 3
        x, y, w, h = ann["bbox"]
        assert 0 <= x <= 96 and 0 <= y <= 96 and 0 < w <= 96 and 0 < h <= 96
        assert ann["area"] == pytest.approx(w * h, abs=0.1)
        assert ann["iscrowd"] == 0
    # export is pinned to the LOWEST threshold of the sweep (max recall)
    for det in dets:
        assert det["image_id"] in image_ids
        assert 1 <= det["category_id"] <= 3
        assert det["score"] >= 0.1
        assert len(det["bbox"]) == 4
    # a trained toy model detects something at threshold 0.1
    assert len(dets) > 0

    # pycocotools cross-check when available (not in this image)
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
    except ImportError:
        return
    coco_gt = COCO(f"{export_dir}/ground_truth.json")
    coco_dt = coco_gt.loadRes(f"{export_dir}/detections.json")
    ev = COCOeval(coco_gt, coco_dt, "bbox")
    ev.evaluate(); ev.accumulate(); ev.summarize()
    assert ev.stats[1] >= 0  # AP@0.5 computed without error


def test_convert_roundtrip_app(workdir):
    import jax
    from yolov3_tpu.apps.convert_app import convert
    from yolov3_tpu.io.darknet import save_darknet_weights
    from yolov3_tpu.models import parse_model_config, init_model

    spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    params, state = init_model(jax.random.PRNGKey(3), spec)
    weights_file = f"{workdir}/synthetic.weights"
    save_darknet_weights(spec, params, state, weights_file)

    out_spec, out_params, out_state = convert({
        "num_classes": 3,
        "weights_file": weights_file,
        "output_weights_file": f"{workdir}/converted.tf",
        "model_config_file": "config/models/yolov3_tiny/model.yaml",
    })
    assert os.path.exists(f"{workdir}/converted.tf.npz")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(out_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_transfer_learning_frozen_backbone(workdir, trained_checkpoint):
    """BASELINE configs[2] shape: load a prior checkpoint's backbone, freeze
    it (weights + BN stats), train heads only — the backbone must come out
    bit-identical to the source checkpoint while head weights move.
    Reference dispatch: train.py:160-166 + core/transfer_learning.py."""
    import jax
    from yolov3_tpu.apps.train_app import Train
    from yolov3_tpu.io.resolve import load_weights
    from yolov3_tpu.models import init_model, parse_model_config

    cfg = yaml.safe_load(open("config/train_config.yaml"))
    cfg["image_size"] = 96
    cfg["epochs"] = 1
    cfg["batch_size"] = 8
    cfg["training_mode"] = "fit"
    cfg["output_checkpoints_path"] = f"{workdir}/transfer.tf"
    cfg["transfer_learning_config"] = {
        "transfer_list": ["backbone"],
        "freeze_train_list": ["backbone"],
        "batch_norm_freeze_list": ["backbone"],
        "input_weights_path": trained_checkpoint,
    }
    absolutize_run_config(cfg)  # train from a scratch cwd (see conftest)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        Train()(**cfg)
    finally:
        os.chdir(cwd)

    spec = parse_model_config(cfg["model_config_file"], nclasses=3)
    init_p, init_s = init_model(jax.random.PRNGKey(0), spec)
    src_p, src_s = load_weights(spec, init_p, init_s, trained_checkpoint)
    out_p, out_s = load_weights(spec, init_p, init_s, cfg["output_checkpoints_path"])

    # frozen backbone: params AND BN running stats bit-equal to the source
    for a, b in zip(jax.tree.leaves(src_p["backbone"]),
                    jax.tree.leaves(out_p["backbone"])):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg="backbone param moved despite freeze")
    for a, b in zip(jax.tree.leaves(src_s.get("backbone", {})),
                    jax.tree.leaves(out_s.get("backbone", {}))):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg="backbone BN state moved despite freeze")

    # heads trained: at least one head conv kernel changed vs its source value
    head_sm = [sm.name for sm in spec.sub_models if "head" in sm.name][0]
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(src_p[head_sm]), jax.tree.leaves(out_p[head_sm]))
    )
    assert moved, "head params did not change — training was a no-op"
