"""AOT artifact export application.

Drives ``yolov3_tpu.export.aot`` from the detect/serve config schema —
shared by ``utilities/export_serving_artifact.py`` (repo surface) and the
``yolov3-tpu-export`` console command. See ``export/aot.py`` for the
artifact format.
"""

from __future__ import annotations

import os


def export_artifact(config: dict, out: str, platforms=("cpu", "tpu")) -> dict:
    """Build the configured serving predictor, export it over a symbolic
    batch, and write the artifact zip to ``out``. Returns the manifest."""
    from ..export.aot import export_detector, save_detector_artifact
    from ..utils.compile_cache import enable_from_env_or_config
    from .inference_app import build_serving_predictor

    enable_from_env_or_config(config.get("compilation_cache"))

    image_size = int(config["image_size"])
    quantize = config.get("quantize")
    predictor, class_names, model_name = build_serving_predictor(
        config["model_config_file"], config["classes_name_file"],
        config["anchors_file"], config["input_weights_path"], image_size,
        config.get("yolo_max_boxes", 100),
        config.get("nms_iou_threshold", 0.5),
        config.get("nms_score_threshold", 0.3),
        quantize, config.get("compute_precision"),
        config.get("calibration_images_dir"),
        letterbox=bool(config.get("letterbox")),
        nms_per_class=bool(config.get("nms_per_class")))

    platforms = tuple(platforms)
    exported = export_detector(predictor, image_size, platforms=platforms)
    manifest = save_detector_artifact(out, exported, {
        "model_name": model_name,
        "image_size": image_size,
        "class_names": list(class_names),
        "yolo_max_boxes": int(config.get("yolo_max_boxes", 100)),
        "nms_iou_threshold": float(config.get("nms_iou_threshold", 0.5)),
        "nms_score_threshold": float(config.get("nms_score_threshold", 0.3)),
        "quantize": quantize,
        "compute_precision": config.get("compute_precision"),
        "nms_per_class": bool(config.get("nms_per_class")),
        "letterbox": bool(config.get("letterbox")),  # preprocessing hint
        "source_config": config.get("source_config"),
    })
    size_mb = os.path.getsize(out) / 1e6
    print(f"wrote {out} ({size_mb:.1f} MB, platforms {list(platforms)}, "
          f"model {manifest['model_name']}, image_size {image_size}, "
          f"quantize {quantize})")
    return manifest
