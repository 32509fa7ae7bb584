#!/usr/bin/env python
"""Export an AOT serving artifact — compile-once/deploy-anywhere detection.

TPU-native counterpart of the reference's SavedModel export (reference
inference.py:105-107): the fused forward+decode+NMS program configured by a
detect/serve config (any tier — bf16, int8 PTQ + S2D) is lowered via
``jax.export`` to versioned StableHLO with the BN-folded weights baked in,
over a SYMBOLIC batch dimension (one artifact, every batch size), for both
``cpu`` and ``tpu`` by default. The artifact zip is self-contained:
``serve.py`` (``artifact:`` config key) or
``yolov3_tpu.export.aot.load_detector_artifact`` run it without model
configs or a weights pipeline.

    python utilities/export_serving_artifact.py \
        --config config/detect_config.yaml --out yolov3.yoloexp

The config is the detect/serve schema (model_config_file,
classes_name_file, anchors_file, input_weights_path, image_size, NMS keys,
optional quantize + calibration_images_dir). NMS thresholds are baked into
the exported program.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True,
                        help="detect/serve config yaml (model + NMS keys)")
    parser.add_argument("--out", required=True,
                        help="output artifact path (e.g. yolov3.yoloexp)")
    parser.add_argument("--platforms", default="cpu,tpu",
                        help="comma-separated lowering platforms")
    args = parser.parse_args(argv)

    import yaml

    with open(args.config) as f:
        cfg = yaml.safe_load(f)

    from yolov3_tpu.apps.inference_app import build_serving_predictor
    from yolov3_tpu.export.aot import export_detector, save_detector_artifact
    from yolov3_tpu.utils.compile_cache import enable_from_env_or_config

    enable_from_env_or_config(cfg.get("compilation_cache"))

    image_size = int(cfg["image_size"])
    quantize = cfg.get("quantize")
    predictor, class_names, model_name = build_serving_predictor(
        cfg["model_config_file"], cfg["classes_name_file"], cfg["anchors_file"],
        cfg["input_weights_path"], image_size,
        cfg.get("yolo_max_boxes", 100),
        cfg.get("nms_iou_threshold", 0.5), cfg.get("nms_score_threshold", 0.3),
        quantize, cfg.get("compute_precision"),
        cfg.get("calibration_images_dir"))

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    exported = export_detector(predictor, image_size, platforms=platforms)
    manifest = save_detector_artifact(args.out, exported, {
        "model_name": model_name,
        "image_size": image_size,
        "class_names": list(class_names),
        "yolo_max_boxes": int(cfg.get("yolo_max_boxes", 100)),
        "nms_iou_threshold": float(cfg.get("nms_iou_threshold", 0.5)),
        "nms_score_threshold": float(cfg.get("nms_score_threshold", 0.3)),
        "quantize": quantize,
        "compute_precision": cfg.get("compute_precision"),
        "source_config": os.path.abspath(args.config),
    })
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size_mb:.1f} MB, platforms {list(platforms)}, "
          f"model {manifest['model_name']}, image_size {image_size}, "
          f"quantize {quantize})")


if __name__ == "__main__":
    main()
