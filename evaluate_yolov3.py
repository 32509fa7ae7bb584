#!/usr/bin/env python
"""Evaluation CLI — the working replacement for reference
evaluate_yolov3.py (which cannot run as-is: broken import at its :24).
Reads the same two configs; optional flags extend the hardcoded
``take(20)`` of the reference."""

import argparse

from yolov3_tpu.config import load_yaml
from yolov3_tpu.apps.evaluate_app import evaluate

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--evaluate_config", type=str, default="config/evaluate_config.yaml")
    parser.add_argument("--detect_config", type=str, default="config/detect_config.yaml")
    parser.add_argument("--max_eval_images", type=int, default=None,
                        help="limit evaluated images (reference hardcodes 20)")
    parser.add_argument("--no_map", action="store_true", help="skip mAP@0.5 computation")
    parser.add_argument("--coco_map", action="store_true",
                        help="report COCO-style mAP@[.5:.95] (10 IoU thresholds)")
    args = parser.parse_args()
    # load_yaml = safe_load + ${VAR:-default} expansion (config.py)
    evaluate_config = load_yaml(args.evaluate_config)
    detect_config = load_yaml(args.detect_config)
    evaluate(evaluate_config, detect_config, max_eval_images=args.max_eval_images,
             compute_map=not args.no_map, coco_map=args.coco_map)
