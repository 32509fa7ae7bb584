"""Installed console entry points (pyproject.toml ``[project.scripts]``).

Thin wrappers over the same app classes the repo-root CLIs drive — the
root scripts keep the reference's ``python train.py --config …`` surface
(reference train.py:220-232 etc.); these give an installed package the
equivalent ``yolov3-tpu-train --config …`` commands.
"""

from __future__ import annotations

import argparse


def _load(path: str) -> dict:
    # safe_load + ${VAR:-default} expansion — same loader as the root CLIs
    from ..config import load_yaml

    return load_yaml(path)


def train_main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="yolov3-tpu-train")
    parser.add_argument("--config", type=str, default="config/train_config.yaml",
                        help="yaml config file")
    args = parser.parse_args(argv)
    from .train_app import Train

    Train()(**_load(args.config))


def inference_main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="yolov3-tpu-infer")
    parser.add_argument("--config", type=str, default="config/detect_config.yaml",
                        help="yaml config file")
    args = parser.parse_args(argv)
    from .inference_app import Inference

    Inference()(**_load(args.config))


def evaluate_main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="yolov3-tpu-evaluate")
    parser.add_argument("--evaluate_config", type=str, default="config/evaluate_config.yaml")
    parser.add_argument("--detect_config", type=str, default="config/detect_config.yaml")
    parser.add_argument("--max_eval_images", type=int, default=None,
                        help="limit evaluated images (reference hardcodes 20)")
    parser.add_argument("--no_map", action="store_true", help="skip mAP@0.5 computation")
    parser.add_argument("--coco_map", action="store_true",
                        help="report COCO-style mAP@[.5:.95] (10 IoU thresholds)")
    args = parser.parse_args(argv)
    from .evaluate_app import evaluate

    evaluate(_load(args.evaluate_config), _load(args.detect_config),
             max_eval_images=args.max_eval_images,
             compute_map=not args.no_map, coco_map=args.coco_map)


def convert_main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="yolov3-tpu-convert")
    parser.add_argument("--config", type=str, default="utilities/convert_config.yaml",
                        help="yaml config file")
    args = parser.parse_args(argv)
    from .convert_app import convert

    convert(_load(args.config))


def export_main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="yolov3-tpu-export")
    parser.add_argument("--config", type=str, default="config/detect_config.yaml",
                        help="detect/serve config yaml (model + NMS keys)")
    parser.add_argument("--out", type=str, required=True,
                        help="output artifact path (e.g. yolov3.yoloexp)")
    parser.add_argument("--platforms", type=str, default="cpu,tpu",
                        help="comma-separated lowering platforms")
    args = parser.parse_args(argv)
    import os

    from .export_app import export_artifact

    cfg = _load(args.config)
    cfg["source_config"] = os.path.abspath(args.config)
    export_artifact(cfg, args.out,
                    platforms=tuple(p.strip() for p in args.platforms.split(",")
                                    if p.strip()))


def serve_main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="yolov3-tpu-serve")
    parser.add_argument("--config", type=str, default="config/serve_config.yaml",
                        help="yaml config file")
    args = parser.parse_args(argv)
    import logging

    logging.basicConfig(level=logging.INFO)
    from .serve_app import Serve

    Serve()(**_load(args.config))
