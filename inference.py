#!/usr/bin/env python
"""Inference CLI — surface parity with reference inference.py:191-201."""

import argparse

from yolov3_tpu.config import load_yaml
from yolov3_tpu.apps.inference_app import Inference

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="config/detect_config.yaml",
                        help="yaml config file")
    args = parser.parse_args()
    # load_yaml = safe_load + ${VAR:-default} expansion (config.py)
    detect_config = load_yaml(args.config)
    Inference()(**detect_config)
