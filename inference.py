#!/usr/bin/env python
"""Inference CLI — surface parity with reference inference.py:191-201."""

import argparse

import yaml

from yolov3_tpu.apps.inference_app import Inference

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="config/detect_config.yaml",
                        help="yaml config file")
    args = parser.parse_args()
    with open(args.config, "r") as stream:
        detect_config = yaml.safe_load(stream)
    Inference()(**detect_config)
