#!/usr/bin/env python
"""Darknet .weights converter CLI — surface parity with reference
convert.py:140-170 (``--config utilities/convert_config.yaml``)."""

import argparse

from yolov3_tpu.config import load_yaml
from yolov3_tpu.apps.convert_app import convert

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="utilities/convert_config.yaml",
                        help="yaml config file")
    args = parser.parse_args()
    # load_yaml = safe_load + ${VAR:-default} expansion (config.py)
    convert_config = load_yaml(args.config)
    convert(convert_config)
