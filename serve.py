#!/usr/bin/env python
"""Serving CLI — online batching detection endpoint (new capability; the
reference has no serving path, its inference.py is a batch CLI)."""

import argparse
import logging

from yolov3_tpu.config import load_yaml
from yolov3_tpu.apps.serve_app import Serve

if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="config/serve_config.yaml",
                        help="yaml config file")
    args = parser.parse_args()
    # load_yaml = safe_load + ${VAR:-default} expansion (config.py)
    serve_config = load_yaml(args.config)
    Serve()(**serve_config)
