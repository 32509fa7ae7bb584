#!/usr/bin/env python
"""Train CLI — surface parity with reference train.py:220-232:
``python train.py --config config/train_config.yaml`` (YAML **splatted
into the Train app)."""

import argparse

from yolov3_tpu.config import load_yaml
from yolov3_tpu.apps.train_app import Train

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="config/train_config.yaml",
                        help="yaml config file")
    args = parser.parse_args()
    # load_yaml = safe_load + ${VAR:-default} expansion (config.py)
    train_config = load_yaml(args.config)
    Train()(**train_config)
