#!/usr/bin/env python
"""One-shot legacy-checkpoint converter: Keras save_weights (TF format) →
native .npz weights.

The framework reads legacy Keras TF-format checkpoints transparently
(yolov3_tpu/io/resolve.py), but that path needs tensorflow installed. This
tool converts once, after which TF is not needed at all — matching the
"existing checkpoints keep working" requirement while keeping TF a
convert-time-only dependency. Mapping = the same Keras object-graph walk
used by the transparent reader (io/checkpoint.py::_weighted_layer_paths;
reference save format: train.py:76-78, load: inference.py:102).

Usage:
  python tools/convert_tf_checkpoint.py \
      --model-config config/models/yolov3/model.yaml \
      --classes-name-file datasets/coco2012/coco.names \
      --input checkpoints/keras_coco_yolov3.tf \
      --output checkpoints/keras_coco_yolov3.tf.npz

(--nclasses N may replace --classes-name-file.)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-config", required=True,
                    help="model DSL yaml matching the checkpointed architecture")
    ap.add_argument("--classes-name-file", help=".names file (sets nclasses)")
    ap.add_argument("--nclasses", type=int, help="number of classes (alternative)")
    ap.add_argument("--input", required=True,
                    help="TF checkpoint prefix (the path passed to save_weights, "
                         "i.e. without .index/.data suffixes)")
    ap.add_argument("--output", help="output .npz path "
                    "(default: <input>.npz, the transparent-load location)")
    args = ap.parse_args(argv)

    if (args.classes_name_file is None) == (args.nclasses is None):
        ap.error("exactly one of --classes-name-file / --nclasses is required")

    import jax

    from yolov3_tpu.config import count_file_lines
    from yolov3_tpu.io.checkpoint import load_tf_keras_checkpoint
    from yolov3_tpu.io.resolve import native_path, save_weights
    from yolov3_tpu.models import init_model, parse_model_config

    nclasses = args.nclasses or count_file_lines(args.classes_name_file)
    spec = parse_model_config(args.model_config, nclasses)
    params, state = init_model(jax.random.PRNGKey(0), spec)

    params, state, loaded = load_tf_keras_checkpoint(spec, params, state, args.input)
    if loaded == 0:
        raise SystemExit(f"error: {args.input} matched no variables of "
                         f"{args.model_config} (wrong architecture or path?)")

    out = args.output or native_path(args.input)
    save_weights(spec, params, state, out)
    print(f"converted {args.input} -> {native_path(out)} ({loaded} variables)")


if __name__ == "__main__":
    main()
