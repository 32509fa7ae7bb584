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
the exported program. Installed-package equivalent: ``yolov3-tpu-export``.
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

    from yolov3_tpu.apps.export_app import export_artifact

    from yolov3_tpu.config import load_yaml  # ${VAR:-default} expansion

    cfg = load_yaml(args.config)
    cfg["source_config"] = os.path.abspath(args.config)
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    export_artifact(cfg, args.out, platforms=platforms)


if __name__ == "__main__":
    main()
