#!/usr/bin/env python
"""Model × eval-resolution mAP matrix (round 5, BASELINE configs[4] story).

Evaluates each trained flagship variant at BOTH eval resolutions with the
serving predictor (same evaluator as tools/train_convergence.py):

  variants (rows):
    single_scale_416   the 416-native flagship (benchmarks/convergence/yolov3)
    ms_per_epoch       multi_scale [320,416,608], one size per EPOCH
    ms_interval10      multi_scale [320,416,608], size switch every 10 BATCHES
                       (Darknet's regime — `interval: 10`)
  evals (columns):
    416 — shapes_conv416 val split at 416²
    608 — shapes_conv608 val split at 608²

This is the artifact behind the BatchNorm finding in PERF.md "Scale
generalization": per-epoch cycling leaves the BN running statistics
calibrated only for the final epoch's scale; Darknet-style sub-epoch
switching blends them, giving ONE checkpoint that holds up at every
trained scale. Missing checkpoints/corpora are recorded as null rows, not
silently skipped.

Usage (real TPU chip, ~3-8 min per cell):
  python tools/scale_matrix.py [--out output/scale_matrix.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

VARIANTS = {
    "single_scale_416": "output/convergence/yolov3/yolov3.tf",
    "ms_per_epoch": "output/convergence/yolov3_ms/yolov3.tf",
    "ms_interval10": "output/convergence/yolov3_msi/yolov3.tf",
    # BN-recalibrated siblings (tools/bn_recalibrate.py): same conv
    # weights, running statistics recomputed at the named size. The
    # per-epoch+cal416 row isolates how much of its 416 deficit is pure
    # BN miscalibration; the single-scale+cal608 row separates the BN
    # component of the 608 collapse from the feature component.
    "ms_per_epoch_cal416": "output/convergence/yolov3_ms/yolov3.tf.cal416",
    "single_scale_416_cal608": "output/convergence/yolov3/yolov3.tf.cal608",
    # the recommended recipe: interval-trained (scale-robust features,
    # deliberately scale-blended BN) + per-scale recalibration — one
    # stats sibling per trained resolution
    "ms_interval10_cal320": "output/convergence/yolov3_msi/yolov3.tf.cal320",
    "ms_interval10_cal416": "output/convergence/yolov3_msi/yolov3.tf.cal416",
    "ms_interval10_cal608": "output/convergence/yolov3_msi/yolov3.tf.cal608",
}
EVALS = {
    # 320 evals resize the 608-native val split (the same geometry the
    # staged multi-scale trainer used for its 320 batches)
    "320": ("output/shapes_conv608", 320),
    "416": ("output/shapes_conv416", 416),
    "608": ("output/shapes_conv608", 608),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/scale_matrix.json")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant subset")
    args = ap.parse_args()
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

    from tools.train_convergence import evaluate_map50

    model_config = "config/models/yolov3/model.yaml"
    only = set(args.only.split(",")) if args.only else None
    rows = {}
    for name, ckpt in VARIANTS.items():
        if only and name not in only:
            continue
        rows[name] = {"checkpoint": ckpt}
        if not os.path.exists(ckpt + ".npz"):
            rows[name]["missing"] = True
            print(json.dumps({"variant": name, "missing": True}), flush=True)
            continue
        for col, (data_root, size) in EVALS.items():
            if not os.path.isdir(os.path.join(data_root, "tfrecords", "val")):
                rows[name][f"map50_at_{col}"] = None
                continue
            t0 = time.time()
            r = evaluate_map50(model_config, ckpt, data_root, size)
            rows[name][f"map50_at_{col}"] = round(r["map50"], 4)
            rows[name][f"eval_{col}_wall_s"] = round(time.time() - t0, 1)
            print(json.dumps({"variant": name, "eval": col,
                              "map50": rows[name][f"map50_at_{col}"]}),
                  flush=True)

    out = {"model_config": model_config,
           "evals": {k: {"data_root": v[0], "image_size": v[1]}
                     for k, v in EVALS.items()},
           "eval_score_threshold": 0.01,
           "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
