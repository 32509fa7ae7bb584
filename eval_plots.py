#!/usr/bin/env python
"""Per-class evaluation bar charts (reference eval_plots.py surface):
loads the .npy counter histograms written by evaluate_yolov3.py and
renders tp/fp/fn/gt/pred bars per class."""

import argparse

import numpy as np

from yolov3_tpu.eval.plots import barh_multiple_plots
from yolov3_tpu.config import read_class_names

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--threshold", type=str, default="0.1",
                        help="score threshold suffix of the .npy files")
    parser.add_argument("--classes_name_file", type=str, required=True)
    parser.add_argument("--out", type=str, default="eval_plot.png")
    args = parser.parse_args()

    class_names = read_class_names(args.classes_name_file)
    values, labels = [], []
    for name in ("tp", "fp", "fn", "gts", "preds"):
        values.append(np.load(f"{name}_{args.threshold}.npy").sum(axis=0))
        labels.append(name)
    barh_multiple_plots(values, labels, class_names,
                        title=f"evaluation @ score>{args.threshold}", out_path=args.out)
    print(f"saved {args.out}")
