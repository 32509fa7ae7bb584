#!/usr/bin/env python
"""Visual check of the grid-scatter target assignment (replaces the
reference's stale tester.py): renders, per scale and anchor, the boxes
extracted back out of the target cubes over the source image."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="config/train_config.yaml")
    parser.add_argument("--out", type=str, default="assignment_debug.png")
    args = parser.parse_args()

    import jax.numpy as jnp
    import yaml

    from yolov3_tpu.config import count_file_lines, get_anchors
    from yolov3_tpu.data.pipeline import Batcher, create_dataset
    from yolov3_tpu.models import parse_model_config
    from yolov3_tpu.models.network import head_grid_sizes
    from yolov3_tpu.ops.assign import assign_targets
    from yolov3_tpu.utils.render import render_bboxes

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    anchors = get_anchors(cfg["anchors_file"])
    nclasses = count_file_lines(cfg["classes_name_file"])
    spec = parse_model_config(cfg["model_config_file"], nclasses)
    grid_sizes = head_grid_sizes(spec, cfg["image_size"])

    ds, _ = create_dataset(cfg["dataset_config"], cfg["image_size"], cfg["max_bboxes"],
                           cfg["classes_name_file"], 4)
    images, labels = next(iter(Batcher(ds[0], 1)))
    grids = assign_targets(jnp.asarray(labels), anchors, grid_sizes)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nscales = len(grids)
    fig, axes = plt.subplots(nscales, 3, figsize=(12, 4 * nscales), squeeze=False)
    for s, cube in enumerate(grids):
        cube = np.asarray(cube)[0]  # (g, g, 3, 6)
        for a in range(3):
            rows = cube[..., a, :][cube[..., a, 4] == 1]
            img = render_bboxes(images[0], rows[:, :4], color=(1, 1, 1))
            axes[s][a].imshow(np.clip(img, 0, 1))
            axes[s][a].set_title(f"scale {s} (g={cube.shape[0]}), anchor {a}: {len(rows)} boxes")
            axes[s][a].axis("off")
    fig.tight_layout()
    fig.savefig(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
