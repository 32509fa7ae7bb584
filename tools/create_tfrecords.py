#!/usr/bin/env python
"""COCO-JSON → TFRecords converter (dataset tooling the reference assumes).

The reference consumes TFRecords in the schema of its
``core/load_tfrecords.py:34-41`` (``image/encoded``,
``image/object/class/text``, ``image/object/bbox/{xmin,ymin,xmax,ymax}``
normalized) but ships no way to produce them — its datasets came from an
external tool. This closes the loop: convert a COCO-style
``{images, annotations, categories}`` JSON + images directory into
sharded ``.tfrec`` files our loader AND the reference's can read, plus an
optional ``.names`` class file in categories-list order (the dense-id
order both COCO loaders use — ``core/create_dataset_from_files.py:63``).

Usage:
  python tools/create_tfrecords.py \
      --images_dir datasets/shapes_toy/coco/images \
      --annotations datasets/shapes_toy/coco/annotations.json \
      --out_dir /tmp/tfrecords/train [--shard_size 1024] \
      [--names_out /tmp/class.names] [--max_examples N]

Boxes are written normalized by each image's width/height; class labels
are written as category-name text (id mapping happens at read time via
the ``.names`` file, exactly like the reference).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolov3_tpu.data.tfrecord import encode_example, write_tfrecord  # noqa: E402


def coco_to_examples(images_dir: str, annotations_path: str,
                     max_examples: int | None = None):
    """Yield (serialized tf.train.Example, n_boxes) per image."""
    with open(annotations_path, "r") as f:
        coco = json.load(f)
    names = {c["id"]: c["name"] for c in coco["categories"]}
    by_image = defaultdict(list)
    for annot in coco["annotations"]:
        by_image[annot["image_id"]].append(annot)

    images = coco["images"]
    if max_examples:
        images = images[: int(max_examples)]
    for entry in images:
        path = os.path.join(images_dir, entry["file_name"])
        with open(path, "rb") as f:
            encoded = f.read()
        iw, ih = float(entry["width"]), float(entry["height"])
        anns = by_image[entry["id"]]
        xmin, ymin, xmax, ymax, texts = [], [], [], [], []
        for annot in anns:
            x, y, w, h = annot["bbox"]
            xmin.append(x / iw)
            ymin.append(y / ih)
            xmax.append((x + w) / iw)
            ymax.append((y + h) / ih)
            texts.append(names[annot["category_id"]])
        yield encode_example({
            "image/encoded": [encoded],
            "image/object/class/text": texts,
            "image/object/bbox/xmin": xmin,
            "image/object/bbox/ymin": ymin,
            "image/object/bbox/xmax": xmax,
            "image/object/bbox/ymax": ymax,
        }), len(anns)


def load_names(annotations_path: str) -> list[str]:
    """Category names in categories-list order (the dense-id order)."""
    with open(annotations_path, "r") as f:
        return [c["name"] for c in json.load(f)["categories"]]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--images_dir", required=True)
    parser.add_argument("--annotations", required=True, help="COCO JSON")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--shard_size", type=int, default=1024,
                        help="examples per .tfrec shard")
    parser.add_argument("--max_examples", type=int, default=None)
    parser.add_argument("--names_out", default=None,
                        help="also write a .names class file here")
    args = parser.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    shard, shard_idx, n_images, n_boxes = [], 0, 0, 0

    def flush():
        nonlocal shard, shard_idx
        if shard:
            write_tfrecord(
                os.path.join(args.out_dir, f"file_{shard_idx:02d}.tfrec"), shard)
            shard_idx += 1
            shard = []

    for record, boxes in coco_to_examples(args.images_dir, args.annotations,
                                          args.max_examples):
        shard.append(record)
        n_images += 1
        n_boxes += boxes
        if len(shard) >= args.shard_size:
            flush()
    flush()

    if args.names_out:
        with open(args.names_out, "w") as f:
            f.write("\n".join(load_names(args.annotations)) + "\n")

    print(f"wrote {n_images} images / {n_boxes} boxes in {shard_idx} shard(s) "
          f"to {args.out_dir}")


if __name__ == "__main__":
    main()
