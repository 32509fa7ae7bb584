#!/usr/bin/env python
"""Host input-pipeline headroom for training (VERDICT r2 item 8).

Measures the tf-free streaming pipeline end-to-end — TFRecord framing scan
(native CRC32C core when built), proto decode, fused JPEG decode+resize
(native, GIL-free), label assembly, and B-sized batch stacking — at the
exact shape the training hot loop consumes (416², B=128), and reports
whether the host can feed the train step's measured device rate
(PERF.md: 533 img/s at B=128).

This bounds the STREAMING path. The default training config instead uses
`device_dataset` (whole-split HBM staging: host decode happens once per
run, then steps gather from HBM), so this is the fallback/first-epoch
rate, and the rate that matters for corpora too large to stage.

Usage:
  python tools/bench_input_pipeline.py [--data_root output/shapes_conv416]
      [--image_size 416] [--batch 128] [--workers 1 2 4 8] [--target 533]
Prints one JSON line per worker count plus a verdict line.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def bench_stream(data_root, image_size, batch, workers, max_images,
                 batched=False):
    import itertools

    import numpy as np

    from yolov3_tpu.data.pipeline import Batcher, Dataset
    from yolov3_tpu.data.tfrecord import parse_tfrecords, stream_batches

    train_dir = os.path.join(data_root, "tfrecords", "train")
    names = os.path.join(data_root, "class.names")

    if batched:
        # zero-copy fast path: decode straight into batch slots
        def batches():
            return itertools.islice(
                stream_batches(train_dir, image_size, 10, batch,
                               class_file=names, num_workers=workers),
                max_images // batch)
    else:
        def gen():
            n = 0
            for ex in parse_tfrecords(train_dir, image_size, 10, names,
                                      num_workers=workers):
                yield ex
                n += 1
                if n >= max_images:
                    return

        def batches():
            return Batcher(Dataset(gen), batch)

    # warm the page cache + thread pool so we measure decode, not disk
    for _ in batches():
        pass
    t0 = time.perf_counter()
    n_img = 0
    checksum = 0.0
    for images, labels in batches():
        n_img += images.shape[0]
        checksum += float(images[0, 0, 0, 0]) + float(labels[0, 0, 0])
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return n_img / dt, n_img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="output/shapes_conv416")
    ap.add_argument("--image_size", type=int, default=416)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--max_images", type=int, default=1024)
    ap.add_argument("--target", type=float, default=533.0,
                    help="train step's device img/s the host must beat")
    ap.add_argument("--batched", action="store_true",
                    help="use the zero-copy batched fast path "
                         "(tfrecord.stream_batches) instead of the "
                         "per-example Batcher pipeline")
    args = ap.parse_args()

    best = 0.0
    for w in args.workers:
        rate, n = bench_stream(args.data_root, args.image_size, args.batch,
                               w, args.max_images, batched=args.batched)
        best = max(best, rate)
        print(json.dumps({"workers": w, "img_per_sec": round(rate, 1),
                          "images": n, "batch": args.batch,
                          "image_size": args.image_size,
                          "path": "batched" if args.batched else "per-example"}))
    print(json.dumps({"verdict": "feeds_train_step" if best > args.target
                      else "HOST_BOUND",
                      "best_img_per_sec": round(best, 1),
                      "target_img_per_sec": args.target,
                      "headroom_x": round(best / args.target, 2)}))


if __name__ == "__main__":
    main()
