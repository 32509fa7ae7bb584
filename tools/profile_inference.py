#!/usr/bin/env python
"""Stage-split inference profiler: times forward / +decode / +NMS / fused
pipelines on the current accelerator with tunnel-safe methodology (staged
inputs, scalar-checksum completion). Reproduces the PERF.md numbers."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_config_file", default="config/models/yolov3/model.yaml")
    parser.add_argument("--nclasses", type=int, default=80)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--image_size", type=int, default=416)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--passes", type=int, default=2)
    parser.add_argument("--num_candidates", type=int, default=256)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from yolov3_tpu.models import parse_model_config, init_model, apply_model, fold_batch_norm
    from yolov3_tpu.ops.decode import yolo_decode
    from yolov3_tpu.ops.detect import detect
    from yolov3_tpu.ops.nms import yolo_nms, gather_detections

    spec = parse_model_config(args.model_config_file, args.nclasses)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    folded16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), fold_batch_norm(params, state))
    anchors = np.abs(np.random.RandomState(0).randn(3, 3, 2)).astype(np.float32) * 0.2 + 0.05
    B = args.batch

    def stage_fn(stage):
        @jax.jit
        def f(p, images):
            outs, _ = apply_model(spec, p, {}, images.astype(jnp.bfloat16), train=False)
            if stage == "forward":
                return sum(jnp.sum(o) for o in outs)
            if stage == "fused-detect":
                fb, fc, fs, fv = detect(outs, anchors, args.nclasses,
                                        num_candidates=args.num_candidates)
                return jnp.sum(fb) + jnp.sum(fs) + jnp.sum(fv)
            boxes, conf, probs = yolo_decode(outs, anchors, args.nclasses)
            if stage == "+decode":
                return jnp.sum(boxes) + jnp.sum(conf) + jnp.sum(probs)
            nms_out = yolo_nms(boxes, conf, probs, max_boxes=100, iou_threshold=0.5,
                               score_threshold=0.25, num_candidates=args.num_candidates)
            db, dc, ds_, v = gather_detections(*nms_out)
            return jnp.sum(db) + jnp.sum(ds_) + jnp.sum(v)

        return f

    base = jax.device_put(np.random.rand(B, args.image_size, args.image_size, 3)
                          .astype(np.float32))
    perturb = jax.jit(lambda x, i: x * (1.0 + 1e-4 * i))
    xs = [perturb(base, jnp.float32(i)) for i in range(args.iters)]
    jax.block_until_ready(xs)

    print(f"device: {jax.devices()[0]}, batch {B} @ {args.image_size}")
    for stage in ("forward", "+decode", "+nms (full pipeline)", "fused-detect"):
        key = stage if stage in ("forward", "+decode", "fused-detect") else "full"
        f = stage_fn(key if key != "full" else "nms")
        _ = float(f(folded16, xs[0]))
        best = float("inf")
        for _ in range(args.passes):
            t0 = time.perf_counter()
            checksums = [f(folded16, x)[...] for x in xs]
            _ = float(jnp.sum(jnp.stack(checksums)))
            best = min(best, time.perf_counter() - t0)
        print(f"  {stage:22s}: {best / args.iters * 1000:7.2f} ms/batch  "
              f"{B * args.iters / best:7.0f} img/s")


if __name__ == "__main__":
    main()
