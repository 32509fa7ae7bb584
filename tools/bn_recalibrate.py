#!/usr/bin/env python
"""Recalibrate BatchNorm running statistics at a target serving resolution.

Why: BN running means/variances are a property of the activation
distribution, which shifts with input resolution. A checkpoint trained
(or last trained) at one size serves miscalibrated at another — measured
on the 608-staged multi-scale flagship whose final epoch ran at 608:
mAP@0.5 0.87 at 608 but 0.22 at 416, with identical conv weights
(PERF.md "Scale generalization"). AdaBN-style recalibration fixes the
statistics without touching a single weight: run k train-mode forward
passes over the train split at the TARGET size and replace the running
stats with the average batch statistics.

Mechanics: `apply_model(train=True)` only exposes the post-EMA state
(new = m*old + (1-m)*batch), so each batch's statistics are recovered
algebraically — batch = (new - m*old) / (1-m) — and averaged across
batches (mean of batch means; mean of batch variances, the standard
Keras-style recalibration estimator). One pass over k batches, exact,
no momentum-decay tail to wait out.

Writes `<ckpt>.cal<size>` (a normal checkpoint — point any detect/
evaluate/serve config's input_weights_path at it).

Usage (chip or CPU):
  python tools/bn_recalibrate.py --ckpt output/convergence/yolov3_ms/yolov3.tf \
      --data_root output/shapes_conv416 --image_size 416 [--batches 16]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def recalibrate(spec, params, state, batches_iter, momentum):
    """Return state with BN running stats replaced by averaged batch stats."""
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.models import apply_model

    @jax.jit
    def new_state_for(p, s, x):
        return apply_model(spec, p, s, x, train=True)[1]

    acc, n = None, 0
    for images in batches_iter:
        ns = new_state_for(params, state, jnp.asarray(images, jnp.float32))
        batch_stat = jax.tree.map(
            lambda new, old: (new - momentum * old) / (1.0 - momentum),
            ns, state)
        acc = (batch_stat if acc is None else
               jax.tree.map(jnp.add, acc, batch_stat))
        n += 1
    if n == 0:
        raise ValueError("no calibration batches — check data_root/split")
    return jax.tree.map(lambda a: a / n, acc), n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint path (the .tf stem)")
    ap.add_argument("--model_config", default="config/models/yolov3/model.yaml")
    ap.add_argument("--data_root", required=True,
                    help="corpus root (class.names + tfrecords/<split>)")
    ap.add_argument("--split", default="train",
                    help="stats are a train-set property; val only for smoke")
    ap.add_argument("--image_size", type=int, required=True)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--out", default=None,
                    help="default: <ckpt>.cal<image_size>")
    args = ap.parse_args()
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

    import jax
    import numpy as np

    from yolov3_tpu.config import read_class_names
    from yolov3_tpu.data.tfrecord import parse_tfrecords
    from yolov3_tpu.io.resolve import load_weights, save_weights
    from yolov3_tpu.models import init_model, parse_model_config
    from yolov3_tpu.models.layers import BN_MOMENTUM

    names_file = os.path.join(args.data_root, "class.names")
    nclasses = len(read_class_names(names_file))
    spec = parse_model_config(args.model_config, nclasses=nclasses)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    params, state = load_weights(spec, params, state, args.ckpt)

    def batches():
        buf, yielded = [], 0
        src = os.path.join(args.data_root, "tfrecords", args.split)
        for im, _ in parse_tfrecords(src, args.image_size, 10, names_file):
            buf.append(np.asarray(im))
            if len(buf) == args.batch_size:
                yield np.stack(buf)
                buf, yielded = [], yielded + 1
                if yielded >= args.batches:
                    return

    new_state, n = recalibrate(spec, params, state, batches(), BN_MOMENTUM)
    out = args.out or f"{args.ckpt}.cal{args.image_size}"
    save_weights(spec, params, new_state, out)
    print(json.dumps({"out": out, "batches": n,
                      "image_size": args.image_size,
                      "batch_size": args.batch_size}))


if __name__ == "__main__":
    main()
