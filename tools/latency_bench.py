#!/usr/bin/env python
"""B=1 serving-latency benchmark: device-time p50 without tunnel RTT.

Methodology: the whole predict (forward + decode + NMS + gather) is chained
K times inside ONE jitted ``lax.fori_loop`` — iteration i+1's input is
derived from iteration i's outputs, so the chip executes K serialized
end-to-end predicts with zero host involvement. One dispatch + one scalar
fetch bound the whole run; device time per predict = total / K. This
excludes the host→device dispatch (~25 ms RTT on the tunneled dev setup,
<100 µs on a co-located host) — stated, not hidden; the reference has no
latency benchmark at all (SURVEY §6).

Serving-tier knobs: --quantize int8 (chain PTQ), --num_candidates (NMS
top-K; B=1 serving typically wants fewer than the batch default).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_config_file", default="config/models/yolov3/model.yaml")
    ap.add_argument("--nclasses", type=int, default=80)
    ap.add_argument("--image_size", type=int, default=416)
    ap.add_argument("--iters", type=int, default=200, help="chained predicts per measurement")
    ap.add_argument("--reps", type=int, default=5, help="measurements (p50 over these)")
    ap.add_argument("--quantize", default="", choices=["", "int8"])
    ap.add_argument("--num_candidates", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from yolov3_tpu.models import parse_model_config, init_model, apply_model, fold_batch_norm
    from yolov3_tpu.ops.detect import detect

    spec = parse_model_config(args.model_config_file, args.nclasses)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    folded = fold_batch_norm(params, state)
    if args.quantize == "int8":
        from yolov3_tpu.ops.quantize import calibrate_scales, quantize_params

        rng0 = np.random.RandomState(7)
        in_am, out_am = calibrate_scales(
            spec, folded,
            [rng0.rand(2, args.image_size, args.image_size, 3).astype(np.float32)])
        run_params = quantize_params(spec, folded, in_am, out_absmax=out_am)
        from yolov3_tpu.ops.s2d import s2d_stem

        spec, run_params = s2d_stem(spec, run_params, image_size=args.image_size)
    else:
        run_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), folded)
    anchors = np.abs(np.random.RandomState(0).randn(3, 3, 2)).astype(np.float32) * 0.2 + 0.05

    S = args.image_size

    def one_predict(image):
        outs, _ = apply_model(spec, run_params, {}, image.astype(jnp.bfloat16), train=False)
        boxes, classes, scores, valid = detect(
            outs, anchors, args.nclasses, max_boxes=100, iou_threshold=0.5,
            score_threshold=0.25, num_candidates=args.num_candidates)
        return jnp.sum(boxes) + jnp.sum(scores) + jnp.sum(valid)

    @jax.jit
    def chained(image0):
        def body(i, carry):
            img, acc = carry
            s = one_predict(img)
            # next input depends on this iteration's output: serialized on device
            img = img * (1.0 + 1e-6 * jnp.tanh(s))
            return img, acc + s

        img, acc = lax.fori_loop(0, args.iters, body, (image0, jnp.float32(0.0)))
        return acc

    rng = np.random.RandomState(0)
    x = jax.device_put(rng.rand(1, S, S, 3).astype(np.float32))
    t0 = time.perf_counter()
    _ = float(chained(x))  # compile + warm
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        acc = float(chained(x))
        times.append((time.perf_counter() - t0) / args.iters * 1e3)
        assert np.isfinite(acc)
    times.sort()
    p50 = times[len(times) // 2]
    tier = args.quantize or "bf16"
    print(f"p50 device-time per B=1 predict ({tier}, {S}x{S}, "
          f"K={args.num_candidates}): {p50:.3f} ms  "
          f"(per-rep ms over {args.reps} reps of {args.iters} chained: "
          f"{', '.join(f'{t:.3f}' for t in times)})")


if __name__ == "__main__":
    main()
