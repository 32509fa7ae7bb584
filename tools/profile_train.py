#!/usr/bin/env python
"""Train-step profiler: wall img/s, per-step DEVICE time, per-op breakdown.

Reproduces the PERF.md training table. Wall time over a tunneled dev
attachment includes ~16-25 ms/step dispatch overhead that a co-located
host does not pay, so the number that matters for capacity planning is
the device time (XLA Modules line of a jax.profiler trace).

Usage:
  python tools/profile_train.py [--batch 128] [--image_size 416]
      [--nclasses 80] [--steps 10] [--trace] [--top 15]
"""
import argparse
import collections
import glob
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_config_file", default="config/models/yolov3/model.yaml")
    ap.add_argument("--nclasses", type=int, default=80)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image_size", type=int, default=416)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--fp32", action="store_true", help="disable bf16 mixed precision")
    ap.add_argument("--bn_subsample", type=int, default=1,
                    help="BN stats from a strided spatial subsample (A/B lever)")
    ap.add_argument("--s2d", action="store_true",
                    help="enable the space-to-depth stem reschedule (measured "
                         "perf-neutral at B=128 — PERF.md)")
    ap.add_argument("--trace", action="store_true",
                    help="capture a jax.profiler trace and print device-time breakdown")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--top_fusions", type=int, default=0,
                    help="also print the N most expensive INDIVIDUAL ops "
                         "(fusion.N names resolvable in the --dump_hlo text)")
    ap.add_argument("--dump_hlo", default="",
                    help="write the optimized HLO of the train step here "
                         "(look up fusion.N names from --top_fusions)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolov3_tpu.models import parse_model_config, init_model
    from yolov3_tpu.models.network import head_grid_sizes
    from yolov3_tpu.parallel.train_step import init_train_state, make_adam, make_train_step

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    os.chdir(root)
    spec = parse_model_config(args.model_config_file, args.nclasses)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    B, S = args.batch, args.image_size
    grid_sizes = head_grid_sizes(spec, S)
    anchors = (np.abs(np.random.RandomState(0).randn(3, 3, 2)) * 0.2 + 0.05).astype(np.float32)
    opt = make_adam(1e-3)
    step_spec = spec
    if args.s2d:
        from yolov3_tpu.ops.s2d import s2d_stem_train

        step_spec = s2d_stem_train(spec, S)
        if step_spec is not spec:
            print("stem_s2d: on", file=sys.stderr)
    if args.bn_subsample > 1:
        from yolov3_tpu.models.layers import set_bn_stats_subsample

        set_bn_stats_subsample(args.bn_subsample)
        print(f'bn_stats_subsample: {args.bn_subsample}', file=sys.stderr)
    step = make_train_step(step_spec, anchors, grid_sizes, batch_size=B, optimizer=opt,
                           compute_dtype=None if args.fp32 else jnp.bfloat16)
    ts = init_train_state(params, state, opt)

    rng = np.random.RandomState(0)
    images = jax.device_put(rng.rand(B, S, S, 3).astype(np.float32))
    labels = np.zeros((B, 20, 6), np.float32)
    labels[:, :3] = [[0.3, 0.3, 0.6, 0.6, 1, 1], [0.1, 0.5, 0.3, 0.9, 1, 3],
                     [0.6, 0.1, 0.9, 0.4, 1, 7]]
    labels = jax.device_put(jnp.asarray(labels))

    ts, m = step(ts, images, labels)
    print(f"warm loss {float(m['total_loss']):.3f}", file=sys.stderr)

    if args.dump_hlo:
        compiled = step.lower(ts, images, labels).compile()
        with open(args.dump_hlo, "w") as fh:
            fh.write(compiled.as_text())
        print(f"optimized HLO -> {args.dump_hlo}", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        ts, m = step(ts, images, labels)
    total = float(m["total_loss"])  # fetch = sync
    dt = (time.perf_counter() - t0) / args.steps
    assert np.isfinite(total)
    print(f"wall: {dt*1e3:.1f} ms/step  {B/dt:.1f} img/s (includes per-step dispatch)")

    if not args.trace:
        return
    tdir = tempfile.mkdtemp(prefix="train_trace_")
    with jax.profiler.trace(tdir):
        for _ in range(2):
            ts, m = step(ts, images, labels)
        float(m["total_loss"])
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:  # pragma: no cover - env without TF
        print(f"(no xplane parser available: {e}; trace left in {tdir})")
        return
    f = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True)
    if not f:
        print(f"(no xplane produced; trace dir {tdir})")
        return
    xs = xplane_pb2.XSpace()
    with open(f[0], "rb") as fh:
        xs.ParseFromString(fh.read())
    planes = [p for p in xs.planes if p.name == "/device:TPU:0"]
    if not planes:
        print("(no TPU plane in trace — running on CPU?)")
        return
    plane = planes[0]
    meta = plane.event_metadata
    for line in plane.lines:
        if line.name == "XLA Modules":
            durs = sorted(ev.duration_ps / 1e9 for ev in line.events)
            if durs:
                med = durs[len(durs) // 2]
                print(f"device: {med:.2f} ms/step ({B/(med/1e3):.1f} img/s device rate); "
                      f"module events (ms): {[f'{d:.1f}' for d in durs]}")
        if line.name != "XLA Ops":
            continue
        agg = collections.Counter()
        cnt = collections.Counter()
        for ev in line.events:
            name = meta[ev.metadata_id].name
            mm = re.match(r"%?([a-zA-Z\-_]+)[\.\d]* =", name)
            key = mm.group(1) if mm else name.split(" ")[0][:30]
            agg[key] += ev.duration_ps / 1e9
            cnt[key] += 1
        print("-- device time by op type (ms/step):")
        for k, v in agg.most_common(args.top):
            print(f"   {k:32s} {v/2:7.2f}  x{cnt[k]}")
        if args.top_fusions:
            per_op = collections.Counter()
            for ev in line.events:
                per_op[meta[ev.metadata_id].name.split(" ")[0]] += ev.duration_ps / 1e9
            print(f"-- top {args.top_fusions} individual ops (ms/step):")
            for k, v in per_op.most_common(args.top_fusions):
                print(f"   {k:44s} {v/2:7.2f}")


if __name__ == "__main__":
    main()
