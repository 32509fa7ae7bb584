#!/usr/bin/env python
"""Per-layer MFU table for the inference forward pass (VERDICT r2 item 4).

Joins a device trace to model layers: every layer body runs under
``jax.named_scope("L|<sub_model>|<layer>|<kind>")`` (models/network.py), the
optimized HLO carries that scope in each instruction's ``metadata op_name``,
and the trace's XLA Ops line gives per-instruction device time. The join
attributes each fused op to the layer of its fusion ROOT (XLA may fuse
across layer boundaries — epilogues of conv i and the quant of conv i+1
land in one fusion — so per-layer times are attribution, not isolation;
totals are exact).

Per-layer MFU = conv MACs at the run's shapes / (device time × peak).
Peaks used (TPU v5e): bf16 197 TFLOP/s, int8 394 TOP/s.

Usage (real chip):
  python tools/mfu_table.py [--quantize int8|int8_chain|bf16] [--batch 128]
      [--image_size 416] [--csv out.csv]
"""
import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

PEAK = {"int8": 394e12, "int8_chain": 394e12, "bf16": 197e12}


def layer_shapes_and_macs(spec, params, batch, image_size):
    """{(sm, layer): {"desc", "macs"}} via abstract eval (no compute)."""
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.models import apply_model

    info = {}

    def observer(sm_name, key, x):
        info.setdefault((sm_name, key), {})["out_shape"] = tuple(x.shape)

    def run(images):
        return apply_model(spec, params, {}, images, train=False,
                           out_observer=observer)

    jax.eval_shape(run, jnp.zeros((batch, image_size, image_size, 3),
                                  jnp.bfloat16))
    table = {}
    for sm in spec.sub_models:
        for i, layer in enumerate(sm.layers):
            key = (sm.name, f"layer{i}")
            out = info.get(key, {}).get("out_shape")
            entry = {"kind": layer.kind, "macs": 0, "desc": layer.kind}
            if layer.kind == "convolutional" and out is not None:
                p = params[sm.name][f"layer{i}"]
                k = p.get("kernel", p.get("kernel_q"))
                kh, kw, cin, cout = k.shape
                ho, wo = out[1], out[2]
                entry["macs"] = batch * ho * wo * cout * kh * kw * cin
                entry["desc"] = f"{kh}x{kw} {cin}->{cout} @{ho}x{wo}"
            table[key] = entry
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantize", default="int8",
                    choices=["int8", "int8_chain", "bf16"])
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image_size", type=int, default=416)
    ap.add_argument("--s2d", action="store_true", default=True)
    ap.add_argument("--no_s2d", dest="s2d", action="store_false")
    ap.add_argument("--csv", default="")
    args = ap.parse_args()
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolov3_tpu.models import (apply_model, fold_batch_norm, init_model,
                                   parse_model_config)

    spec = parse_model_config(f"config/models/{args.model}/model.yaml",
                              nclasses=80)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    folded = fold_batch_norm(params, state)
    if args.quantize in ("int8", "int8_chain"):
        from yolov3_tpu.ops.quantize import calibrate_scales, quantize_params

        rng0 = np.random.RandomState(7)
        in_am, out_am = calibrate_scales(
            spec, folded,
            [rng0.rand(8, args.image_size, args.image_size, 3)
             .astype(np.float32)])
        run_p = quantize_params(
            spec, folded, in_am,
            out_absmax=out_am if args.quantize == "int8_chain" else None)
        if args.s2d:
            from yolov3_tpu.ops.s2d import s2d_stem

            spec, run_p = s2d_stem(spec, run_p, image_size=args.image_size)
    else:
        run_p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), folded)

    macs = layer_shapes_and_macs(spec, run_p, args.batch, args.image_size)

    @jax.jit
    def fwd(p, images):
        outs, _ = apply_model(spec, p, {}, images.astype(jnp.bfloat16),
                              train=False)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    x = jax.device_put(np.random.RandomState(0)
                       .rand(args.batch, args.image_size, args.image_size, 3)
                       .astype(np.float32))
    float(fwd(run_p, x))  # warm/compile

    # instruction name -> layer scope, from the optimized HLO metadata
    hlo = fwd.lower(run_p, x).compile().as_text()
    op2layer = {}
    pat = re.compile(r"%([\w.\-]+) = .*op_name=\"[^\"]*L\|([^|\"]+)\|([^|\"]+)\|([^/\"]+)")
    for m in pat.finditer(hlo):
        op2layer[m.group(1)] = (m.group(2), m.group(3))

    tdir = tempfile.mkdtemp(prefix="mfu_trace_")
    with jax.profiler.trace(tdir):
        for _ in range(2):
            r = fwd(run_p, x)
        float(r)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    f = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"), recursive=True)
    xs = xplane_pb2.XSpace()
    with open(f[0], "rb") as fh:
        xs.ParseFromString(fh.read())
    planes = [p for p in xs.planes if p.name == "/device:TPU:0"] or [
        p for p in xs.planes
        if any(ln.name == "XLA Ops" for ln in p.lines)]  # CPU smoke
    plane = planes[0]
    meta = plane.event_metadata
    per_layer = collections.Counter()
    unattributed = collections.Counter()
    nsteps = 0
    for line in plane.lines:
        if line.name == "XLA Modules":
            nsteps = max(nsteps, len(line.events))
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = meta[ev.metadata_id].name.lstrip("%").split(" ")[0]
            layer = op2layer.get(name)
            if layer:
                per_layer[layer] += ev.duration_ps / 1e12  # -> seconds
            else:
                kind = re.match(r"([a-zA-Z\-_]+)", name)
                unattributed[kind.group(1) if kind else name] += (
                    ev.duration_ps / 1e12)
    nsteps = max(nsteps, 1)
    peak = PEAK[args.quantize]

    rows = []
    for (sm_name, key), t in per_layer.items():
        t /= nsteps
        m = macs.get((sm_name, key),
                     {"macs": 0, "desc": "?", "kind": "?"})
        flops = 2 * m["macs"]
        rows.append({
            "layer": f"{sm_name}/{key}", "desc": m["desc"],
            "ms": t * 1e3, "gflops": flops / 1e9,
            "mfu_pct": 100.0 * flops / (t * peak) if t > 0 and flops else 0.0,
        })
    rows.sort(key=lambda r: -r["ms"])
    total_t = sum(r["ms"] for r in rows)
    total_f = sum(r["gflops"] for r in rows)
    other_t = sum(unattributed.values()) / nsteps * 1e3

    hdr = f"{'layer':34s} {'conv':22s} {'ms':>7s} {'GFLOP':>9s} {'MFU%':>6s}"
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(f"{r['layer']:34s} {r['desc']:22s} {r['ms']:7.3f} "
              f"{r['gflops']:9.1f} {r['mfu_pct']:6.1f}")
    print("-" * len(hdr))
    mfu = 100.0 * total_f * 1e9 / (total_t / 1e3 * peak)
    print(f"{'TOTAL attributed':34s} {'':22s} {total_t:7.2f} {total_f:9.1f} "
          f"{mfu:6.1f}")
    print(f"{'unattributed (copies/misc)':34s} {'':22s} {other_t:7.2f}")
    for k, v in unattributed.most_common(6):
        print(f"   {k:31s} {'':22s} {v/nsteps*1e3:7.2f}")
    full = total_t + other_t
    print(json.dumps({
        "quantize": args.quantize, "batch": args.batch,
        "device_ms_fwd": round(full, 2),
        "img_per_sec_fwd": round(args.batch / (full / 1e3), 1),
        "model_flops_g": round(total_f, 1),
        "attributed_mfu_pct": round(mfu, 1),
        "e2e_mfu_pct": round(100.0 * total_f * 1e9 / (full / 1e3 * peak), 1),
    }))
    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
        print(f"csv -> {args.csv}")


if __name__ == "__main__":
    main()
