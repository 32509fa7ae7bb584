#!/usr/bin/env python
"""QAT accuracy A/B (VERDICT r2 item 3): does QAT buy int8 serving accuracy?

Trains three otherwise-identical models on the convergence corpus —
  plain        (qat: false)
  qat=weights  (qat: true  — STE fake-quant of conv kernels on the int8
                serving lattice)
  qat=full     (qat: full  — + activation fake-quant on the int8_chain
                lattice)
— then evaluates EVERY checkpoint under EVERY serving tier
(bf16, int8 PTQ, int8_chain PTQ) on the held-out val split, and writes
the mAP@0.5 matrix to <out>/qat_ab.json. The question each row answers:
"how much mAP does this training mode lose when served quantized?"

Reuses tools/train_convergence.py wholesale (same corpus, trainer config,
and predictor-based evaluator), so the A/B differs ONLY in the qat key.

Usage (real TPU chip, ~3× the tiny convergence run):
  python tools/qat_ab.py [--epochs 240] [--model yolov3_tiny]
  python tools/qat_ab.py --eval_only   # reuse existing checkpoints
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MODES = [("plain", "False"), ("qat_weights", "weights"), ("qat_full", "full")]
TIERS = [None, "int8", "int8_chain"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov3_tiny")
    ap.add_argument("--epochs", type=int, default=240)
    ap.add_argument("--n_train", type=int, default=4096)
    ap.add_argument("--image_size", type=int, default=416)
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--out_root", default="output/convergence")
    ap.add_argument("--eval_only", action="store_true")
    ap.add_argument("--modes", default=None,
                    help="comma-separated subset of plain,qat_weights,"
                         "qat_full (full-model runs cost ~1h each)")
    ap.add_argument("--remat", default=None,
                    help="forwarded to train_convergence (full yolov3 at "
                         "B=128 needs 'conv' beside the staged corpus)")
    args = ap.parse_args()

    data_root = args.data_root or f"output/shapes_conv{args.image_size}"
    modes = ([m for m in MODES if m[0] in set(args.modes.split(","))]
             if args.modes else MODES)
    rows = {}
    for name, qat in modes:
        out_dir = (os.path.join(args.out_root, args.model) if name == "plain"
                   else os.path.join(args.out_root, f"{args.model}_{name}"))
        ckpt = os.path.join(out_dir, f"{args.model}.tf")
        # the plain row may reuse an existing (flagship) checkpoint — but
        # only from the SAME regime; a leftover from different
        # epochs/corpus args must retrain, not contaminate the A/B
        # (ADVICE r4 #3, same guard as tools/augment_ab.py)
        plain_reusable = name == "plain" and os.path.exists(ckpt + ".npz")
        if plain_reusable:
            rp = os.path.join(out_dir, "result.json")
            prev = json.load(open(rp)) if os.path.exists(rp) else {}
            regime = {"epochs": args.epochs, "n_train": args.n_train,
                      "image_size": args.image_size, "data_root": data_root}
            stale = {k: (prev.get(k), v) for k, v in regime.items()
                     if prev.get(k) != v}
            if stale:
                print(f":: plain: stale checkpoint from a different regime "
                      f"{stale} — retraining", flush=True)
                plain_reusable = False
        if not args.eval_only and not plain_reusable:
            # subprocess per run: jit caches and the device-resident corpus
            # from one training run would otherwise bloat the next's HBM
            cmd = [sys.executable, "tools/train_convergence.py",
                   "--model", args.model, "--epochs", str(args.epochs),
                   "--n_train", str(args.n_train),
                   "--image_size", str(args.image_size),
                   "--data_root", data_root, "--out_dir", out_dir,
                   "--qat", qat]
            if args.remat:
                cmd += ["--remat", args.remat]
            print("::", " ".join(cmd), flush=True)
            subprocess.run(cmd, check=True)

        from tools.train_convergence import evaluate_map50

        model_config = f"config/models/{args.model}/model.yaml"
        rows[name] = {}
        for tier in TIERS:
            r = evaluate_map50(model_config, ckpt, data_root,
                               args.image_size, quantize=tier)
            rows[name][tier or "bf16"] = round(r["map50"], 4)
            print(json.dumps({"train_mode": name, "serve_tier": tier or "bf16",
                              "map50": round(r["map50"], 4)}), flush=True)

    for name in rows:
        base = rows[name]["bf16"]
        rows[name]["int8_delta"] = round(rows[name]["int8"] - base, 4)
        rows[name]["int8_chain_delta"] = round(
            rows[name]["int8_chain"] - base, 4)
    out = {"model": args.model, "image_size": args.image_size,
           "epochs": args.epochs, "n_train": args.n_train,
           "data_root": data_root, "matrix": rows}
    path = os.path.join(args.out_root, f"qat_ab_{args.model}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["matrix"]))


if __name__ == "__main__":
    main()
