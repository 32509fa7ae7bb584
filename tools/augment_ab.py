#!/usr/bin/env python
"""Augmentation/EMA/multi-scale value A/B (VERDICT r3 item 4).

Every training extension this repo ships beyond the reference's
train.py (mosaic, HSV jitter, EMA validation, multi-scale) is
mechanically tested — this tool measures whether each one actually
moves val mAP, the same bar the QAT A/B applied (tools/qat_ab.py).

The regime is a deliberately SMALL corpus (default 512 train images
@416²) where the model can't saturate: on the 4096-image convergence
corpus yolov3_tiny reaches mAP@0.5 0.982 and there is no headroom for
any augmentation to show an effect. Each variant trains otherwise
identically (same seed, corpus, trainer config via
tools/train_convergence.py) and is evaluated with the serving
predictor on the same held-out 256-image val split.

Variants:
  plain        no extension (the reference's training regime + cosine/bf16)
  mosaic       augmentation {mosaic: 0.5} (YOLOv4-style 4-neighbor composite)
  hsv          augmentation {hue: .1, saturation: 1.5, exposure: 1.5} (Darknet HSV)
  ema          ema {decay: 0.999} — mAP evaluated on the EMA shadow weights
  multi_scale  {sizes: [<=image_size...], mode: cycle} — device-side
               downscales of the staged corpus (the stream feed is
               tunnel-bound in this env, so scales stay <= image_size)
  sgd          optimizer {sgd, momentum .9, nesterov} — Darknet's actual
               regime vs the reference's Adam (same cosine LR)

Writes <out_root>/augment_ab.json with one mAP@0.5 row per variant.

Usage (real TPU chip, ~5 min/variant):
  python tools/augment_ab.py [--epochs 300] [--eval_only]
CPU smoke: --n_train 64 --n_val 16 --image_size 96 --epochs 2 --batch_size 8
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def variants(scales):
    return [
        ("plain", [], None),
        ("mosaic", ["--augment", '{"mosaic": 0.5}'], None),
        ("hsv", ["--augment",
                 '{"hue": 0.1, "saturation": 1.5, "exposure": 1.5}'], None),
        ("ema", ["--extra", '{"ema": {"decay": 0.999}}'], "ema"),
        ("multi_scale", ["--extra", json.dumps({"multi_scale": {
                             "sizes": scales, "mode": "cycle"}})], None),
        ("sgd", ["--extra", '{"optimizer": {"type": "sgd", "momentum": 0.9,'
                            ' "nesterov": true}}'], None),
        # do the wins compose? mosaic+HSV+EMA together (the typical
        # "turn everything on" recipe a user would reach for)
        ("all", ["--augment",
                 '{"mosaic": 0.5, "hue": 0.1, "saturation": 1.5,'
                 ' "exposure": 1.5}',
                 "--extra", '{"ema": {"decay": 0.999}}'], "ema"),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov3_tiny")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--n_train", type=int, default=512)
    ap.add_argument("--n_val", type=int, default=256)
    ap.add_argument("--image_size", type=int, default=416)
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--out_root", default="output/augment_ab")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant subset")
    ap.add_argument("--eval_only", action="store_true")
    args = ap.parse_args()
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

    data_root = args.data_root or f"output/shapes_ab{args.image_size}"
    stride = 32
    scales = sorted({max(stride * 3, args.image_size - 96),
                     max(stride * 3, args.image_size - 64), args.image_size})
    only = set(args.only.split(",")) if args.only else None

    from tools.train_convergence import evaluate_map50

    model_config = f"config/models/{args.model}/model.yaml"
    rows = {}
    for name, extra_args, eval_sibling in variants(scales):
        if only and name not in only:
            continue
        out_dir = os.path.join(args.out_root, name)
        ckpt = os.path.join(out_dir, f"{args.model}.tf")
        # resume support: a variant whose training completed (checkpoint +
        # result.json both present) is not retrained — a wedged-TPU-tunnel
        # abort mid-sweep (observed 2026-08-21) then costs only the
        # unfinished variants on rerun. A stale completed run from a
        # DIFFERENT regime (other --epochs/--n_train/...) must retrain,
        # not silently mix into the comparison table (ADVICE r4 #3):
        # the saved result.json's regime fields are compared first.
        result_path = os.path.join(out_dir, "result.json")
        done = os.path.exists(ckpt + ".npz") and os.path.exists(result_path)
        if done:
            prev = json.load(open(result_path))
            regime = {"epochs": args.epochs, "batch_size": args.batch_size,
                      "n_train": args.n_train, "n_val": args.n_val,
                      "image_size": args.image_size, "data_root": data_root}
            stale = {k: (prev.get(k), v) for k, v in regime.items()
                     if prev.get(k) != v}
            if stale:
                print(f":: {name}: stale checkpoint from a different regime "
                      f"{stale} — retraining", flush=True)
                done = False
        if not args.eval_only and not done:
            cmd = [sys.executable, "tools/train_convergence.py",
                   "--model", args.model, "--epochs", str(args.epochs),
                   "--batch_size", str(args.batch_size),
                   "--n_train", str(args.n_train),
                   "--n_val", str(args.n_val),
                   "--image_size", str(args.image_size),
                   "--data_root", data_root, "--out_dir", out_dir,
                   "--skip_eval"] + extra_args
            print("::", " ".join(cmd), flush=True)
            subprocess.run(cmd, check=True)
        eval_ckpt = ckpt + ".ema" if eval_sibling == "ema" else ckpt
        r = evaluate_map50(model_config, eval_ckpt, data_root,
                           args.image_size)
        run_meta = {}
        if os.path.exists(result_path):
            full = json.load(open(result_path))
            run_meta = {"wall_seconds": full.get("wall_seconds"),
                        "final_val_loss":
                            full.get("val_loss", {}).get(str(args.epochs))
                            or full.get("val_loss", {}).get(args.epochs)}
        rows[name] = dict(map50=round(r["map50"], 4), **run_meta)
        print(json.dumps({"variant": name, **rows[name]}), flush=True)

    if "plain" in rows:
        base = rows["plain"]["map50"]
        for name in rows:
            rows[name]["delta_vs_plain"] = round(rows[name]["map50"] - base, 4)
    out = {"model": args.model, "image_size": args.image_size,
           "epochs": args.epochs, "batch_size": args.batch_size,
           "n_train": args.n_train, "n_val": args.n_val,
           "data_root": data_root, "rows": rows}
    os.makedirs(args.out_root, exist_ok=True)
    with open(os.path.join(args.out_root, "augment_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
