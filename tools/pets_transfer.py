#!/usr/bin/env python
"""Pets transfer-learning recipe (VERDICT r2 items 1+7, BASELINE configs[2]).

Drives the bundled `config/train_config_pets.yaml` end to end — frozen
Darknet-53 backbone, necks/heads train on the Oxford-Pets-style by-breed
COCO export (the bundled 48+16-image `datasets/pets_mini/` by default;
set PETS_DATA_ROOT for a full export) — then records the val-loss trend
and evaluates the checkpoint's mAP@0.5 under bf16 AND int8 serving on
the val split (the int8 accuracy gate widened to 38 real-photo classes).

The backbone source is a real TRAINED checkpoint: the shapes-converged
full YOLOv3 from tools/train_convergence.py (no real COCO weights exist
in this zero-egress env; the reference's flow with a converted COCO
checkpoint is the same code path — transfer_learning_config is untouched
except for the source path). Heads are re-initialized by the transfer
machinery since nclasses differs (3 -> 37).

Usage (real TPU chip, ~2 min):
  python tools/pets_transfer.py [--epochs 60]
      [--backbone_ckpt output/convergence/yolov3/yolov3.tf]
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--backbone_ckpt",
                    default="output/convergence/yolov3/yolov3.tf")
    ap.add_argument("--image_size", type=int, default=None,
                    help="override the config's 416 (CPU smoke)")
    ap.add_argument("--no_device_dataset", action="store_true",
                    help="stream batches from host instead of staging the "
                    "splits in HBM (uint8) — the staged path avoids the "
                    "per-step image upload, which dominates on the "
                    "tunneled chip (66 MB/step at B=32 416²)")
    ap.add_argument("--out_dir", default="output/pets_transfer")
    ap.add_argument("--eval_only", action="store_true")
    args = ap.parse_args()
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

    ckpt_exists = any(os.path.exists(args.backbone_ckpt + suf)
                      for suf in ("", ".npz", ".index"))
    if not args.eval_only and not ckpt_exists:
        ap.error(
            f"backbone checkpoint {args.backbone_ckpt!r} not found — run "
            "`python tools/train_convergence.py --model yolov3` first (it "
            "leaves the converged checkpoint at the default path), or pass "
            "--backbone_ckpt <path> to an existing full-yolov3 checkpoint")

    from tools.train_convergence import EpochCapture
    from yolov3_tpu.config import load_yaml

    os.makedirs(args.out_dir, exist_ok=True)
    cfg = load_yaml("config/train_config_pets.yaml")
    ckpt = os.path.join(args.out_dir, "yolov3_pets.tf")
    cfg.update(
        epochs=args.epochs, batch_size=args.batch_size,
        output_checkpoints_path=ckpt, early_stopping=False,
        weights_save_peroid=10 ** 9, resume=False,
        mixed_precision=True, compilation_cache=True,
        lr_schedule={"type": "cosine", "warmup_epochs": 2,
                     "min_lr_fraction": 0.05},
    )
    if not args.no_device_dataset:
        cfg["device_dataset"] = {"dtype": "uint8"}
    cfg["transfer_learning_config"]["input_weights_path"] = args.backbone_ckpt
    if args.image_size:
        cfg["image_size"] = args.image_size
    capture = EpochCapture()
    result = {"config": cfg}

    if not args.eval_only:
        from yolov3_tpu.apps.train_app import Train

        logging.getLogger("yolov3_tpu.apps.train_app").addHandler(capture)
        Train()(**cfg)
        result.update(train_loss=capture.series["train_loss"],
                      val_loss=capture.series["val_loss"])

    # mAP@0.5 + int8 gate on the val split (38 classes, real photos)
    from tools.int8_accuracy_gate import run_gate

    val = cfg["dataset_config"]["data_files"]["valid"]
    gate = run_gate(
        max_images=64, image_size=cfg["image_size"], score_threshold=0.05,
        model_config=cfg["model_config_file"], ckpt=ckpt,
        names=cfg["classes_name_file"], anchors_file=cfg["anchors_file"],
        val_images_dir=val["images_dir"], val_annotations=val["annotations"])
    result["int8_gate"] = gate
    with open(os.path.join(args.out_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"final_val_loss": result.get("val_loss", {}).get(args.epochs),
                      "map50_bf16": gate["map50_bf16"],
                      "map50_int8": gate["map50_int8"],
                      "gate_pass": gate["gate_pass"]}))


if __name__ == "__main__":
    main()
