#!/usr/bin/env python
"""Extract a small standalone Oxford-Pets subset (datasets/pets_mini/).

The bundled `config/train_config_pets.yaml` (BASELINE configs[2]: transfer
learning on the Oxford Pets by-breed COCO export) must work without the
external corpus, so this tool carves a deterministic mini subset — N images
per split, breadth-first across categories, JPEG-recompressed smaller —
from a full export (pass its root, e.g. the reference fixture mount or a
Roboflow download) and writes repo-local `train/` + `valid/` dirs in the
same COCO layout (`_annotations.coco.json` beside the images).

Usage: python tools/make_pets_mini.py <pets_coco_root> [out_root] [n_train] [n_valid]
"""

from __future__ import annotations

import io
import json
import os
import sys


def subset_split(src_dir, out_dir, n_images, max_side=320, quality=82):
    from PIL import Image

    with open(os.path.join(src_dir, "_annotations.coco.json")) as f:
        coco = json.load(f)

    anns_by_img = {}
    for a in coco["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)

    # breadth-first over categories so the subset spans many breeds:
    # repeatedly take the next unseen image of each category in id order
    by_cat = {}
    for img in sorted(coco["images"], key=lambda i: i["file_name"]):
        for a in anns_by_img.get(img["id"], []):
            by_cat.setdefault(a["category_id"], []).append(img)
            break
    chosen, seen = [], set()
    while len(chosen) < n_images:
        progressed = False
        for cat in sorted(by_cat):
            if len(chosen) >= n_images:
                break
            while by_cat[cat]:
                img = by_cat[cat].pop(0)
                if img["id"] not in seen:
                    seen.add(img["id"])
                    chosen.append(img)
                    progressed = True
                    break
        if not progressed:
            break

    os.makedirs(out_dir, exist_ok=True)
    out = {"images": [], "annotations": [], "categories": coco["categories"]}
    for img in chosen:
        src = Image.open(os.path.join(src_dir, img["file_name"])).convert("RGB")
        w, h = src.size
        scale = min(1.0, max_side / max(w, h))
        nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
        resized = src.resize((nw, nh), Image.BILINEAR)
        buf = io.BytesIO()
        resized.save(buf, format="JPEG", quality=quality)
        with open(os.path.join(out_dir, img["file_name"]), "wb") as f:
            f.write(buf.getvalue())
        out["images"].append({"id": img["id"], "file_name": img["file_name"],
                              "width": nw, "height": nh})
        sx, sy = nw / w, nh / h
        for a in anns_by_img.get(img["id"], []):
            x, y, bw, bh = a["bbox"]
            out["annotations"].append({
                "id": a["id"], "image_id": img["id"],
                "category_id": a["category_id"],
                "bbox": [x * sx, y * sy, bw * sx, bh * sy],
                "area": bw * sx * bh * sy, "iscrowd": 0,
            })
    with open(os.path.join(out_dir, "_annotations.coco.json"), "w") as f:
        json.dump(out, f)
    print(f"{out_dir}: {len(out['images'])} images, {len(out['annotations'])} boxes")


def main(src_root, out_root="datasets/pets_mini", n_train=48, n_valid=16):
    subset_split(os.path.join(src_root, "train"), os.path.join(out_root, "train"),
                 int(n_train))
    subset_split(os.path.join(src_root, "valid"), os.path.join(out_root, "valid"),
                 int(n_valid))


if __name__ == "__main__":
    main(*sys.argv[1:])
