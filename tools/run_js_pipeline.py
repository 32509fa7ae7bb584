#!/usr/bin/env python
"""Run the browser port (js/src) on an image — executed in-env via jsvm.

Drives the REAL JavaScript sources (js/src/inference.js and its imports)
through the in-repo interpreter + numpy TFJS shim (yolov3_tpu/jsvm/), the
same way a browser would drive them — loadGraphModel on an exported TFJS
graph-model directory (utilities/convert_model_to_tfjs.py / recipe 9),
fromPixels → resizeBilinear → forward → decode → NMS → canvas render —
and prints the detections. With --compare it also runs the Python pipeline
(data/image.py resize, ops/decode.py, ops/nms.py) on the same image and
reports the per-detection deltas.

Example (after exporting a model to ./tfjs_model):
    python tools/run_js_pipeline.py --model_dir tfjs_model \
        --image datasets/coco2012/images/girl.png \
        --classes datasets/coco2012/coco.names --compare

Reference behavior: /root/reference/js/src (browser demo); ours executes
here, engine or not. See tests/test_js_execution.py for the pinned parity.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model_dir", required=True,
                    help="TFJS graph-model directory (model.json + shards), "
                         "e.g. the output of utilities/convert_model_to_tfjs.py")
    ap.add_argument("--image",
                    default=os.path.join(REPO, "datasets/coco2012/images/girl.png"))
    ap.add_argument("--classes",
                    default=os.path.join(REPO, "datasets/coco2012/coco.names"))
    ap.add_argument("--anchors", default=None,
                    help="anchors CSV (normalized, 13-grid first); default: "
                         "the port's built-in COCO table")
    ap.add_argument("--max_boxes", type=int, default=100)
    ap.add_argument("--iou_threshold", type=float, default=0.5)
    ap.add_argument("--score_threshold", type=float, default=0.1)
    ap.add_argument("--compare", action="store_true",
                    help="also run the Python pipeline and report deltas")
    ap.add_argument("--json_out", default=None,
                    help="write detections + draw calls to this JSON file")
    args = ap.parse_args(argv)

    from yolov3_tpu.data.image import decode_image
    from yolov3_tpu.jsvm import (GraphModelHost, Interpreter, JsImage,
                                 RecordingCanvas, TfShim)

    with open(args.image, "rb") as f:
        img_np = decode_image(f.read())
    with open(args.classes) as f:
        class_names = [ln.strip() for ln in f if ln.strip()]

    shim = TfShim(model_loader=GraphModelHost)
    interp = Interpreter({"tf": shim})
    mod = interp.load_module(os.path.join(REPO, "js", "src", "inference.js"))

    overlay = RecordingCanvas()
    request = {
        "modelUrl": args.model_dir,
        "image": JsImage(img_np),
        "overlay": overlay,
        "classNames": class_names,
        "maxBoxes": float(args.max_boxes),
        "iouThreshold": args.iou_threshold,
        "scoreThreshold": args.score_threshold,
    }
    if args.anchors:
        table = np.loadtxt(args.anchors, delimiter=",", dtype=np.float32)
        request["anchors"] = table.reshape(-1, 3, 2).tolist()

    dets = interp.call(mod["runInference"], request)
    leaked = shim.num_live()

    print(f"js pipeline: {len(dets)} detections "
          f"({len(overlay.ctx.calls)} canvas draw calls, "
          f"{leaked} leaked tensors)")
    for d in dets:
        x0, y0, x1, y1 = d["box"]
        print(f"  {d['className']:<16} {d['score']:.4f} "
              f"[{x0:.4f}, {y0:.4f}, {x1:.4f}, {y1:.4f}]")
    if leaked:
        print("ERROR: browser port leaked tensors", file=sys.stderr)
        return 1

    if args.compare:
        deltas = _compare_python(args, img_np, class_names, dets)
        print(f"python pipeline: {deltas['n_python']} detections; "
              f"max |box delta| {deltas['box_delta']:.2e}, "
              f"max |score delta| {deltas['score_delta']:.2e}, "
              f"classes {'match' if deltas['classes_match'] else 'DIFFER'}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"detections": dets, "draw_calls": overlay.ctx.calls},
                      f, indent=2)
        print(f"wrote {args.json_out}")
    return 0


def _compare_python(args, img_np, class_names, js_dets):
    import jax.numpy as jnp

    from yolov3_tpu.data.image import resize_bilinear
    from yolov3_tpu.export.tfjs_graph import run_graph_model
    from yolov3_tpu.ops import nms as pnms
    from yolov3_tpu.ops.decode import yolo_decode

    size = 416  # js/src/inference.js IMAGE_SIZE
    x = resize_bilinear(img_np.astype(np.float32), size, size)[None] / 255.0
    outs = run_graph_model(args.model_dir, x.astype(np.float32))
    if args.anchors:
        table = np.loadtxt(args.anchors, delimiter=",", dtype=np.float32)
    else:
        table = np.loadtxt(os.path.join(REPO, "datasets/coco2012/anchors.txt"),
                           delimiter=",", dtype=np.float32)
    anchors = table.reshape(-1, 3, 2)[: len(outs)]
    pb, pc, pp = yolo_decode([jnp.asarray(o) for o in outs], anchors,
                             len(class_names))
    bb, ci, sc, sel, nv = pnms.yolo_nms_exact(
        pb, pc, pp, max_boxes=args.max_boxes,
        iou_threshold=args.iou_threshold, score_threshold=args.score_threshold)
    gb, gc, gs, _ = pnms.gather_detections(bb, ci, sc, sel, nv)
    n = int(nv[0])
    py_boxes = np.asarray(gb)[0, :n]
    py_scores = np.asarray(gs)[0, :n]
    py_classes = np.asarray(gc)[0, :n]

    m = min(n, len(js_dets))
    js_boxes = np.array([d["box"] for d in js_dets[:m]], np.float32)
    js_scores = np.array([d["score"] for d in js_dets[:m]], np.float32)
    js_names = [d["className"] for d in js_dets[:m]]
    return {
        "n_python": n,
        "box_delta": float(np.abs(js_boxes - py_boxes[:m]).max()) if m else 0.0,
        "score_delta": float(np.abs(js_scores - py_scores[:m]).max()) if m else 0.0,
        "classes_match": js_names == [class_names[c] for c in py_classes[:m]]
        and n == len(js_dets),
    }


if __name__ == "__main__":
    sys.exit(main())
