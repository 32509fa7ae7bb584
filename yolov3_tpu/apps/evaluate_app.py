"""Evaluation application — the reference evaluate_yolov3.py capability,
rebuilt working (the reference file has bit-rotted imports and cannot run
as-is — SURVEY §2).

Reads evaluate_config.yaml (nms score-threshold sweep) + detect_config.yaml
(model/dataset/NMS params). For each threshold: batched prediction, padded
ragged-free matching, per-class recall/precision, per-image histograms
saved as .npy (tp_<thr>.npy etc.), plus an overall 'oneclass' run with
classes zeroed (bbox-only quality).

TPU-native: the score/IoU thresholds are *traced scalars*, so the whole
sweep reuses ONE compiled forward+decode+NMS program (the reference
rebuilds the Keras model per threshold, evaluate_yolov3.py:181-186).
Extension: reports true mAP@0.5 (APAccumulator), which the reference lacks.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_anchors, read_class_names
from ..data.tfrecord import parse_tfrecords
from ..eval.detections_evaluator import APAccumulator, EvaluateDetections
from ..io.resolve import load_weights
from ..models import parse_model_config, init_model, apply_model, fold_batch_norm
from ..ops.decode import yolo_decode
from ..ops.nms import (DEFAULT_NUM_CANDIDATES, next_escalation_k,
                       nms_inexact_mask, yolo_nms)

log = logging.getLogger(__name__)


def make_sweepable_predictor(spec, params, bn_state, anchors_table, nclasses,
                             yolo_max_boxes, mesh=None, nms_per_class=False):
    """``mesh``: batch-sharded DP evaluation over all chips — the sweep
    thresholds are scalar kernel args (replicated), images shard on the
    data axis, and the whole predict is per-image independent SPMD. A 2-D
    (data × spatial) mesh additionally shards image height (GSPMD conv
    spatial partitioning with halo exchanges — mesh.py).
    ``nms_per_class``: evaluate with per-class suppression (extension;
    the reference — and the default — is class-agnostic)."""
    run_params = fold_batch_norm(params, bn_state)
    anchors = jnp.asarray(anchors_table, jnp.float32)

    from functools import partial

    @partial(jax.jit, static_argnames=("num_candidates",))
    def predict(images, iou_threshold, score_threshold,
                num_candidates=DEFAULT_NUM_CANDIDATES):
        outputs, _ = apply_model(spec, run_params, {}, images, train=False)
        boxes, conf, probs = yolo_decode(outputs, anchors, nclasses)
        return yolo_nms(boxes, conf, probs, max_boxes=yolo_max_boxes,
                        iou_threshold=iou_threshold, score_threshold=score_threshold,
                        num_candidates=num_candidates, per_class=nms_per_class)

    if mesh is None:
        return predict
    from ..parallel.mesh import image_sharding

    data = image_sharding(mesh)

    def sharded_predict(images, iou_threshold, score_threshold,
                        num_candidates=DEFAULT_NUM_CANDIDATES):
        # committing the batch to the mesh makes jit compile the whole
        # sweep SPMD (sharding propagates; thresholds replicate as scalars)
        return predict(jax.device_put(jnp.asarray(images), data),
                       iou_threshold, score_threshold,
                       num_candidates=num_candidates)

    return sharded_predict


def _selected_to_padded(bboxes, class_idx, scores, selected, num_valid, max_boxes):
    """NMS outputs → fixed (max_boxes,) padded preds + valid mask, batched."""
    b = bboxes.shape[0]
    pred_boxes = np.take_along_axis(bboxes, selected[..., None], axis=1)
    pred_classes = np.take_along_axis(class_idx, selected, axis=1)
    pred_scores = np.take_along_axis(scores, selected, axis=1)
    valid = np.arange(max_boxes)[None, :] < num_valid[:, None]
    return pred_boxes, pred_classes, pred_scores, valid


def evaluate(evaluate_config: dict, detect_config: dict, max_eval_images=None,
             evaluate_iou_threshold: float = 0.5, compute_map: bool = True,
             coco_map: bool = False):
    thresholds = evaluate_config["evaluate_nms_score_thresholds"]
    # COCO interchange export (pycocotools interop) for the lowest sweep
    # threshold — max recall, the right input for external re-scoring
    # which sweeps score cutoffs itself (eval/coco_export.py)
    coco_export_dir = evaluate_config.get("coco_export_dir")
    export_threshold = min(thresholds) if coco_export_dir else None

    from ..utils.compile_cache import enable_from_env_or_config

    enable_from_env_or_config(detect_config.get("compilation_cache"))
    anchors_table = get_anchors(detect_config["anchors_file"])
    class_names = read_class_names(detect_config["classes_name_file"])
    nclasses = len(class_names)
    image_size = detect_config["image_size"]
    batch_size = detect_config["batch_size"]
    yolo_max_boxes = detect_config["yolo_max_boxes"]
    nms_iou_threshold = detect_config["nms_iou_threshold"]

    spec = parse_model_config(detect_config["model_config_file"], nclasses)
    params, bn_state = init_model(jax.random.PRNGKey(0), spec)
    params, bn_state = load_weights(spec, params, bn_state, detect_config["input_weights_path"])

    mesh = None
    spatial = int(detect_config.get("spatial_partitioning") or 1)
    if detect_config.get("data_parallel") or spatial > 1:
        from ..parallel.mesh import make_data_parallel_mesh

        mesh = make_data_parallel_mesh(batch_size, spatial=spatial)

    predict = make_sweepable_predictor(
        spec, params, bn_state, anchors_table, nclasses, yolo_max_boxes,
        mesh=mesh, nms_per_class=bool(detect_config.get("nms_per_class")))

    # dataset: tfrecords, gt kept padded + masked (fixed shapes). The
    # reference letterboxes here (inference.py:119-123) — but its tfrecord
    # parser has already squash-resized to a square (load_tfrecords.py:44),
    # making the letterbox the identity; ours decodes square too, so the
    # geometry is reference-exact without a redundant resample.
    def batches():
        images, labels = [], []
        count = 0
        for img, lab in parse_tfrecords(detect_config["tfrecords_dir"], image_size,
                                        yolo_max_boxes, detect_config["classes_name_file"]):
            images.append(img)
            labels.append(lab)
            count += 1
            if len(images) == batch_size:
                yield np.stack(images), np.stack(labels), batch_size
                images, labels = [], []
            if max_eval_images and count >= max_eval_images:
                break
        if images:
            pad = batch_size - len(images)
            yield (
                np.stack(images + [np.zeros_like(images[0])] * pad),
                np.stack(labels + [np.zeros_like(labels[0])] * pad),
                len(images),
            )

    results = []
    for score_threshold in thresholds:
        evaluator = EvaluateDetections(nclasses, evaluate_iou_threshold)
        evaluator_oneclass = EvaluateDetections(nclasses, evaluate_iou_threshold)
        ap_acc = None
        if coco_map:
            from ..eval.detections_evaluator import CocoAPAccumulator

            ap_acc = CocoAPAccumulator(nclasses)
        elif compute_map:
            ap_acc = APAccumulator(nclasses, evaluate_iou_threshold)
        exporter = None
        if score_threshold == export_threshold:
            from ..eval.coco_export import CocoExporter

            exporter = CocoExporter(class_names, image_size)

        # exact-K policy: start at the default K and escalate whenever the
        # top-K truncation could have diverged from TF's full NMS — makes
        # the low-threshold sweep entries (0.004) exact, not approximate.
        # K is sticky across batches within a threshold (escalation is
        # monotone in practice: a threshold that trips it on one batch trips
        # it on nearly all), so later batches skip the discarded low-K pass.
        k = DEFAULT_NUM_CANDIDATES
        t_thresh, n_eval_images = time.time(), 0
        for images, labels, n_real in batches():
            n_eval_images += n_real
            out = predict(jnp.asarray(images), jnp.float32(nms_iou_threshold),
                          jnp.float32(score_threshold), num_candidates=k)
            n_cand = out[2].shape[1]
            while k < n_cand and nms_inexact_mask(
                out[2], out[4], yolo_max_boxes, score_threshold, k
            ).any():
                k = next_escalation_k(k, n_cand)
                log.info(f"NMS top-K escalation to K={k} at score_threshold="
                         f"{score_threshold} (exactness guarantee)")
                out = predict(jnp.asarray(images), jnp.float32(nms_iou_threshold),
                              jnp.float32(score_threshold), num_candidates=k)
            bboxes, class_idx, scores, selected, num_valid = map(np.asarray, out)
            pb, pc, ps, pv = _selected_to_padded(
                bboxes, class_idx, scores, selected, num_valid, yolo_max_boxes
            )
            gt_boxes = labels[..., 0:4]
            gt_classes = labels[..., 5].astype(np.int32)
            gt_valid = labels[..., 4] != 0
            # drop the zero-padded tail images by COUNT (inferring realness
            # from gt/preds would count a padding image as real whenever the
            # net hallucinates a detection on a blank input — inflating FPs
            # at low sweep thresholds)
            real = np.arange(len(images)) < n_real
            evaluator.evaluate_batch(pb[real], pc[real], pv[real],
                                     gt_boxes[real], gt_classes[real], gt_valid[real])
            evaluator_oneclass.evaluate_batch(
                pb[real], np.zeros_like(pc[real]), pv[real],
                gt_boxes[real], np.zeros_like(gt_classes[real]), gt_valid[real],
            )
            if ap_acc is not None:
                for i in np.where(real)[0]:
                    ap_acc.add_image(pb[i][pv[i]], pc[i][pv[i]], ps[i][pv[i]],
                                     gt_boxes[i][gt_valid[i]], gt_classes[i][gt_valid[i]])
            if exporter is not None:
                for i in np.where(real)[0]:
                    exporter.add_image(pb[i][pv[i]], pc[i][pv[i]], ps[i][pv[i]],
                                       gt_boxes[i][gt_valid[i]],
                                       gt_classes[i][gt_valid[i]])

        # wall throughput of the pass (prediction + matching; first
        # threshold includes compile) — the benchmarks/README promise that
        # eval artifacts record img/s alongside mAP (VERDICT r4 item 6)
        wall_s = time.time() - t_thresh
        recall, precision = evaluator.recall_precision()
        print("Results Bbox and Classes:")
        for k, v in evaluator.counters.items():
            print(f" {k}: {v}", end="")
        print("\nResults Bbox Only (Single Class):")
        for k, v in evaluator_oneclass.counters.items():
            print(f" {k}: {v}", end="")
        print(f"\nrecall: {recall}, precision: {precision}")
        entry = {"score_threshold": score_threshold, "recall": recall, "precision": precision,
                 "wall_seconds": round(wall_s, 2),
                 "images_per_sec": round(n_eval_images / wall_s, 2) if wall_s else None,
                 "counters": {k: np.asarray(v).tolist()
                              for k, v in evaluator.counters.items()},
                 "counters_oneclass": {k: np.asarray(v).tolist()
                                       for k, v in evaluator_oneclass.counters.items()}}
        if ap_acc is not None:
            if coco_map:
                aps, map5095, map50 = ap_acc.compute()
                print(f"mAP@[.5:.95]: {map5095:.4f}  mAP@0.5: {map50:.4f}")
                entry["ap_per_class"] = aps
                entry["map50"] = map50
                entry["map50_95"] = map5095
            else:
                aps, mean_ap = ap_acc.compute()
                print(f"mAP@0.5: {mean_ap:.4f}")
                entry["ap_per_class"] = aps
                entry["map50"] = mean_ap
            for name, ap in zip(class_names, aps):
                if not np.isnan(ap):
                    print(f"  AP[{name}]: {ap:.4f}")
        results.append(entry)

        if exporter is not None:
            det_path, gt_path = exporter.write(coco_export_dir)
            print(f"COCO export ({len(exporter.images)} images, "
                  f"score_threshold {score_threshold}): {det_path}, {gt_path}")

        np.save(f"preds_{score_threshold}", np.stack(evaluator.preds_histo))
        np.save(f"gts_{score_threshold}", np.stack(evaluator.gt_histo))
        np.save(f"tp_{score_threshold}", np.stack(evaluator.tp_histo))
        np.save(f"fp_{score_threshold}", np.stack(evaluator.fp_histo))
        np.save(f"fn_{score_threshold}", np.stack(evaluator.fn_histo))

    print([(r["recall"], r["precision"]) for r in results])

    # machine-readable sweep summary (extension; the reference only prints
    # and dumps per-class .npy histograms — evaluate_yolov3.py:214-236)
    results_json = evaluate_config.get("results_json")
    if results_json:
        import json

        parent = os.path.dirname(results_json)
        if parent:
            os.makedirs(parent, exist_ok=True)

        def jsonable(v):
            if isinstance(v, np.ndarray):
                v = v.ravel().tolist()
            if isinstance(v, (list, tuple)):
                return [jsonable(x) for x in v]
            if isinstance(v, (np.floating, np.integer)):
                v = v.item()
            if isinstance(v, float) and np.isnan(v):
                return None  # NaN is not valid JSON
            return v

        payload = {
            "class_names": list(class_names),
            "evaluate_iou_threshold": float(evaluate_iou_threshold),
            "nms_iou_threshold": float(nms_iou_threshold),
            "sweep": [{k: jsonable(v) for k, v in r.items()} for r in results],
        }
        with open(results_json, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote evaluation summary to {results_json}")
    return results
