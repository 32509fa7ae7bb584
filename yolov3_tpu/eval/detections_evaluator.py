"""Detection evaluation: per-class tp/fp/fn counters + AP@0.5.

Counter semantics parity with reference evaluate_detections.py:
  * per-pred best gt = argmax IoU (calc_iou :124-135);
  * a detection counts as TP iff IoU > thresh ∧ class match ∧ the selected
    gt was not already assigned *at decision time* — the reference computes
    decisions vectorized against the initial all-False assignment mask
    (:104-109), so several preds matching one gt in the same image all
    count TP; replicated here (documented quirk);
  * fn = gts never assigned (:66-67); per-class scatter-add counters
    (:56-80); negative gt class ids ⇒ the sample only bumps 'errors'
    (:64-72);
  * per-image delta histograms for preds/gts/tp/fp/fn (the reference's
    first-iteration branch has copy-paste bugs, :158-163 — fixed here).

TPU-native design: the per-image matcher is a fixed-shape jnp function
(padded preds from NMS, padded gts masked by obj), vmapped over the batch
and jitted; counters come back as dense (nclasses,) vectors.

Extension beyond the reference: ``average_precision_50`` computes true
per-class AP@0.5 / mAP@0.5 (score-ranked greedy matching, VOC-style
precision envelope) — the reference only reports recall/precision at fixed
NMS thresholds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_iou(a, b):
    """a: (P,4), b: (G,4) xyxy → (P,G).

    Deliberately NOT shared with ops/nms.py's IoU: this one pins the
    reference evaluator's math (evaluate_detections.py:38-48 — no
    negative-extent clamping on areas), which the parity tests depend on."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _image_counters(pred_boxes, pred_classes, pred_valid,
                    gt_boxes, gt_classes, gt_valid, nclasses: int, iou_thresh):
    """Fixed-shape single-image counters; all args padded."""
    iou = _pairwise_iou(pred_boxes, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)  # never select padded gts
    best_gt = jnp.argmax(iou, axis=-1)
    max_iou = jnp.max(iou, axis=-1)

    sel_class = gt_classes[best_gt]
    decisions = pred_valid & (max_iou > iou_thresh) & (sel_class == pred_classes)

    assigned = jnp.zeros(gt_boxes.shape[0], jnp.int32).at[best_gt].add(
        decisions.astype(jnp.int32)
    ) > 0
    assigned = assigned & gt_valid

    error = jnp.any(gt_valid & (gt_classes < 0))

    pc = jnp.clip(pred_classes, 0, nclasses - 1)
    gc = jnp.clip(gt_classes, 0, nclasses - 1)

    def count(idx, mask):
        return jnp.zeros(nclasses, jnp.int32).at[idx].add(mask.astype(jnp.int32))

    counters = {
        "tp": count(pc, decisions),
        "fp": count(pc, pred_valid & ~decisions),
        "fn": count(gc, gt_valid & ~assigned),
        "gts": count(gc, gt_valid),
        "preds": count(pc, pred_valid),
    }
    # error sample: only 'errors' increments (reference :64-72 early return)
    counters = {k: jnp.where(error, 0, v) for k, v in counters.items()}
    counters["errors"] = error.astype(jnp.int32)
    counters["examples"] = 1 - error.astype(jnp.int32)
    return counters


@partial(jax.jit, static_argnames=("nclasses",))
def evaluate_image_counters(pred_boxes, pred_classes, pred_valid,
                            gt_boxes, gt_classes, gt_valid, nclasses, iou_thresh):
    """Batched counters: args have a leading batch dim; returns per-image
    counters stacked (B, nclasses) / (B,)."""
    return jax.vmap(
        lambda pb, pc, pv, gb, gc, gv: _image_counters(
            pb, pc, pv, gb, gc, gv, nclasses, iou_thresh
        )
    )(pred_boxes, pred_classes, pred_valid, gt_boxes, gt_classes, gt_valid)


class EvaluateDetections:
    """Accumulating evaluator with the reference's surface: per-class
    counters dict + per-image histograms."""

    def __init__(self, nclasses: int, iou_thresh: float = 0.5):
        self.nclasses = nclasses
        self.iou_thresh = iou_thresh
        zeros = np.zeros(nclasses, np.int64)
        self.counters = {
            "preds": zeros.copy(), "gts": zeros.copy(),
            "tp": zeros.copy(), "fp": zeros.copy(), "fn": zeros.copy(),
            "errors": 0, "examples": 0,
        }
        self.preds_histo, self.gt_histo = [], []
        self.tp_histo, self.fp_histo, self.fn_histo = [], [], []

    def evaluate_batch(self, pred_boxes, pred_classes, pred_valid,
                       gt_boxes, gt_classes, gt_valid):
        out = evaluate_image_counters(
            jnp.asarray(pred_boxes, jnp.float32),
            jnp.asarray(pred_classes, jnp.int32),
            jnp.asarray(pred_valid, bool),
            jnp.asarray(gt_boxes, jnp.float32),
            jnp.asarray(gt_classes, jnp.int32),
            jnp.asarray(gt_valid, bool),
            self.nclasses,
            jnp.float32(self.iou_thresh),
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        nimg = out["tp"].shape[0]
        for i in range(nimg):
            self.preds_histo.append(out["preds"][i])
            self.gt_histo.append(out["gts"][i])
            self.tp_histo.append(out["tp"][i])
            self.fp_histo.append(out["fp"][i])
            self.fn_histo.append(out["fn"][i])
        for key in ("preds", "gts", "tp", "fp", "fn"):
            self.counters[key] = self.counters[key] + out[key].sum(axis=0)
        self.counters["errors"] += int(out["errors"].sum())
        self.counters["examples"] += int(out["examples"].sum())
        return self.counters

    def recall_precision(self):
        tp = self.counters["tp"].astype(np.float64)
        recall = tp / (tp + self.counters["fn"] + 1e-20)
        precision = tp / (tp + self.counters["fp"] + 1e-20)
        return recall, precision


# ---------------------------------------------------------------------------
# mAP@0.5 (extension)
# ---------------------------------------------------------------------------


class APAccumulator:
    """Collects score-ranked detections over a dataset, computes AP@0.5."""

    def __init__(self, nclasses: int, iou_thresh: float = 0.5):
        self.nclasses = nclasses
        self.iou_thresh = iou_thresh
        self.records = [[] for _ in range(nclasses)]  # (score, is_tp)
        self.n_gt = np.zeros(nclasses, np.int64)

    def add_image(self, pred_boxes, pred_classes, pred_scores, gt_boxes, gt_classes):
        """Standard greedy matching by descending score, per class."""
        pred_boxes = np.asarray(pred_boxes, np.float64)
        gt_boxes = np.asarray(gt_boxes, np.float64)
        pred_classes = np.asarray(pred_classes, np.int64)
        gt_classes = np.asarray(gt_classes, np.int64)
        pred_scores = np.asarray(pred_scores, np.float64)
        for c in np.unique(gt_classes):
            if 0 <= c < self.nclasses:
                self.n_gt[c] += int((gt_classes == c).sum())
        order = np.argsort(-pred_scores)
        taken = np.zeros(len(gt_boxes), bool)
        for i in order:
            c = pred_classes[i]
            if not (0 <= c < self.nclasses):
                continue
            cand = np.where((gt_classes == c) & ~taken)[0]
            is_tp = False
            if len(cand):
                ious = _np_iou_one(pred_boxes[i], gt_boxes[cand])
                j = int(np.argmax(ious))
                if ious[j] > self.iou_thresh:
                    taken[cand[j]] = True
                    is_tp = True
            self.records[c].append((pred_scores[i], is_tp))

    def compute(self):
        aps = np.full(self.nclasses, np.nan)
        for c in range(self.nclasses):
            if self.n_gt[c] == 0:
                continue
            recs = sorted(self.records[c], key=lambda r: -r[0])
            tps = np.array([r[1] for r in recs], np.float64)
            if len(tps) == 0:
                aps[c] = 0.0
                continue
            tp_cum = np.cumsum(tps)
            fp_cum = np.cumsum(1.0 - tps)
            recall = tp_cum / self.n_gt[c]
            precision = tp_cum / (tp_cum + fp_cum)
            # precision envelope + integrate (continuous VOC-style)
            mrec = np.concatenate([[0.0], recall, [recall[-1]]])
            mpre = np.concatenate([[1.0], precision, [0.0]])
            for i in range(len(mpre) - 2, -1, -1):
                mpre[i] = max(mpre[i], mpre[i + 1])
            idx = np.where(mrec[1:] != mrec[:-1])[0]
            aps[c] = float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))
        mean_ap = float(np.nanmean(aps)) if np.any(~np.isnan(aps)) else 0.0
        return aps, mean_ap


def _np_iou_one(box, boxes):
    lt = np.maximum(box[:2], boxes[:, :2])
    rb = np.minimum(box[2:], boxes[:, 2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area = (box[2] - box[0]) * (box[3] - box[1])
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = area + areas - inter
    return np.where(union > 0, inter / union, 0.0)


def average_precision_50(acc: APAccumulator):
    return acc.compute()


class CocoAPAccumulator:
    """COCO-style AP@[.5:.95] — ten IoU thresholds, averaged (extension;
    the reference computes no AP at all)."""

    def __init__(self, nclasses: int):
        self.thresholds = [0.5 + 0.05 * i for i in range(10)]
        self.accs = [APAccumulator(nclasses, t) for t in self.thresholds]

    def add_image(self, pred_boxes, pred_classes, pred_scores, gt_boxes, gt_classes):
        for acc in self.accs:
            acc.add_image(pred_boxes, pred_classes, pred_scores, gt_boxes, gt_classes)

    def compute(self):
        """Returns (ap_per_class (nclasses,), mAP@[.5:.95], mAP@0.5)."""
        per_thr = [acc.compute() for acc in self.accs]
        aps = np.nanmean(np.stack([aps for aps, _ in per_thr]), axis=0)
        map5095 = float(np.nanmean([m for _, m in per_thr]))
        return aps, map5095, per_thr[0][1]
