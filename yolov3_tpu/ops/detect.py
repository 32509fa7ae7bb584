"""Fused detection path: heads → compact detections, minimal math.

Semantically identical to yolo_decode ∘ yolo_nms ∘ gather_detections but
restructured for the serving fast path:

  * score = sigmoid(obj) · sigmoid(max class logit) — sigmoid is monotonic,
    so the max over class *logits* gives the same best class / best prob
    without a sigmoid over the full (B, N, nc) tensor;
  * box decode (cell offsets, exp(wh)·anchors) runs only for the top-K NMS
    candidates instead of all N anchors;
  * suppression + compaction as in ops/nms.py.

Exactness: identical outputs whenever fewer than K candidates beat the
score threshold (same caveat as yolo_nms's top-K).

Measured (v5e, B=128): parity with the classic decode∘nms∘gather pipeline
(70.5 vs 71.2 ms/batch) — XLA already fuses the bulk transcendentals, so
this exists as an equivalent alternative surface / cross-check, not a
speedup.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .nms import _pairwise_iou, _scan_sweep, _compact


def _flatten_head_fields(outputs, anchors_table):
    """Per-scale → flattened (B, N, …) logits + per-anchor geometry tables."""
    xy_l, wh_l, obj_l, cls_l = [], [], [], []
    offsets_all, scales_all, anchors_all = [], [], []
    for grid_out, anchors in zip(outputs, anchors_table):
        b, gh, gw, na, _ = grid_out.shape
        g = grid_out.astype(jnp.float32).reshape(b, gh * gw * na, -1)
        xy_l.append(g[..., 0:2])
        wh_l.append(g[..., 2:4])
        obj_l.append(g[..., 4])
        cls_l.append(g[..., 5:])
        col = lax.broadcasted_iota(jnp.float32, (gh, gw, na), 1)
        row = lax.broadcasted_iota(jnp.float32, (gh, gw, na), 0)
        offsets_all.append(jnp.stack([col, row], -1).reshape(-1, 2))
        scales_all.append(jnp.full((gh * gw * na, 2), jnp.asarray([gw, gh], jnp.float32)))
        anchors_all.append(jnp.broadcast_to(anchors, (gh * gw, na, 2)).reshape(-1, 2))
    cat = lambda xs, ax=1: jnp.concatenate(xs, axis=ax)
    return (
        cat(xy_l), cat(wh_l), cat(obj_l), cat(cls_l),
        jnp.concatenate(offsets_all, 0),
        jnp.concatenate(scales_all, 0),
        jnp.concatenate(anchors_all, 0),
    )


@partial(jax.jit, static_argnames=("nclasses", "max_boxes", "num_candidates"))
def detect(outputs, anchors_table, nclasses: int, max_boxes: int = 100,
           iou_threshold: float = 0.5, score_threshold: float = 0.25,
           num_candidates: int = 256):
    """Raw head outputs → (boxes (B,max_boxes,4) xyxy, classes, scores, valid)."""
    anchors_table = jnp.asarray(anchors_table, jnp.float32)
    xy_l, wh_l, obj_l, cls_l, offsets, grid_dims, anchors = _flatten_head_fields(
        outputs, anchors_table
    )

    best_cls_logit = jnp.max(cls_l, axis=-1)
    classes = jnp.argmax(cls_l, axis=-1)
    scores = jax.nn.sigmoid(obj_l) * jax.nn.sigmoid(best_cls_logit)

    k = min(num_candidates, scores.shape[1])

    def one(xy, wh, sc, cls):
        order = jnp.argsort(-sc, stable=True)[:k]
        cand_scores = sc[order]
        # decode boxes for candidates only
        center = (jax.nn.sigmoid(xy[order]) + offsets[order]) / grid_dims[order]
        size = jnp.exp(wh[order]) * anchors[order]
        boxes = jnp.concatenate([center - size / 2, center + size / 2], axis=-1)
        valid = cand_scores > score_threshold
        suppress = _pairwise_iou(boxes) > iou_threshold
        keep = _scan_sweep(suppress, valid)
        sel_local, nvalid = _compact(jnp.arange(k), keep, max_boxes)
        det_boxes = boxes[sel_local]
        det_scores = cand_scores[sel_local]
        det_classes = cls[order][sel_local]
        vmask = jnp.arange(max_boxes) < nvalid
        return det_boxes, det_classes, det_scores, vmask

    return jax.vmap(one)(xy_l, wh_l, scores, classes)
