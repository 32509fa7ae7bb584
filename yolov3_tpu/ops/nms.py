"""Fixed-shape, batched, class-agnostic NMS on device.

Reproduces the semantics of the reference's inference-graph NMS
(core/yolo_nms.py:15-34): best class = argmax of class probs, score =
objectness × max class prob, then a *class-agnostic* greedy NMS with
padded outputs: (bboxes, class_indices, scores, selected_indices_padded,
num_valid_detections) — matching tf.image.non_max_suppression_padded with
pad_to_max_output_size=True.

TPU-native formulation: instead of a data-dependent loop over a dynamic
candidate set, we take the top-K scoring boxes (K static, default 512 —
exact whenever fewer than K boxes beat the score threshold, which holds
for every real detection workload), compute one K×K IoU matrix on the VPU,
and run a K-step `lax.fori_loop` suppression scan over rows. Everything is
static-shape and fuses into the surrounding jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

DEFAULT_NUM_CANDIDATES = 512


def _pairwise_iou(boxes):
    """boxes: (K, 4) xyxy → (K, K) IoU."""
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _nms_single(boxes, scores, max_boxes: int, iou_threshold, score_threshold, num_candidates: int):
    """Single-image greedy NMS. boxes (N,4), scores (N,) → padded indices."""
    n = scores.shape[0]
    k = min(num_candidates, n)

    # Stable sort by descending score (TF breaks ties by lower index first).
    order = jnp.argsort(-scores, stable=True)[:k]
    cand_boxes = boxes[order].astype(jnp.float32)
    cand_scores = scores[order].astype(jnp.float32)
    valid = cand_scores > score_threshold

    iou = _pairwise_iou(cand_boxes)
    suppress_mat = iou > iou_threshold

    def body(i, carry):
        keep, suppressed = carry
        keep_i = valid[i] & ~suppressed[i]
        keep = keep.at[i].set(keep_i)
        # a kept box suppresses all later boxes with IoU above threshold
        row = suppress_mat[i] & keep_i
        later = lax.broadcasted_iota(jnp.int32, (k,), 0) > i
        suppressed = suppressed | (row & later)
        return keep, suppressed

    keep, _ = lax.fori_loop(
        0, k, body, (jnp.zeros((k,), bool), jnp.zeros((k,), bool))
    )

    # Kept boxes are already in descending-score order; compact them to the
    # front, pad with 0 (TF pads selected_indices with zeros).
    rank = jnp.cumsum(keep) - 1  # position of each kept box in the output
    num_valid = jnp.minimum(jnp.sum(keep), max_boxes).astype(jnp.int32)
    write_pos = jnp.where(keep & (rank < max_boxes), rank, max_boxes)  # drop → OOB
    padded = jnp.zeros((max_boxes + 1,), jnp.int32).at[write_pos].set(order.astype(jnp.int32))
    return padded[:max_boxes], num_valid


@partial(jax.jit, static_argnames=("max_boxes", "num_candidates"))
def yolo_nms(
    bboxes,
    confidence,
    class_probs,
    max_boxes: int = 100,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.1,
    num_candidates: int = DEFAULT_NUM_CANDIDATES,
):
    """Batched class-agnostic NMS.

    Args:
      bboxes: (B, N, 4) xyxy.
      confidence: (B, N, 1) objectness.
      class_probs: (B, N, nc).

    Returns (matching reference yolo_nms outputs):
      bboxes (B, N, 4), class_indices (B, N) int64-like, scores (B, N),
      selected_indices (B, max_boxes) int32, num_valid (B,) int32.
    """
    class_indices = jnp.argmax(class_probs, axis=-1)
    best_prob = jnp.max(class_probs, axis=-1)
    scores = confidence[..., 0] * best_prob

    sel, nvalid = jax.vmap(
        lambda b, s: _nms_single(
            b, s, max_boxes, jnp.float32(iou_threshold), jnp.float32(score_threshold), num_candidates
        )
    )(bboxes, scores)
    return bboxes, class_indices, scores, sel, nvalid


def gather_detections(bboxes, class_indices, scores, selected, num_valid):
    """Compact (B, max_boxes) detections from padded NMS output, on device.

    Returns (boxes, classes, scores, valid_mask) — the small tensors a
    serving path actually ships off-chip (the reference gathers on host,
    inference.py:21-28).
    """
    boxes = jnp.take_along_axis(bboxes, selected[..., None], axis=1)
    classes = jnp.take_along_axis(class_indices, selected, axis=1)
    det_scores = jnp.take_along_axis(scores, selected, axis=1)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, selected.shape, 1) < num_valid[:, None]
    )
    return boxes, classes, det_scores, valid
