"""Fixed-shape, batched, class-agnostic NMS on device.

Reproduces the semantics of the reference's inference-graph NMS
(core/yolo_nms.py:15-34): best class = argmax of class probs, score =
objectness × max class prob, then a *class-agnostic* greedy NMS with
padded outputs: (bboxes, class_indices, scores, selected_indices_padded,
num_valid_detections) — matching tf.image.non_max_suppression_padded with
pad_to_max_output_size=True (index-exact, verified in tests).

TPU-native formulation: instead of a data-dependent loop over a dynamic
candidate set, we take the top-K scoring boxes (K static — exact whenever
fewer than K boxes beat the score threshold, which holds for every real
detection workload), compute one K×K IoU matrix on the VPU, and run the
sequential suppression sweep either as a Pallas kernel (matrix + state
resident in VMEM for all K steps — the default on TPU) or as a
`lax.fori_loop` scan (CPU & fallback). Everything is static-shape and
fuses into the surrounding jit.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DEFAULT_NUM_CANDIDATES = 512
# above this K the (B, K, K) suppression matrix is replaced by the
# O(K)-memory round sweep (bool matrix at B=128 K=4096 is already ~2.1 GB);
# YOLOV3_NMS_MATRIX_MAX_K overrides for A/B tuning
_MATRIX_SWEEP_MAX_K = int(os.environ.get("YOLOV3_NMS_MATRIX_MAX_K", 4096))


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


def _candidates(boxes, scores, k: int):
    """Stable top-K by descending score (TF tie-break: lower index first)."""
    order = jnp.argsort(-scores, stable=True)[:k]
    return order, boxes[order].astype(jnp.float32), scores[order].astype(jnp.float32)


def _scan_sweep(suppress_mat, valid):
    """Sequential suppression via fori_loop (single image)."""
    k = valid.shape[0]

    def body(i, carry):
        keep, suppressed = carry
        keep_i = valid[i] & ~suppressed[i]
        keep = keep.at[i].set(keep_i)
        row = suppress_mat[i] & keep_i
        later = lax.broadcasted_iota(jnp.int32, (k,), 0) > i
        suppressed = suppressed | (row & later)
        return keep, suppressed

    keep, _ = lax.fori_loop(0, k, body, (jnp.zeros((k,), bool), jnp.zeros((k,), bool)))
    return keep


def _iou_one_vs_all(box, boxes):
    """box (4,) vs boxes (K, 4) → (K,) IoU. O(K) memory."""
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    area_b = jnp.maximum(box[2] - box[0], 0.0) * jnp.maximum(box[3] - box[1], 0.0)
    union = area_b + area - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _round_sweep_direct(boxes, scores, valid, iou_thr, max_boxes: int):
    """Round sweep on UNSORTED candidates, emitting selected original
    indices in selection order (single image).

    At K = N the top-K sort is redundant: each round's ``argmax`` picks the
    highest live score, and argmax's first-index tie-break equals TF's
    stable descending sort (lower original index wins among equal scores).
    Skips the argsort + gather of ``_candidates`` entirely.

    Returns (sel (max_boxes,) int32 — original indices, zero-padded like
    TF's pad_to_max_output_size; num_valid () int32).
    """
    neg = jnp.float32(-jnp.inf)

    def body(i, carry):
        sel, nv, live = carry
        masked = jnp.where(live, scores.astype(jnp.float32), neg)
        j = jnp.argmax(masked)
        found = masked[j] > neg
        sel = sel.at[i].set(jnp.where(found, j, 0).astype(jnp.int32))
        nv = nv + found.astype(jnp.int32)
        iou = _iou_one_vs_all(boxes[j].astype(jnp.float32),
                              boxes.astype(jnp.float32))
        live = live & ~((iou > iou_thr) & found)
        live = live.at[j].set(False)
        return sel, nv, live

    sel, nv, _ = lax.fori_loop(
        0, max_boxes,
        body,
        (jnp.zeros((max_boxes,), jnp.int32), jnp.int32(0), valid),
    )
    return sel, nv


def _compact(order, keep, max_boxes: int):
    """Kept candidates (already score-ordered) → padded selected indices."""
    rank = jnp.cumsum(keep) - 1
    num_valid = jnp.minimum(jnp.sum(keep), max_boxes).astype(jnp.int32)
    write_pos = jnp.where(keep & (rank < max_boxes), rank, max_boxes)  # drop → OOB
    padded = jnp.zeros((max_boxes + 1,), jnp.int32).at[write_pos].set(order.astype(jnp.int32))
    return padded[:max_boxes], num_valid


@partial(jax.jit, static_argnames=("max_boxes", "num_candidates", "use_pallas",
                                   "per_class"))
def yolo_nms(
    bboxes,
    confidence,
    class_probs,
    max_boxes: int = 100,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.1,
    num_candidates: int = DEFAULT_NUM_CANDIDATES,
    use_pallas: bool | None = None,
    per_class: bool = False,
):
    """Batched class-agnostic NMS (per-class as an opt-in).

    Args:
      bboxes: (B, N, 4) xyxy; confidence: (B, N, 1); class_probs: (B, N, nc).
      per_class: suppress only among boxes of the SAME argmax class
        (torchvision ``batched_nms`` semantics) — implemented by offsetting
        each candidate's box by class_index before the IoU sweep, so
        cross-class IoU is exactly 0 and every suppression path (matrix,
        round sweep, Pallas kernels) works unchanged. The reference is
        class-agnostic (core/yolo_nms.py:26-33 NOTE), so this is an
        extension, off by default.
      use_pallas: serving path (K ≤ the matrix-sweep bound): None/False =
        the fused `lax.fori_loop` sweep (default — measured faster inside
        the full detect pipeline, where XLA schedules the scan well);
        True = explicit opt-in to the Pallas VMEM sweep kernel (~11× faster
        standalone; requires TPU backend and K % 128 == 0, silently falls
        back to the scan otherwise). Full-candidate exactness path
        (K = N > the bound, e.g. the eval sweep's K=N escalation) the
        default INVERTS: None selects the Pallas VMEM round-sweep kernel on
        TPU (2.7× the XLA loop, bit-identical) and False is the explicit
        escape hatch back to the XLA round sweep. See PERF.md "NMS
        implementations".

    Exactness: results are index-exact vs TF's non_max_suppression_padded
    whenever the top-`num_candidates` truncation cannot change the outcome —
    i.e. `max_boxes` detections are found within the top-K candidates, or
    fewer than K candidates beat `score_threshold`. For very low thresholds
    (e.g. the 0.004 entry of the reference eval sweep) use
    ``yolo_nms_exact``, which escalates K until that condition provably
    holds.

    Returns (matching reference yolo_nms outputs):
      bboxes (B, N, 4), class_indices (B, N), scores (B, N),
      selected_indices (B, max_boxes) int32, num_valid (B,) int32.
    """
    class_indices = jnp.argmax(class_probs, axis=-1)
    best_prob = jnp.max(class_probs, axis=-1)
    scores = confidence[..., 0] * best_prob

    # per-class: shift each box into its own disjoint coordinate band for
    # the suppression sweeps only (decoded boxes stay within (-1, 2), so a
    # stride of 4 guarantees zero cross-class IoU); outputs keep the
    # UNSHIFTED boxes
    sweep_bboxes = bboxes
    if per_class:
        sweep_bboxes = bboxes + class_indices[..., None].astype(jnp.float32) * 4.0

    n = scores.shape[1]
    k = min(num_candidates, n)
    pallas_opt_out = use_pallas is False  # explicit escape hatch, pre-normalization
    if use_pallas is None:
        # Measured on TPU v5e: standalone NMS the Pallas sweep is ~11× the
        # scan, but fused into the full detect pipeline XLA schedules the
        # scan better (93.6 vs 98.3 ms/batch128). Default scan; opt in for
        # NMS-dominated workloads.
        use_pallas = False
    # Mosaic-TPU kernel: fall back to the scan anywhere else (incl. GPU),
    # and above the kernel's VMEM-feasible K — the documented "silently
    # falls back" contract
    if use_pallas:
        from .pallas.nms_kernel import MAX_SWEEP_K

        use_pallas = (k % 128 == 0 and k <= MAX_SWEEP_K
                      and jax.default_backend() == "tpu")

    iou_thr = jnp.float32(iou_threshold)
    score_thr = jnp.float32(score_threshold)

    if k >= n and k > _MATRIX_SWEEP_MAX_K:
        # full-candidate exactness bucket: the top-K sort is redundant
        # (argmax tie-break == TF's stable sort) — sweep directly. On TPU
        # the VMEM-resident Pallas kernel runs the whole greedy loop
        # without per-round HBM traffic (2.7× the XLA loop standalone,
        # bit-identical — ops/pallas/round_sweep.py). use_pallas=False is
        # honored as the escape hatch (XLA fori_loop sweep).
        if not pallas_opt_out and jax.default_backend() == "tpu":
            from .pallas.round_sweep import pallas_round_sweep

            sel, nvalid = pallas_round_sweep(
                sweep_bboxes, scores, iou_thr, score_thr, max_boxes=max_boxes)
        else:
            sel, nvalid = jax.vmap(
                lambda b, s: _round_sweep_direct(b, s, s > score_thr,
                                                 iou_thr, max_boxes)
            )(sweep_bboxes, scores)
        return bboxes, class_indices, scores, sel, nvalid

    order, cand_boxes, cand_scores = jax.vmap(lambda b, s: _candidates(b, s, k))(
        sweep_bboxes, scores
    )
    valid = cand_scores > score_thr

    if k > _MATRIX_SWEEP_MAX_K:
        # the (B, K, K) suppression matrix is memory-quadratic (the eval
        # sweep's exact-K escalation reaches K≈22.7k at 608², where the
        # matrix alone would exceed HBM) — run the O(K)-memory round sweep
        # over the sorted candidates and map its sorted-positions back to
        # original indices; identical keeps (tests pin it against the
        # matrix path)
        sel_pos, nvalid = jax.vmap(
            lambda b, s, v: _round_sweep_direct(b, s, v, iou_thr, max_boxes)
        )(cand_boxes, cand_scores, valid)
        sel = jnp.where(
            lax.broadcasted_iota(jnp.int32, sel_pos.shape, 1) < nvalid[:, None],
            jnp.take_along_axis(order.astype(jnp.int32), sel_pos, axis=1),
            0,
        )
        return bboxes, class_indices, scores, sel, nvalid

    suppress_mat = jax.vmap(_pairwise_iou)(cand_boxes) > iou_thr

    if use_pallas:
        from .pallas.nms_kernel import pallas_suppression_sweep

        keep = pallas_suppression_sweep(
            suppress_mat.astype(jnp.float32), valid.astype(jnp.float32)
        ) > 0.5
    else:
        keep = jax.vmap(_scan_sweep)(suppress_mat, valid)

    sel, nvalid = jax.vmap(lambda o, kp: _compact(o, kp, max_boxes))(order, keep)
    return bboxes, class_indices, scores, sel, nvalid


def nms_inexact_mask(scores, num_valid, max_boxes: int, score_threshold: float, k: int):
    """Per-image bool: True where top-K truncation MAY have changed the result.

    A greedy class-agnostic NMS restricted to the top-K candidates is exact
    unless BOTH (a) fewer than max_boxes detections were kept within the
    top-K, and (b) candidates beyond rank K still beat the score threshold —
    lower-scored boxes can never suppress higher-scored ones, so truncation
    only matters if TF's full sweep would have kept scanning past K.
    """
    scores = np.asarray(scores)
    num_valid = np.asarray(num_valid)
    above = (scores > score_threshold).sum(axis=1)
    return (num_valid < max_boxes) & (above > k)


def next_escalation_k(k: int, n: int) -> int:
    """Next top-K bucket when truncation at ``k`` could have diverged.

    On TPU, when the full candidate count lands on the Pallas round-sweep
    path (n > _MATRIX_SWEEP_MAX_K), K=N is cheaper than any intermediate
    sorted bucket plus its recompile — jump straight to exactness. When n
    is small enough that K=N would take the quadratic (B,K,K) matrix path
    (e.g. tiny@416: N=2,535), keep the doubling ladder: the cheap 1024/2048
    buckets usually suffice and K=N offers no kernel advantage there.
    """
    if jax.default_backend() == "tpu" and n > _MATRIX_SWEEP_MAX_K:
        return n
    return min(n, k * 2)


def yolo_nms_exact(
    bboxes,
    confidence,
    class_probs,
    max_boxes: int = 100,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.1,
    num_candidates: int = DEFAULT_NUM_CANDIDATES,
):
    """Host-side driver guaranteeing index-exact parity with TF's *full* NMS.

    Runs ``yolo_nms`` and, when the top-K truncation could have altered the
    result (see ``nms_inexact_mask``), doubles K (lane-aligned buckets, so at
    most log2(N/K0) recompiles per process) and reruns, up to K = N. Used by
    the evaluate app so the reference's low-threshold sweep entries
    (config/evaluate_config.yaml: 0.004) are exact, not "exact when K
    suffices".
    """
    n = bboxes.shape[1]
    k = min(num_candidates, n)
    while True:
        out = yolo_nms(
            bboxes, confidence, class_probs, max_boxes=max_boxes,
            iou_threshold=iou_threshold, score_threshold=score_threshold,
            num_candidates=k,
        )
        if k >= n:
            return out
        _, _, scores, _, nvalid = out
        thr = float(score_threshold)
        if not nms_inexact_mask(scores, nvalid, max_boxes, thr, k).any():
            return out
        k = next_escalation_k(k, n)


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
