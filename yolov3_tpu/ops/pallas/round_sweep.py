"""Pallas TPU kernel: full greedy NMS (round sweep) resident in VMEM.

The large-K exact-NMS path (`ops/nms.py::_round_sweep_direct`, used by the
eval sweep's K=N exactness bucket) runs max_boxes rounds of
pick-highest-live → suppress-by-IoU. As XLA ops inside a fori_loop each
round re-reads scores/boxes/live from HBM and pays per-iteration schedule
overhead — measured ~0.68 ms/round at N≈22.7k on v5e for ~15 MB of
traffic, i.e. two orders of magnitude off bandwidth. This kernel keeps
boxes (4, N), scores and the live mask VMEM-resident across ALL rounds:
one grid step per image, ~6 N-wide VPU passes per round, no HBM between
rounds.

Semantics are identical to `_round_sweep_direct` (and therefore TF's
`non_max_suppression_padded`): argmax first-index tie-break == TF's stable
descending sort; selected original indices emitted in selection order,
zero-padded; suppression strictly `iou > threshold`, validity strictly
`score > threshold`.

Layout notes: N pads to a lane multiple (128) with -inf scores. Boxes ride
as (4, N) — 4 sublanes × N lanes — so every per-round op is a (1, N) or
(4, N) VPU tile. The dynamic gather of the selected box is a one-hot
reduction (no lane-dynamic addressing); the selected index lands in the
(max_boxes, 1) output via a sublane-dynamic store, which Mosaic supports.

Reference anchor: exactness tier of core/yolo_nms.py:15-34's
tf.image.non_max_suppression_padded at the evaluate sweep's low
thresholds (config/evaluate_config.yaml).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG = -3.0e38  # effectively -inf, but finite (VPU-safe); Python literal so
# the kernel doesn't capture a traced constant


def _kernel(boxes_ref, scores_ref, thr_ref, sel_ref, nv_ref, live_scr,
            *, max_boxes: int, n: int):
    iou_thr = thr_ref[0, 0]
    score_thr = thr_ref[0, 1]
    lanes = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    scores = scores_ref[...]
    live_scr[...] = jnp.where(scores > score_thr, scores, _NEG)

    x0 = boxes_ref[0:1, :]
    y0 = boxes_ref[1:2, :]
    x1 = boxes_ref[2:3, :]
    y1 = boxes_ref[3:4, :]
    area = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)

    def body(i, nv):
        masked = live_scr[...]
        best = jnp.max(masked)
        found = best > _NEG
        # first lane achieving the max — TF's stable-sort tie-break
        j = jnp.min(jnp.where(masked == best, lanes, n))
        onehot = (lanes == j).astype(jnp.float32)
        bx0 = jnp.sum(x0 * onehot)
        by0 = jnp.sum(y0 * onehot)
        bx1 = jnp.sum(x1 * onehot)
        by1 = jnp.sum(y1 * onehot)
        barea = jnp.maximum(bx1 - bx0, 0.0) * jnp.maximum(by1 - by0, 0.0)
        iw = jnp.maximum(jnp.minimum(x1, bx1) - jnp.maximum(x0, bx0), 0.0)
        ih = jnp.maximum(jnp.minimum(y1, by1) - jnp.maximum(y0, by0), 0.0)
        inter = iw * ih
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / union, 0.0)
        dead = (iou > iou_thr) | (lanes == j)
        live_scr[...] = jnp.where(
            found & dead, _NEG, live_scr[...]
        )
        sel_ref[pl.ds(i, 1), :] = jnp.where(
            found, j, 0).astype(jnp.int32).reshape(1, 1)
        return nv + found.astype(jnp.int32)

    nv = lax.fori_loop(0, max_boxes, body, jnp.int32(0))
    nv_ref[0, 0] = nv


@functools.partial(jax.jit, static_argnames=("max_boxes", "interpret"))
def pallas_round_sweep(bboxes, scores, iou_threshold, score_threshold,
                       max_boxes: int = 100, interpret: bool = False):
    """Batched full-candidate greedy NMS.

    bboxes (B, N, 4) xyxy; scores (B, N). Returns (sel (B, max_boxes)
    int32 original indices in selection order, zero-padded; num_valid (B,)
    int32). Identical results to ops.nms._round_sweep_direct.
    """
    b, n, _ = bboxes.shape
    n_pad = -(-n // _LANES) * _LANES
    boxes_t = jnp.moveaxis(bboxes.astype(jnp.float32), -1, 1)  # (B, 4, N)
    if n_pad != n:
        boxes_t = jnp.pad(boxes_t, ((0, 0), (0, 0), (0, n_pad - n)))
        scores = jnp.pad(scores.astype(jnp.float32),
                         ((0, 0), (0, n_pad - n)), constant_values=-jnp.inf)
    scores = scores.astype(jnp.float32).reshape(b, 1, n_pad)
    thr = jnp.stack([jnp.float32(iou_threshold),
                     jnp.float32(score_threshold)]).reshape(1, 2)

    kern = functools.partial(_kernel, max_boxes=max_boxes, n=n_pad)
    sel, nv = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, 4, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, max_boxes, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, max_boxes, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
        interpret=interpret,
    )(boxes_t, scores, thr)
    return sel[:, :, 0], nv[:, 0, 0]
