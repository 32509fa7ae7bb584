"""Pallas full-candidate greedy-NMS kernel (ops/pallas/round_sweep.py):
interpret-mode exactness vs the XLA round sweep (itself pinned index-exact
vs tf.image.non_max_suppression_padded in test_reference_parity). Covers
duplicate-box score ties, partial fill (fewer keeps than max_boxes), and
lane padding (N not a multiple of 128)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolov3_tpu.ops import nms as M
from yolov3_tpu.ops.pallas.round_sweep import pallas_round_sweep


def _data(seed, B, N):
    rng = np.random.RandomState(seed)
    xy = rng.rand(B, N, 2) * 0.8
    wh = rng.rand(B, N, 2) * 0.3 + 0.02
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    boxes[:, N // 8] = boxes[:, N // 16]  # exact duplicates → tie-break
    scores = rng.rand(B, N).astype(np.float32)
    scores[:, N // 8] = scores[:, N // 16]
    return jnp.asarray(boxes), jnp.asarray(scores)


@pytest.mark.parametrize("N", [500, 1024, 777])
@pytest.mark.parametrize("max_boxes,score_t", [(100, 0.3), (50, 0.0), (200, 0.9)])
def test_kernel_matches_xla_round_sweep(N, max_boxes, score_t):
    boxes, scores = _data(N + max_boxes, 3, N)
    sel_p, nv_p = pallas_round_sweep(boxes, scores, 0.5, score_t,
                                     max_boxes=max_boxes, interpret=True)
    sel_r, nv_r = jax.vmap(lambda b, s: M._round_sweep_direct(
        b, s, s > jnp.float32(score_t), jnp.float32(0.5), max_boxes))(
        boxes, scores)
    np.testing.assert_array_equal(np.asarray(nv_p), np.asarray(nv_r))
    np.testing.assert_array_equal(np.asarray(sel_p), np.asarray(sel_r))


def test_kernel_empty_and_total_suppression():
    # no score above threshold → zero detections, zero-padded sel
    boxes, scores = _data(1, 2, 300)
    sel, nv = pallas_round_sweep(boxes, scores, 0.5, 2.0, max_boxes=20,
                                 interpret=True)
    assert (np.asarray(nv) == 0).all()
    assert (np.asarray(sel) == 0).all()
    # identical boxes, iou_threshold 0.1 → exactly one survivor per image
    one = jnp.broadcast_to(jnp.asarray([0.1, 0.1, 0.5, 0.5], jnp.float32),
                           (2, 300, 4))
    sel, nv = pallas_round_sweep(one, scores, 0.1, 0.0, max_boxes=20,
                                 interpret=True)
    assert (np.asarray(nv) == 1).all()
    np.testing.assert_array_equal(np.asarray(sel)[:, 0],
                                  np.asarray(jnp.argmax(scores, axis=1)))
