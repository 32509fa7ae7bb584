import jax.numpy as jnp
import numpy as np

from yolov3_tpu.ops.decode import yolo_decode
from yolov3_tpu.ops.nms import yolo_nms

ANCHORS = np.array([[[0.2, 0.2], [0.4, 0.4], [0.8, 0.8]]], np.float32)


def test_decode_inverts_target_transform():
    """Construct logits for a known box → decode returns that box."""
    g, nclasses = 13, 6
    box = np.array([0.4, 0.4, 0.6, 0.6])  # center (.5,.5), wh (.2,.2)
    row, col, a = int(0.5 * g), int(0.5 * g), 0
    grid = np.zeros((1, g, g, 3, 5 + nclasses), np.float32)
    ox, oy = 0.5 * g - col, 0.5 * g - row
    grid[0, row, col, a, 0] = np.log(ox / (1 - ox))
    grid[0, row, col, a, 1] = np.log(oy / (1 - oy))
    grid[0, row, col, a, 2] = np.log(0.2 / ANCHORS[0, a, 0])
    grid[0, row, col, a, 3] = np.log(0.2 / ANCHORS[0, a, 1])
    grid[0, row, col, a, 4] = 10.0  # objectness ≈ 1

    boxes, conf, probs = yolo_decode([jnp.asarray(grid)], ANCHORS, nclasses)
    flat_idx = (row * g + col) * 3 + a
    np.testing.assert_allclose(np.asarray(boxes)[0, flat_idx], box, atol=1e-6)
    assert np.asarray(conf)[0, flat_idx, 0] > 0.99


def _pack(boxes, scores, nclasses=3):
    n = len(boxes)
    conf = np.asarray(scores, np.float32).reshape(1, n, 1)
    probs = np.zeros((1, n, nclasses), np.float32)
    probs[0, :, 0] = 1.0
    return jnp.asarray(np.asarray(boxes, np.float32)[None]), jnp.asarray(conf), jnp.asarray(probs)


def test_nms_suppresses_overlaps():
    boxes = [[0.1, 0.1, 0.5, 0.5], [0.12, 0.12, 0.52, 0.52], [0.6, 0.6, 0.9, 0.9]]
    scores = [0.9, 0.8, 0.7]
    b, c, p = _pack(boxes, scores)
    _, _, _, sel, nv = yolo_nms(b, c, p, max_boxes=10, iou_threshold=0.5, score_threshold=0.0)
    assert int(nv[0]) == 2
    assert list(np.asarray(sel)[0][:2]) == [0, 2]


def test_nms_score_threshold():
    boxes = [[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.7, 0.7]]
    scores = [0.9, 0.05]
    b, c, p = _pack(boxes, scores)
    _, _, _, sel, nv = yolo_nms(b, c, p, max_boxes=10, iou_threshold=0.5, score_threshold=0.1)
    assert int(nv[0]) == 1 and int(np.asarray(sel)[0][0]) == 0


def test_nms_max_boxes_cap():
    rng = np.random.RandomState(0)
    n = 50
    xy = rng.rand(n, 2) * 0.9
    boxes = np.concatenate([xy, xy + 0.05], axis=-1)  # disjoint-ish tiny boxes
    scores = rng.rand(n) * 0.5 + 0.4
    b, c, p = _pack(boxes.tolist(), scores.tolist())
    _, _, _, sel, nv = yolo_nms(b, c, p, max_boxes=5, iou_threshold=0.5, score_threshold=0.0)
    assert int(nv[0]) == 5


def test_nms_score_is_conf_times_best_prob():
    boxes = [[0.1, 0.1, 0.3, 0.3]]
    conf = np.array([[[0.5]]], np.float32)
    probs = np.array([[[0.2, 0.8, 0.1]]], np.float32)
    _, cls, scores, sel, nv = yolo_nms(
        jnp.asarray(np.asarray(boxes, np.float32)[None]), jnp.asarray(conf), jnp.asarray(probs),
        max_boxes=5, iou_threshold=0.5, score_threshold=0.0,
    )
    assert int(np.asarray(cls)[0, 0]) == 1
    np.testing.assert_allclose(np.asarray(scores)[0, 0], 0.4, rtol=1e-6)


def test_round_sweep_matches_matrix_sweep():
    """The O(K)-memory round sweep (large-K path, _MATRIX_SWEEP_MAX_K) must
    keep exactly the boxes the (K,K)-matrix scan sweep keeps — including
    duplicate-box score ties and the fewer-keeps-than-max_boxes regime."""
    import jax
    import jax.numpy as jnp
    from yolov3_tpu.ops import nms as M

    rng = np.random.RandomState(42)
    B, N, nclasses = 2, 600, 5
    xy = rng.rand(B, N, 2) * 0.8
    wh = rng.rand(B, N, 2) * 0.3 + 0.02
    boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
    boxes[:, 77] = boxes[:, 11]  # exact duplicates → tie-break coverage
    conf = rng.rand(B, N, 1).astype(np.float32)
    conf[:, 77] = conf[:, 11]
    probs = rng.rand(B, N, nclasses).astype(np.float32)
    probs[:, 77] = probs[:, 11]

    scores = (conf[..., 0] * probs.max(-1)).astype(np.float32)
    for max_boxes, score_t in ((100, 0.3), (50, 0.0), (200, 0.9), (600, 0.0)):
        iou_thr = jnp.float32(0.5)
        order, cand_boxes, cand_scores = jax.vmap(
            lambda b, s: M._candidates(b, s, N))(jnp.asarray(boxes),
                                                 jnp.asarray(scores))
        valid = cand_scores > jnp.float32(score_t)
        # drive the two sweeps directly — yolo_nms is jitted, so flipping
        # the module threshold between same-shape calls would hit the trace
        # cache and compare a path against itself
        sup = jax.vmap(M._pairwise_iou)(cand_boxes) > iou_thr
        keep_m = jax.vmap(M._scan_sweep)(sup, valid)
        sel_m, nv_m = jax.vmap(
            lambda o, kp: M._compact(o, kp, max_boxes))(order, keep_m)
        # the large-K production composition: direct round sweep over the
        # sorted candidates, positions mapped back through `order`
        sel_pos, nv_r = jax.vmap(
            lambda cb, cs, v: M._round_sweep_direct(cb, cs, v, iou_thr,
                                                    max_boxes))(
            cand_boxes, cand_scores, valid)
        sel_r = jnp.where(
            jnp.arange(max_boxes)[None, :] < nv_r[:, None],
            jnp.take_along_axis(order.astype(jnp.int32), sel_pos, axis=1),
            0)
        np.testing.assert_array_equal(np.asarray(nv_m), np.asarray(nv_r),
                                      err_msg=f"max_boxes={max_boxes} score_t={score_t}")
        for b in range(B):
            np.testing.assert_array_equal(
                np.asarray(sel_m)[b][: int(nv_m[b])],
                np.asarray(sel_r)[b][: int(nv_r[b])],
                err_msg=f"max_boxes={max_boxes} score_t={score_t} b={b}")


def _pack_classes(boxes, scores, classes, nclasses=3):
    n = len(boxes)
    conf = np.asarray(scores, np.float32).reshape(1, n, 1)
    probs = np.zeros((1, n, nclasses), np.float32)
    probs[0, np.arange(n), classes] = 1.0
    return (jnp.asarray(np.asarray(boxes, np.float32)[None]),
            jnp.asarray(conf), jnp.asarray(probs))


def test_nms_per_class_keeps_cross_class_overlaps():
    """per_class=True (extension): identical overlapping boxes of DIFFERENT
    classes both survive; same-class overlap still suppressed; the
    class-agnostic default suppresses across classes."""
    boxes = [[0.1, 0.1, 0.5, 0.5],   # class 0, top score
             [0.1, 0.1, 0.5, 0.5],   # class 1, same box
             [0.12, 0.12, 0.52, 0.52]]  # class 0, overlaps box 0
    scores = [0.9, 0.8, 0.7]
    b, c, p = _pack_classes(boxes, scores, [0, 1, 0])
    _, _, _, sel, nv = yolo_nms(b, c, p, max_boxes=10, iou_threshold=0.5,
                                score_threshold=0.0)
    assert int(nv[0]) == 1  # class-agnostic: one box wins
    _, _, _, sel, nv = yolo_nms(b, c, p, max_boxes=10, iou_threshold=0.5,
                                score_threshold=0.0, per_class=True)
    assert int(nv[0]) == 2
    assert list(np.asarray(sel)[0][:2]) == [0, 1]  # box 2 suppressed by 0


def _numpy_per_class_nms(boxes, scores, classes, iou_thr, score_thr, max_boxes):
    """Greedy per-class reference (torchvision batched_nms semantics)."""
    order = sorted(range(len(boxes)), key=lambda i: (-scores[i], i))
    keep = []
    for i in order:
        if scores[i] <= score_thr:
            continue
        ok = True
        for j in keep:
            if classes[j] != classes[i]:
                continue
            bi, bj = boxes[i], boxes[j]
            ix = max(0.0, min(bi[2], bj[2]) - max(bi[0], bj[0]))
            iy = max(0.0, min(bi[3], bj[3]) - max(bi[1], bj[1]))
            inter = ix * iy
            ai = max(0.0, bi[2] - bi[0]) * max(0.0, bi[3] - bi[1])
            aj = max(0.0, bj[2] - bj[0]) * max(0.0, bj[3] - bj[1])
            union = ai + aj - inter
            if union > 0 and inter / union > iou_thr:
                ok = False
                break
        if ok and len(keep) < max_boxes:
            keep.append(i)
    return keep


def test_nms_per_class_matches_numpy_reference():
    rng = np.random.RandomState(7)
    n, nclasses = 80, 4
    xy = rng.rand(n, 2) * 0.7
    wh = rng.rand(n, 2) * 0.3 + 0.05
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    classes = rng.randint(0, nclasses, n)
    conf = scores.reshape(1, n, 1)
    probs = np.zeros((1, n, nclasses), np.float32)
    probs[0, np.arange(n), classes] = 1.0
    _, _, _, sel, nv = yolo_nms(
        jnp.asarray(boxes[None]), jnp.asarray(conf), jnp.asarray(probs),
        max_boxes=20, iou_threshold=0.45, score_threshold=0.1, per_class=True)
    got = list(np.asarray(sel)[0][: int(nv[0])])
    want = _numpy_per_class_nms(boxes, scores, classes, 0.45, 0.1, 20)
    assert got == want
