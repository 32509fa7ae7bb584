import numpy as np

from yolov3_tpu.eval.detections_evaluator import APAccumulator, EvaluateDetections


def _pad(arr, n, width):
    out = np.zeros((n, width), np.float32) if width > 1 else np.zeros((n,), np.float32)
    arr = np.asarray(arr, np.float32)
    if len(arr):
        out[: len(arr)] = arr
    return out


def _run(pred_boxes, pred_classes, gt_boxes, gt_classes, nclasses=3, iou=0.5):
    P, G = 8, 8
    ev = EvaluateDetections(nclasses, iou)
    pv = np.zeros((1, P), bool); pv[0, : len(pred_boxes)] = True
    gv = np.zeros((1, G), bool); gv[0, : len(gt_boxes)] = True
    ev.evaluate_batch(
        _pad(pred_boxes, P, 4)[None], _pad(pred_classes, P, 1)[None].astype(np.int32), pv,
        _pad(gt_boxes, G, 4)[None], _pad(gt_classes, G, 1)[None].astype(np.int32), gv,
    )
    return ev


def test_perfect_match():
    ev = _run([[0.1, 0.1, 0.5, 0.5]], [1], [[0.1, 0.1, 0.5, 0.5]], [1])
    assert ev.counters["tp"][1] == 1 and ev.counters["fp"].sum() == 0
    assert ev.counters["fn"].sum() == 0
    assert ev.counters["examples"] == 1


def test_class_mismatch_is_fp_and_fn():
    ev = _run([[0.1, 0.1, 0.5, 0.5]], [2], [[0.1, 0.1, 0.5, 0.5]], [1])
    assert ev.counters["fp"][2] == 1
    assert ev.counters["fn"][1] == 1
    assert ev.counters["tp"].sum() == 0


def test_low_iou_is_fp():
    ev = _run([[0.6, 0.6, 0.9, 0.9]], [1], [[0.1, 0.1, 0.3, 0.3]], [1])
    assert ev.counters["fp"][1] == 1 and ev.counters["fn"][1] == 1


def test_negative_class_counts_error_only():
    ev = _run([[0.1, 0.1, 0.5, 0.5]], [1], [[0.1, 0.1, 0.5, 0.5]], [-1])
    assert ev.counters["errors"] == 1
    assert ev.counters["examples"] == 0
    assert ev.counters["tp"].sum() == 0 and ev.counters["gts"].sum() == 0


def test_duplicate_preds_same_gt_reference_quirk():
    """Two preds over one gt: the reference's vectorized decision pass counts
    BOTH as TP (assignment mask read before update) — parity-replicated."""
    ev = _run([[0.1, 0.1, 0.5, 0.5], [0.11, 0.11, 0.5, 0.5]], [1, 1],
              [[0.1, 0.1, 0.5, 0.5]], [1])
    assert ev.counters["tp"][1] == 2
    assert ev.counters["fn"].sum() == 0


def test_recall_precision():
    ev = _run([[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]], [1, 1],
              [[0.1, 0.1, 0.5, 0.5]], [1])
    recall, precision = ev.recall_precision()
    np.testing.assert_allclose(recall[1], 1.0)
    np.testing.assert_allclose(precision[1], 0.5)


def test_ap50_perfect_detector():
    acc = APAccumulator(2)
    for _ in range(5):
        acc.add_image([[0.1, 0.1, 0.5, 0.5]], [0], [0.9], [[0.1, 0.1, 0.5, 0.5]], [0])
    aps, mean_ap = acc.compute()
    np.testing.assert_allclose(aps[0], 1.0)
    np.testing.assert_allclose(mean_ap, 1.0)


def test_ap50_half_recall():
    acc = APAccumulator(1)
    acc.add_image([[0.1, 0.1, 0.5, 0.5]], [0], [0.9],
                  [[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]], [0, 0])
    aps, mean_ap = acc.compute()
    np.testing.assert_allclose(aps[0], 0.5)


def test_ap50_analytic_interleaved():
    """Hand-computed AP@0.5: one class, 2 GTs over 2 images, 3 preds ranked
    TP(0.9), FP(0.8), TP(0.7) → precision envelope gives
    AP = 0.5*1 + 0.5*(2/3) = 5/6."""
    acc = APAccumulator(1, 0.5)
    gt = [[0.0, 0.0, 0.4, 0.4]]
    far = [[0.6, 0.6, 0.9, 0.9]]  # IoU 0 vs gt
    acc.add_image([gt[0], far[0]], [0, 0], [0.9, 0.8], gt, [0])
    acc.add_image([gt[0]], [0], [0.7], gt, [0])
    aps, mean_ap = acc.compute()
    np.testing.assert_allclose(aps[0], 5.0 / 6.0, rtol=1e-12)
    np.testing.assert_allclose(mean_ap, 5.0 / 6.0, rtol=1e-12)


def test_coco_map_iou_bucketing():
    """A single pred at IoU exactly 0.75 vs its gt is a TP at thresholds
    .50–.70 (strict >) and a FP at .75–.95 → AP 1.0 at five thresholds,
    0.0 at five → mAP@[.5:.95] = 0.5, mAP@0.5 = 1.0."""
    from yolov3_tpu.eval.detections_evaluator import CocoAPAccumulator

    acc = CocoAPAccumulator(1)
    gt = [[0.0, 0.0, 1.0, 1.0]]
    pred = [[0.0, 0.0, 1.0, 0.75]]  # inter .75, union 1 → IoU .75
    acc.add_image(pred, [0], [0.9], gt, [0])
    aps, map5095, map50 = acc.compute()
    np.testing.assert_allclose(map50, 1.0)
    np.testing.assert_allclose(map5095, 0.5)
    np.testing.assert_allclose(aps[0], 0.5)
