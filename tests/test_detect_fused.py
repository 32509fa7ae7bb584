"""Fused detect path ≡ decode ∘ nms ∘ gather (cross-implementation check)."""

import jax.numpy as jnp
import numpy as np

from yolov3_tpu.ops.decode import yolo_decode
from yolov3_tpu.ops.detect import detect
from yolov3_tpu.ops.nms import yolo_nms, gather_detections

ANCHORS = np.array([[[0.1, 0.1], [0.3, 0.3], [0.6, 0.6]],
                    [[0.05, 0.05], [0.15, 0.15], [0.25, 0.25]]], np.float32)


def test_fused_detect_matches_classic_pipeline():
    rng = np.random.RandomState(0)
    nclasses = 7
    outs = [jnp.asarray(rng.randn(2, g, g, 3, 5 + nclasses).astype(np.float32))
            for g in (7, 14)]
    args = dict(max_boxes=20, iou_threshold=0.5, score_threshold=0.3, num_candidates=64)

    boxes, conf, probs = yolo_decode(outs, ANCHORS, nclasses)
    nms_out = yolo_nms(boxes, conf, probs, **args)
    db, dc, ds_, v = map(np.asarray, gather_detections(*nms_out))

    fb, fc, fs, fv = map(np.asarray, detect(outs, ANCHORS, nclasses, **args))

    np.testing.assert_array_equal(v, fv)
    for b in range(2):
        n = int(v[b].sum())
        np.testing.assert_allclose(db[b][:n], fb[b][:n], atol=1e-5)
        np.testing.assert_array_equal(dc[b][:n], fc[b][:n])
        np.testing.assert_allclose(ds_[b][:n], fs[b][:n], atol=1e-6)
