"""Pallas NMS suppression-sweep kernel parity (interpret mode on CPU)."""

import numpy as np
import pytest

from yolov3_tpu.ops.pallas.nms_kernel import pallas_suppression_sweep, reference_sweep


def _case(rng, b=2, k=16):
    iou = rng.rand(b, k, k).astype(np.float32)
    iou = (iou + iou.transpose(0, 2, 1)) / 2
    mat = (iou > 0.6).astype(np.float32)
    valid = (rng.rand(b, k) > 0.3).astype(np.float32)
    return mat, valid


def test_kernel_matches_reference_sweep():
    rng = np.random.RandomState(0)
    mat, valid = _case(rng)
    keep_ref = np.asarray(reference_sweep(mat, valid))
    keep_pl = np.asarray(pallas_suppression_sweep(mat, valid, interpret=True))
    np.testing.assert_array_equal(keep_ref, keep_pl)


def test_kernel_greedy_semantics():
    # box0 suppresses box1; box2 independent; box3 invalid
    k = 16
    mat = np.zeros((1, k, k), np.float32)
    mat[0, 0, 1] = mat[0, 1, 0] = 1.0
    valid = np.zeros((1, k), np.float32)
    valid[0, :4] = [1, 1, 1, 0]
    keep = np.asarray(pallas_suppression_sweep(mat, valid, interpret=True))
    assert keep[0, 0] == 1 and keep[0, 1] == 0 and keep[0, 2] == 1 and keep[0, 3] == 0


def test_rejects_unaligned_k_compiled():
    with pytest.raises(ValueError):
        pallas_suppression_sweep(np.zeros((1, 100, 100)), np.zeros((1, 100)), interpret=False)
