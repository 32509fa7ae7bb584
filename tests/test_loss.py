import jax.numpy as jnp
import numpy as np

from yolov3_tpu.ops.assign import assign_targets
from yolov3_tpu.ops.loss import yolo_loss_terms

ANCHORS = np.array([[0.2, 0.2], [0.4, 0.4], [0.8, 0.8]], np.float32)


def test_empty_targets_only_obj_term():
    """With no gt boxes, xy/wh/class terms are zero; obj BCE covers ALL
    cells (the reference's no-ignore-mask deviation, loss_func.py:58-59)."""
    y_true = np.zeros((2, 13, 13, 3, 6), np.float32)
    y_pred = np.zeros((2, 13, 13, 3, 11), np.float32)
    terms = np.asarray(yolo_loss_terms(jnp.asarray(y_true), jnp.asarray(y_pred), ANCHORS, 6))
    assert terms[0] == 0 and terms[1] == 0 and terms[3] == 0
    # sigmoid(0)=0.5 → BCE = -log(0.5) per cell.
    # rtol accounts for XLA CPU's approximate log (~1e-5 rel); exact on TPU
    expected = 2 * 13 * 13 * 3 * (-np.log(0.5))
    np.testing.assert_allclose(terms[2], expected, rtol=1e-4)


def test_perfect_prediction_low_loss():
    """Predictions constructed to invert the target transform give ~zero
    xy/wh loss."""
    g = 13
    labels = np.zeros((1, 5, 6), np.float32)
    labels[0, 0] = [0.4, 0.4, 0.6, 0.6, 1, 2]  # wh=(0.2,0.2) → anchor 0 of this scale
    grids = assign_targets(jnp.asarray(labels), ANCHORS.reshape(1, 3, 2), (g,))
    y_true = np.asarray(grids[0])

    y_pred = np.zeros((1, g, g, 3, 5 + 6), np.float32)
    idx = np.argwhere(y_true[..., 4] == 1)[0]
    b, row, col, a = idx
    cx, cy = 0.5, 0.5
    # xy logits: sigmoid^-1(cell offset)
    ox, oy = cx * g - col, cy * g - row
    y_pred[b, row, col, a, 0] = np.log(ox / (1 - ox))
    y_pred[b, row, col, a, 1] = np.log(oy / (1 - oy))
    # wh logits: log(wh / anchor)
    y_pred[b, row, col, a, 2] = np.log(0.2 / ANCHORS[a, 0])
    y_pred[b, row, col, a, 3] = np.log(0.2 / ANCHORS[a, 1])

    terms = np.asarray(yolo_loss_terms(jnp.asarray(y_true), jnp.asarray(y_pred), ANCHORS, 6))
    assert terms[0] < 1e-8 and terms[1] < 1e-8


def test_class_term_uses_renormalized_sigmoid():
    """Keras sparse CE over sigmoid probs re-normalizes internally —
    uniform logits give log(nclasses)."""
    nclasses = 6
    y_true = np.zeros((1, 1, 1, 3, 6), np.float32)
    y_true[0, 0, 0, 0] = [0.4, 0.4, 0.6, 0.6, 1, 3]
    y_pred = np.zeros((1, 1, 1, 3, 5 + nclasses), np.float32)
    terms = np.asarray(yolo_loss_terms(jnp.asarray(y_true), jnp.asarray(y_pred), ANCHORS, nclasses))
    # rtol accounts for XLA CPU's approximate log (~3.5e-5 rel); exact on TPU
    np.testing.assert_allclose(terms[3], np.log(nclasses), rtol=1e-4)
