"""Composite 4-term YOLO loss — exact math parity with the reference.

Reference core/loss_func.py:19-69, including its (documented) deviations
from canonical YOLOv3:
  * objectness BCE over *all* cells — no noobj ignore-mask / best-IoU
    threshold (loss_func.py:58-59);
  * class loss = sparse categorical CE over *sigmoid'd* class probs —
    Keras re-normalizes probabilities inside the CE, i.e.
    -log(softmax(log(clip(sigmoid(x))))) (loss_func.py:61-63);
  * xy/wh are obj-masked scaled L2 with the 2 - w*h small-box upweight
    (loss_func.py:37,50-56);
  * wh target = log(wh / anchors) with inf → 0 (loss_func.py:44-46).

Keras epsilon clipping (1e-7) in both CE terms is reproduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

KERAS_EPSILON = 1e-7


def yolo_loss_terms(y_true, y_pred, anchors, nclasses: int):
    """Per-scale loss terms.

    Args:
      y_true: (B, g, g, 3, 6) grid targets — rows [xmin,ymin,xmax,ymax,obj,cls]
        (raw label rows scattered by the assigner).
      y_pred: (B, g, g, 3, 5+nc) raw head logits.
      anchors: (3, 2) normalized anchors for this scale.

    Returns jnp array [xy_loss, wh_loss, obj_loss, class_loss] (sums over
    the whole batch — division by batch size is the caller's business,
    matching reference train.py:44).
    """
    y_pred = y_pred.astype(jnp.float32)
    y_true = y_true.astype(jnp.float32)
    anchors = jnp.asarray(anchors, jnp.float32)

    pred_xy_l, pred_wh, pred_obj_l, pred_cls_l = jnp.split(y_pred, [2, 4, 5], axis=-1)
    pred_xy = jax.nn.sigmoid(pred_xy_l)
    pred_obj = jax.nn.sigmoid(pred_obj_l)
    pred_class = jax.nn.sigmoid(pred_cls_l)

    true_box, true_obj, true_class_idx = jnp.split(y_true, [4, 5], axis=-1)
    true_xy = (true_box[..., 0:2] + true_box[..., 2:4]) / 2.0
    true_wh = true_box[..., 2:4] - true_box[..., 0:2]

    # small-box upweight (loss_func.py:37)
    box_loss_scale = 2.0 - true_wh[..., 0] * true_wh[..., 1]

    g = y_true.shape[1]
    # tf.meshgrid(range(g), range(g)) stacked → grid[i,j] = (x=j, y=i)
    col = lax.broadcasted_iota(jnp.float32, (g, g), 1)
    row = lax.broadcasted_iota(jnp.float32, (g, g), 0)
    offsets = jnp.stack([col, row], axis=-1)[None, :, :, None, :]
    true_xy = true_xy * g - offsets

    true_wh = jnp.log(true_wh / anchors)
    true_wh = jnp.where(jnp.isinf(true_wh), jnp.zeros_like(true_wh), true_wh)
    # guard NaNs from log(0/anchor) on padded rows too (TF yields -inf → 0;
    # 0/0 would be NaN — padded rows have wh = 0 so log(0) = -inf → 0)
    true_wh = jnp.where(jnp.isnan(true_wh), jnp.zeros_like(true_wh), true_wh)

    obj_mask = true_obj[..., 0]

    xy_loss = obj_mask * box_loss_scale * jnp.sum(jnp.square(true_xy - pred_xy), axis=-1)
    xy_loss = jnp.sum(xy_loss)

    wh_loss = obj_mask * box_loss_scale * jnp.sum(jnp.square(true_wh - pred_wh), axis=-1)
    wh_loss = jnp.sum(wh_loss)

    # Keras binary_crossentropy(from_logits=False): clip then mean over last axis
    p = jnp.clip(pred_obj, KERAS_EPSILON, 1.0 - KERAS_EPSILON)
    bce = -(true_obj * jnp.log(p) + (1.0 - true_obj) * jnp.log(1.0 - p))
    obj_loss = jnp.sum(jnp.mean(bce, axis=-1))

    # Keras sparse_categorical_crossentropy over probabilities:
    # logits := log(clip(p)); loss = logsumexp(logits) - logits[class].
    # Manual stable logsumexp (max + log-sum-exp) — matches TF's
    # sparse_softmax_cross_entropy numerics more tightly than
    # jax.nn.logsumexp's formulation.
    logp = jnp.log(jnp.clip(pred_class, KERAS_EPSILON, 1.0 - KERAS_EPSILON))
    m = jnp.max(logp, axis=-1, keepdims=True)
    lse = (m + jnp.log(jnp.sum(jnp.exp(logp - m), axis=-1, keepdims=True)))[..., 0]
    cls_idx = true_class_idx[..., 0].astype(jnp.int32)
    # one-hot masked reduce instead of take_along_axis: a gather over the
    # (B,g,g,3,nc) tensor costs ~17 ms/step on the 52-grid alone (TPU
    # gathers don't vectorize); the == mask + sum fuses into the logp
    # fusion. Identical values — cls_idx ∈ [0, nc) one-hot-selects.
    class_ids = lax.broadcasted_iota(jnp.int32, logp.shape, logp.ndim - 1)
    picked = jnp.sum(jnp.where(class_ids == cls_idx[..., None], logp, 0.0), axis=-1)
    class_loss = obj_mask * (lse - picked)
    class_loss = jnp.sum(class_loss)

    return jnp.stack([xy_loss, wh_loss, obj_loss, class_loss])


def make_loss_fn(anchors_table, nclasses: int):
    """Returns loss(y_true_grids, y_pred_grids) → (nscales, 4) term matrix.

    anchors_table[i] pairs with head output i (13-grid first), matching the
    closure construction in reference train.py:170-171.
    """
    anchors_table = jnp.asarray(anchors_table, jnp.float32)

    def loss_fn(y_true_grids, y_pred_grids):
        terms = [
            yolo_loss_terms(t, p, anchors_table[i], nclasses)
            for i, (t, p) in enumerate(zip(y_true_grids, y_pred_grids))
        ]
        return jnp.stack(terms)  # (nscales, 4)

    return loss_fn
