"""YOLO head decoding: raw grid logits → (boxes, confidence, class probs).

Matches reference core/yolo_decode_layer.py:15-36 semantics:
  * sigmoid on xy / objectness / class logits;
  * box center = (sigmoid(xy) + cell offset) / grid_size;
  * box wh = exp(wh_logits) * anchors (anchors normalized to image coords,
    anchors_table[i] pairs with head output i — 13-grid first);
  * boxes flattened per scale to (B, g*g*3, 4) and concatenated over scales
    in model output order, corner format (xmin, ymin, xmax, ymax).

Pure jnp; fuses into the surrounding jit (no HBM round-trip between the
conv stack and decode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def yolo_decode(model_output_grids, anchors_table, nclasses: int):
    """Decode all scales.

    Args:
      model_output_grids: list of (B, g, g, 3, 5+nc) raw head outputs.
      anchors_table: array-like (nscales, 3, 2), normalized (w, h).
      nclasses: number of classes.

    Returns:
      bboxes (B, N, 4) xyxy; confidence (B, N, 1); class_probs (B, N, nc),
      N = Σ g*g*3 across scales.
    """
    all_boxes, all_conf, all_probs = [], [], []
    for grid_out, anchors in zip(model_output_grids, jnp.asarray(anchors_table, jnp.float32)):
        b, gh, gw, na, _ = grid_out.shape
        xy_l, wh_l, obj_l, cls_l = jnp.split(grid_out.astype(jnp.float32), [2, 4, 5], axis=-1)
        xy = jax.nn.sigmoid(xy_l)
        conf = jax.nn.sigmoid(obj_l)
        probs = jax.nn.sigmoid(cls_l)

        # cell offsets: grid[i, j] = (x=j, y=i), like tf.meshgrid(range, range)
        col = lax.broadcasted_iota(jnp.float32, (gh, gw), 1)
        row = lax.broadcasted_iota(jnp.float32, (gh, gw), 0)
        offsets = jnp.stack([col, row], axis=-1)[None, :, :, None, :]  # (1,g,g,1,2)

        grid_dims = jnp.asarray([gw, gh], jnp.float32)
        center = (xy + offsets) / grid_dims
        wh = jnp.exp(wh_l) * anchors  # (3,2) broadcasts over (B,g,g,3,2)
        boxes = jnp.concatenate([center - wh / 2.0, center + wh / 2.0], axis=-1)

        all_boxes.append(boxes.reshape(b, -1, 4))
        all_conf.append(conf.reshape(b, -1, 1))
        all_probs.append(probs.reshape(b, -1, nclasses))

    return (
        jnp.concatenate(all_boxes, axis=1),
        jnp.concatenate(all_conf, axis=1),
        jnp.concatenate(all_probs, axis=1),
    )
