"""Grid-scatter target assignment — fixed-shape, fully on device.

Re-designs the reference's tf.data-side assigner
(core/preprocess_dataset.py:35-92) as a static-shape jnp transform that
runs *inside* the jitted train step (the reference runs it per-batch on CPU
threads; on TPU a masked scatter is a single fused XLA op).

Semantics parity:
  * best anchor per box = argmax of width/height-only IoU against all 9
    anchors flattened (preprocess_dataset.py:35-48);
  * anchor-within-scale = best % 3; owning scale = best // 3 (equivalent to
    the reference's histogram_fixed_width_bins over [0, 9) with 3 bins,
    preprocess_dataset.py:64,70-76);
  * cell = floor(center_xy * grid), scattered at [batch, row, col, anchor]
    with the raw label row [xmin,ymin,xmax,ymax,obj,cls]
    (preprocess_dataset.py:19-33,89-90);
  * boxes not owned by the scale, or with obj == 0, are masked off — here
    by scattering them into a dump slot that is sliced away (no boolean
    masking → no dynamic shapes).

Divergence (documented): cell indices are clipped to [0, grid-1]; a box
center at exactly 1.0 would make the reference's scatter fail. When two
boxes map to the same (cell, anchor) slot the LAST label row wins,
deterministically (the reference's tensor_scatter_nd_update leaves
duplicate-index order unspecified).
"""

from __future__ import annotations

import jax.numpy as jnp


def best_anchor_indices(labels, anchors_table):
    """Width/height-only IoU argmax over all anchors.

    labels: (..., M, 6) rows [xmin,ymin,xmax,ymax,obj,cls].
    anchors_table: (S, 3, 2) → flattened to (S*3, 2).
    Returns (..., M) int32 in [0, S*3).
    """
    anchors = jnp.asarray(anchors_table, jnp.float32).reshape(-1, 2)
    anchor_area = anchors[:, 0] * anchors[:, 1]
    box_wh = labels[..., 2:4] - labels[..., 0:2]  # (..., M, 2)
    box_wh = box_wh[..., None, :]  # (..., M, 1, 2)
    box_area = box_wh[..., 0] * box_wh[..., 1]
    inter = jnp.minimum(box_wh[..., 0], anchors[:, 0]) * jnp.minimum(
        box_wh[..., 1], anchors[:, 1]
    )
    iou = inter / (box_area + anchor_area - inter)
    return jnp.argmax(iou, axis=-1).astype(jnp.int32)


def assign_targets(labels, anchors_table, grid_sizes):
    """Scatter padded label rows into per-scale dense target cubes.

    Args:
      labels: (B, M, 6) float — padded rows are all-zero (obj == 0).
      anchors_table: (S, 3, 2) normalized anchors, scale 0 ↔ 13-grid head.
      grid_sizes: static sequence of S grid sizes, model output order.

    Returns: tuple of S arrays (B, g, g, 3, 6).
    """
    labels = labels.astype(jnp.float32)
    b, m, f = labels.shape
    best = best_anchor_indices(labels, anchors_table)  # (B, M)
    anchor_in_scale = best % 3
    owner_scale = best // 3
    obj_ok = labels[..., 4] != 0

    center = (labels[..., 0:2] + labels[..., 2:4]) / 2.0  # (B, M, 2) as (x, y)
    batch_idx = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, m))

    grids = []
    for s, g in enumerate(grid_sizes):
        g = int(g)
        row = jnp.clip((center[..., 1] * g).astype(jnp.int32), 0, g - 1)
        col = jnp.clip((center[..., 0] * g).astype(jnp.int32), 0, g - 1)
        valid = obj_ok & (owner_scale == s)

        flat_idx = ((batch_idx * g + row) * g + col) * 3 + anchor_in_scale
        dump = b * g * g * 3  # one-past-the-end dump slot for masked boxes
        flat_idx = jnp.where(valid, flat_idx, dump)

        # Deterministic duplicate resolution: when two boxes land on the
        # same (cell, anchor) slot, a direct .at[].set scatter would leave
        # XLA free to pick either (nondeterministic across runs/backends).
        # Scatter-max of the box ORDER instead (max is order-independent),
        # then gather the winning row — the highest label index wins, i.e.
        # TF's documented tensor_scatter_nd_update "last update wins".
        flat = flat_idx.reshape(-1)
        winner = jnp.full((b * g * g * 3 + 1,), -1, jnp.int32).at[flat].max(
            jnp.arange(b * m, dtype=jnp.int32))
        rows = jnp.where(winner[:, None] >= 0,
                         labels.reshape(-1, f)[jnp.maximum(winner, 0)], 0.0)
        grids.append(rows[:-1].reshape(b, g, g, 3, f))
    return tuple(grids)
