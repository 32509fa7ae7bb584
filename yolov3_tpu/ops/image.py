"""Device-side image ops (jnp twins of data/image.py's host versions).

``resize_bilinear`` — jax.image.resize with antialias=False matches
tf.image.resize's default bilinear (half-pixel centers) and the numpy
implementation used host-side. ``letterbox_resize`` — aspect-preserving
resize + center pad (static shapes: the scale factor is computed from
static dims, so each (in, out) shape pair compiles once).

Use these to push preprocessing onto the chip (e.g. serving paths that
ship raw decoded frames to HBM and resize there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(img, out_h: int, out_w: int):
    """(…, H, W, C) → (…, out_h, out_w, C); TF default bilinear semantics."""
    shape = (*img.shape[:-3], out_h, out_w, img.shape[-1])
    return jax.image.resize(img, shape, method="bilinear", antialias=False)


def letterbox_resize(img, target_height: int, target_width: int):
    """Aspect-preserving resize + center zero-pad (core/utils.py:17-28
    semantics). img: (H, W, C) or (B, H, W, C) with static dims.

    Scaled dims use tf.image.resize's exact rounding (float32 scale,
    round-half-to-even) via the shared host helper — shapes are static, so
    this runs at trace time."""
    from yolov3_tpu.data.image import letterbox_scaled_dims

    h, w = img.shape[-3], img.shape[-2]
    nh, nw = letterbox_scaled_dims(h, w, target_height, target_width)
    resized = resize_bilinear(img, nh, nw)
    top = (target_height - nh) // 2
    left = (target_width - nw) // 2
    pad = [(0, 0)] * (img.ndim - 3) + [
        (top, target_height - nh - top),
        (left, target_width - nw - left),
        (0, 0),
    ]
    return jnp.pad(resized, pad)
