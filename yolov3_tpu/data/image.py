"""Host-side image ops: decode (PIL) + TF-semantics resize in numpy.

``resize_bilinear`` reproduces tf.image.resize's default path (bilinear,
half_pixel_centers=True, antialias=False) so box/score outputs stay
comparable with the reference pipeline (load_tfrecords.py:44-46,
create_dataset_from_files.py:21-27). ``letterbox_resize`` reproduces
core/utils.py:17-28 (aspect-preserving resize + center pad-to-square).

A jnp twin of the resize lives in ops for device-side use
(jax.image.resize(..., antialias=False) has identical semantics).
"""

from __future__ import annotations

import io

import numpy as np


def decode_image(encoded: bytes) -> np.ndarray:
    """JPEG/PNG bytes → uint8 (H, W, 3)."""
    from PIL import Image

    img = Image.open(io.BytesIO(encoded))
    img = img.convert("RGB")
    return np.asarray(img, np.uint8)


def _resample_axis(src_len: int, dst_len: int):
    """Half-pixel bilinear gather indices/weights for one axis."""
    if dst_len == src_len:
        idx = np.arange(src_len)
        return idx, idx, np.zeros(src_len, np.float32)
    scale = src_len / dst_len
    coords = (np.arange(dst_len, dtype=np.float64) + 0.5) * scale - 0.5
    lo = np.floor(coords)
    frac = (coords - lo).astype(np.float32)
    lo = np.clip(lo, 0, src_len - 1).astype(np.int64)
    hi = np.clip(lo + 1, 0, src_len - 1)
    # clip fractional weight where coords < 0 (TF clamps the same way)
    frac = np.where(coords < 0, 0.0, frac).astype(np.float32)
    return lo, hi, frac


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W, C) float → (out_h, out_w, C) float; TF bilinear semantics."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    ylo, yhi, yf = _resample_axis(h, out_h)
    xlo, xhi, xf = _resample_axis(w, out_w)

    top = img[ylo]  # (out_h, W, C)
    bot = img[yhi]
    rows = top + (bot - top) * yf[:, None, None]
    left = rows[:, xlo]
    right = rows[:, xhi]
    return left + (right - left) * xf[None, :, None]


def letterbox_resize(img: np.ndarray, target_height: int, target_width: int) -> np.ndarray:
    """Aspect-preserving resize + center zero-pad (core/utils.py:17-28).

    tf.image.resize(preserve_aspect_ratio=True) picks the largest size ≤
    target preserving ratio: scale = min(th/h, tw/w), floor-rounded dims
    (at least 1).
    """
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    scale = min(target_height / h, target_width / w)
    nh = max(int(h * scale), 1)
    nw = max(int(w * scale), 1)
    resized = resize_bilinear(img, nh, nw)
    out = np.zeros((target_height, target_width, img.shape[2]), np.float32)
    top = (target_height - nh) // 2
    left = (target_width - nw) // 2
    out[top : top + nh, left : left + nw] = resized
    return out
