"""Device-side training augmentation — new capability (the reference's DSL
carries a ``jitter`` field it never uses; there is no augmentation anywhere
in the reference).

All transforms are static-shape jnp ops designed to run *inside* the jitted
train step, keyed off the step counter — zero host work, identical cost on
every step, and deterministic given the seed:

  * random horizontal flip (boxes mirrored);
  * random scale-and-shift ("zoom out" letterbox jitter): the image is
    resized by s ∈ [1-jitter, 1] and placed at a random offset on a gray
    canvas, boxes transformed accordingly — fixed output shape;
  * brightness / contrast jitter;
  * mosaic (YOLOv4-style 4-image composite): output image i is built from
    batch images i..i+3 (wrapping) warped into the four quadrants of a
    random center point — done with reverse-warp gathers so every shape
    stays static; the 4 sources' boxes concatenate and the first
    ``max_boxes`` valid ones are kept (fixed label shape).

Each transform draws its own randomness per image (vmapped); mosaic runs
first (its sources are the un-augmented neighbors), then flip/scale/color
apply per composite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _flip_image_boxes(img, labels, do_flip):
    flipped = jnp.where(do_flip, img[:, ::-1, :], img)
    xmin, ymin, xmax, ymax, rest = (
        labels[:, 0], labels[:, 1], labels[:, 2], labels[:, 3], labels[:, 4:]
    )
    fx_min = jnp.where(do_flip & (labels[:, 4] > 0), 1.0 - xmax, xmin)
    fx_max = jnp.where(do_flip & (labels[:, 4] > 0), 1.0 - xmin, xmax)
    new_labels = jnp.concatenate(
        [fx_min[:, None], ymin[:, None], fx_max[:, None], ymax[:, None], rest], axis=1
    )
    return flipped, new_labels


def _scale_shift(img, labels, scale, ox, oy, fill=0.5):
    """Shrink image by `scale` and place at normalized offset (ox, oy) on a
    same-size canvas — implemented as a single gather (reverse warp), so
    shapes stay static for any traced scale/offset."""
    h, w, _ = img.shape
    ys = (jnp.arange(h) / h - oy) / scale  # canvas row → source row (normalized)
    xs = (jnp.arange(w) / w - ox) / scale
    yi = jnp.clip((ys * h), 0, h - 1)
    xi = jnp.clip((xs * w), 0, w - 1)
    valid_y = (ys >= 0) & (ys < 1.0)
    valid_x = (xs >= 0) & (xs < 1.0)
    gathered = img[yi.astype(jnp.int32)][:, xi.astype(jnp.int32)]
    mask = (valid_y[:, None] & valid_x[None, :])[..., None]
    out = jnp.where(mask, gathered, jnp.asarray(fill, img.dtype))

    obj = labels[:, 4:5]
    boxes = labels[:, :4] * scale + jnp.asarray([ox, oy, ox, oy])
    boxes = jnp.clip(boxes, 0.0, 1.0) * obj  # padded rows stay zero
    return out, jnp.concatenate([boxes, labels[:, 4:]], axis=1)


def _warp_into_rect(img, labels, x0, x1, y0, y1):
    """Reverse-warp ``img`` so it exactly fills the normalized canvas rect
    [x0,x1]×[y0,y1] (zeros outside); boxes map affinely. Same
    nearest-gather scheme as ``_scale_shift`` — static shapes for traced
    rect bounds."""
    h, w, _ = img.shape
    xs = (jnp.arange(w) / w - x0) / (x1 - x0)  # canvas col → source x (norm)
    ys = (jnp.arange(h) / h - y0) / (y1 - y0)
    xi = jnp.clip(xs * w, 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(ys * h, 0, h - 1).astype(jnp.int32)
    mask = ((ys >= 0) & (ys < 1.0))[:, None] & ((xs >= 0) & (xs < 1.0))[None, :]
    out = jnp.where(mask[..., None], img[yi][:, xi], 0.0)

    obj = labels[:, 4:5]
    scale = jnp.stack([x1 - x0, y1 - y0, x1 - x0, y1 - y0])
    offset = jnp.stack([x0, y0, x0, y0])
    boxes = (labels[:, :4] * scale + offset) * obj  # padded rows stay zero
    return out, jnp.concatenate([boxes, labels[:, 4:]], axis=1)


def _mosaic_batch(images, labels, key, prob):
    """Per-image Bernoulli(prob) choice between the 4-neighbor mosaic
    composite and the original. Sources wrap around the batch.

    Memory note: quadrants are composed SEQUENTIALLY over whole-batch
    rolls (canvas += warp(roll(images, -q))) rather than materializing a
    stacked (B, 4, H, W, 3) copy of the batch — peak extra HBM is ~2
    batch-sized arrays instead of 4, which matters at production batch ×
    resolution."""
    batch = images.shape[0]
    max_boxes = labels.shape[1]
    keys = jax.random.split(key, batch + 1)
    centers = jax.vmap(
        lambda k: jax.random.uniform(k, (2,), minval=0.3, maxval=0.7))(keys[1:])
    cx, cy = centers[:, 0], centers[:, 1]  # (B,), per output image
    zero, one = jnp.zeros_like(cx), jnp.ones_like(cx)
    rects = ((zero, cx, zero, cy), (cx, one, zero, cy),
             (zero, cx, cy, one), (cx, one, cy, one))

    canvas = jnp.zeros_like(images)
    parts = []
    warp = jax.vmap(_warp_into_rect)
    for q, (rx0, rx1, ry0, ry1) in enumerate(rects):
        warped, lab_q = warp(jnp.roll(images, -q, axis=0),
                             jnp.roll(labels, -q, axis=0), rx0, rx1, ry0, ry1)
        canvas = canvas + warped  # quadrant supports are disjoint
        parts.append(lab_q)
    lab_cat = jnp.concatenate(parts, axis=1)  # (B, 4M, 6)
    # keep the first M valid rows (stable sort on validity ⇒ source order)
    order = jnp.argsort(-lab_cat[..., 4], axis=1, stable=True)
    m_lab = jnp.take_along_axis(lab_cat, order[..., None], axis=1)[:, :max_boxes]

    take = jax.random.bernoulli(keys[0], prob, (batch,))
    return (jnp.where(take[:, None, None, None], canvas, images),
            jnp.where(take[:, None, None], m_lab, labels))


def _jitter_colors(img, key, brightness, contrast):
    kb, kc = jax.random.split(key)
    b = jax.random.uniform(kb, (), minval=-brightness, maxval=brightness)
    c = jax.random.uniform(kc, (), minval=1.0 - contrast, maxval=1.0 + contrast)
    mean = jnp.mean(img)
    return jnp.clip((img - mean) * c + mean + b, 0.0, 1.0)


def rgb_to_hsv(img):
    """(…, 3) RGB in [0,1] → HSV, colorsys-equivalent, vectorized."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    c = maxc - minc
    safe = jnp.where(c > 0, c, 1.0)
    rc, gc, bc = (maxc - r) / safe, (maxc - g) / safe, (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(c > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(maxc > 0, c / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(img):
    """(…, 3) HSV → RGB, colorsys-equivalent, vectorized."""
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    # branchless sextant pick. jnp.choose lowers to a dynamic GATHER,
    # which the TPU VPU executes near-serially — measured 714 ms/step for
    # the HSV jitter at B=64 416² (26× the augment-free step). An i==k
    # select chain is pure vectorized VPU work.
    def pick(c0, c1, c2, c3, c4, c5):
        out = c0
        for k, c in enumerate((c1, c2, c3, c4, c5), start=1):
            out = jnp.where(i == k, c, out)
        return out

    r = pick(v, q, p, p, t, v)
    g = pick(t, v, v, q, p, p)
    b = pick(p, p, t, v, v, q)
    return jnp.stack([r, g, b], axis=-1)


def _jitter_hsv(img, key, hue, saturation, exposure):
    """Darknet-style HSV jitter: hue shifts by dh ∈ [-hue, hue] (fraction
    of the wheel, wrapping); saturation and value scale log-uniformly in
    [1/s, s] (Darknet's rand_scale), clipped to [0, 1]."""
    kh, ks, kv = jax.random.split(key, 3)
    hsv = rgb_to_hsv(img)
    h = hsv[..., 0]
    s = hsv[..., 1]
    v = hsv[..., 2]
    if hue > 0:
        h = (h + jax.random.uniform(kh, (), minval=-hue, maxval=hue)) % 1.0
    if saturation > 1:
        ls = jnp.log(jnp.float32(saturation))
        s = jnp.clip(s * jnp.exp(jax.random.uniform(ks, (), minval=-ls, maxval=ls)),
                     0.0, 1.0)
    if exposure > 1:
        lv = jnp.log(jnp.float32(exposure))
        v = jnp.clip(v * jnp.exp(jax.random.uniform(kv, (), minval=-lv, maxval=lv)),
                     0.0, 1.0)
    return hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


@partial(jax.jit, static_argnames=("flip", "scale_jitter", "brightness",
                                   "contrast", "mosaic", "hue", "saturation",
                                   "exposure"))
def augment_batch(images, labels, rng_key, flip: bool = True,
                  scale_jitter: float = 0.25, brightness: float = 0.1,
                  contrast: float = 0.1, mosaic: float = 0.0,
                  hue: float = 0.0, saturation: float = 0.0,
                  exposure: float = 0.0):
    """Augment a batch on device. images (B,H,W,3) in [0,1]; labels (B,M,6).

    ``mosaic``: probability per image of replacing it with a 4-image
    composite of its batch neighbors (YOLOv4-style). Runs before the
    per-image transforms.
    ``hue``/``saturation``/``exposure``: Darknet-style HSV jitter — hue
    shift fraction (e.g. 0.1), saturation/value log-uniform SCALE BOUNDS
    > 1 (e.g. 1.5 → scales drawn from [1/1.5, 1.5], Darknet's rand_scale);
    0/unset disables each. Bounds in (0, 1] are rejected — a user writing
    ``saturation: 0.5`` by analogy with brightness would otherwise get a
    silent no-op.

    Returns (images, labels) with identical shapes.
    """
    for key_name, bound in (("saturation", saturation), ("exposure", exposure)):
        if 0 < bound <= 1:
            raise ValueError(
                f"{key_name} is a scale BOUND > 1 ({key_name}: 1.5 means "
                f"scales in [1/1.5, 1.5]); got {bound} — use 0 to disable")
    if mosaic > 0:
        km, rng_key = jax.random.split(rng_key)
        images, labels = _mosaic_batch(images, labels, km, float(mosaic))

    def one(img, lab, key):
        kf, ks, ko, kc, kh = jax.random.split(key, 5)
        if flip:
            img, lab = _flip_image_boxes(img, lab, jax.random.bernoulli(kf))
        if scale_jitter > 0:
            s = jax.random.uniform(ks, (), minval=1.0 - scale_jitter, maxval=1.0)
            omax = 1.0 - s
            ox, oy = jax.random.uniform(ko, (2,), minval=0.0, maxval=1.0) * omax
            img, lab = _scale_shift(img, lab, s, ox, oy)
        if hue > 0 or saturation > 1 or exposure > 1:
            img = _jitter_hsv(img, kh, hue, saturation, exposure)
        if brightness > 0 or contrast > 0:
            img = _jitter_colors(img, kc, brightness, contrast)
        return img, lab

    keys = jax.random.split(rng_key, images.shape[0])
    return jax.vmap(one)(images, labels, keys)
