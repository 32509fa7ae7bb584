import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tpu.ops.augment import augment_batch
from yolov3_tpu.ops.image import letterbox_resize as jnp_letterbox, resize_bilinear as jnp_resize
from yolov3_tpu.data.image import letterbox_resize as np_letterbox, resize_bilinear as np_resize


def test_device_resize_matches_host():
    rng = np.random.RandomState(0)
    img = rng.rand(100, 150, 3).astype(np.float32)
    a = np.asarray(jnp_resize(jnp.asarray(img), 64, 64))
    b = np_resize(img, 64, 64)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_device_letterbox_matches_host():
    rng = np.random.RandomState(1)
    img = rng.rand(123, 77, 3).astype(np.float32)
    a = np.asarray(jnp_letterbox(jnp.asarray(img), 96, 96))
    b = np_letterbox(img, 96, 96)
    np.testing.assert_allclose(a, b, atol=1e-4)


def _batch(rng, b=4):
    images = rng.rand(b, 64, 64, 3).astype(np.float32)
    labels = np.zeros((b, 10, 6), np.float32)
    labels[:, 0] = [0.2, 0.3, 0.5, 0.6, 1, 1]
    labels[:, 1] = [0.6, 0.1, 0.9, 0.35, 1, 2]
    return jnp.asarray(images), jnp.asarray(labels)


def test_augment_shapes_and_ranges():
    images, labels = _batch(np.random.RandomState(0))
    out_img, out_lab = augment_batch(images, labels, jax.random.PRNGKey(0))
    assert out_img.shape == images.shape and out_lab.shape == labels.shape
    out_img, out_lab = np.asarray(out_img), np.asarray(out_lab)
    assert out_img.min() >= 0 and out_img.max() <= 1
    # boxes stay normalized, padded rows stay zero
    assert np.all(out_lab[:, :, :4] >= 0) and np.all(out_lab[:, :, :4] <= 1)
    assert np.all(out_lab[:, 2:, :] == 0)


def test_flip_only_mirrors_boxes():
    images, labels = _batch(np.random.RandomState(1), b=32)
    out_img, out_lab = augment_batch(images, labels, jax.random.PRNGKey(1),
                                     scale_jitter=0.0, brightness=0.0, contrast=0.0)
    out_img, out_lab = np.asarray(out_img), np.asarray(out_lab)
    flipped = ~np.isclose(out_lab[:, 0, 0], 0.2)
    assert flipped.any() and (~flipped).any()  # both branches exercised
    for i in range(32):
        if flipped[i]:
            np.testing.assert_allclose(out_lab[i, 0, :4], [0.5, 0.3, 0.8, 0.6], rtol=1e-5)
            np.testing.assert_allclose(out_img[i], np.asarray(images)[i, :, ::-1], rtol=1e-6)
        else:
            np.testing.assert_allclose(out_lab[i, 0, :4], [0.2, 0.3, 0.5, 0.6], rtol=1e-5)


def test_augment_deterministic():
    images, labels = _batch(np.random.RandomState(2))
    a = augment_batch(images, labels, jax.random.PRNGKey(7))
    b = augment_batch(images, labels, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_coco_ap_accumulator():
    from yolov3_tpu.eval.detections_evaluator import CocoAPAccumulator

    acc = CocoAPAccumulator(1)
    for _ in range(3):
        acc.add_image([[0.1, 0.1, 0.5, 0.5]], [0], [0.9], [[0.1, 0.1, 0.5, 0.5]], [0])
    aps, map5095, map50 = acc.compute()
    np.testing.assert_allclose(map5095, 1.0)
    np.testing.assert_allclose(map50, 1.0)


def test_mosaic_composites_pixels_and_boxes():
    """mosaic=1.0: each output is an exact 4-quadrant partition of its
    batch neighbors (constant-color sources ⇒ exactly 4 pixel values, no
    gaps/overlaps), boxes keep class identity and total box area is
    conserved at 1/4 (each source shrinks by its quadrant's area; the
    quadrants tile the canvas)."""
    colors = [0.1, 0.3, 0.6, 0.9]
    images = np.stack([np.full((64, 64, 3), c, np.float32) for c in colors])
    labels = np.zeros((4, 10, 6), np.float32)
    for i in range(4):
        labels[i, 0] = [0.25, 0.25, 0.75, 0.75, 1, i % 3]
    out_img, out_lab = augment_batch(
        jnp.asarray(images), jnp.asarray(labels), jax.random.PRNGKey(0),
        flip=False, scale_jitter=0.0, brightness=0.0, contrast=0.0, mosaic=1.0)
    out_img, out_lab = np.asarray(out_img), np.asarray(out_lab)
    for i in range(4):
        vals = np.unique(out_img[i].round(5))
        np.testing.assert_allclose(vals, colors, atol=1e-5)  # exact partition, no zeros
        valid = out_lab[i][:, 4] > 0
        assert valid.sum() == 4
        b = out_lab[i][valid]
        assert (b[:, :4] >= 0).all() and (b[:, :4] <= 1).all()
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
        expected = sorted(float(labels[(i + k) % 4, 0, 5]) for k in range(4))
        assert sorted(b[:, 5].tolist()) == expected
        area = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])).sum()
        # source box covers 1/4 of its image; quadrants tile the canvas
        assert abs(area - 0.25) < 1e-5


def test_mosaic_prob_zero_is_identity():
    images, labels = _batch(np.random.RandomState(3))
    out_img, out_lab = augment_batch(
        images, labels, jax.random.PRNGKey(3), flip=False, scale_jitter=0.0,
        brightness=0.0, contrast=0.0, mosaic=0.0)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(images))
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(labels))


def test_mosaic_box_overflow_truncates_to_slots():
    """4 sources × 2 boxes = 8 candidates into 3 label slots: the first 3
    valid survive (stable validity sort), all slots valid."""
    rng = np.random.RandomState(4)
    images = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    labels = np.zeros((4, 3, 6), np.float32)
    labels[:, 0] = [0.1, 0.1, 0.4, 0.4, 1, 0]
    labels[:, 1] = [0.5, 0.5, 0.9, 0.9, 1, 1]
    out_img, out_lab = augment_batch(
        jnp.asarray(images), jnp.asarray(labels), jax.random.PRNGKey(4),
        flip=False, scale_jitter=0.0, brightness=0.0, contrast=0.0, mosaic=1.0)
    out_lab = np.asarray(out_lab)
    assert (out_lab[:, :, 4] == 1).all()  # every slot filled with a real box


def test_letterbox_unmap_boxes_inverse():
    """letterbox_unmap_boxes inverts the letterbox placement: map a box
    from the original frame INTO the letterboxed frame with the same
    scaled-dims/offset math, unmap it, and recover the original."""
    from yolov3_tpu.data.image import letterbox_scaled_dims, letterbox_unmap_boxes

    rng = np.random.RandomState(0)
    S = 96
    for (h, w) in [(200, 320), (127, 64), (96, 96), (640, 427)]:
        nh, nw = letterbox_scaled_dims(h, w, S, S)
        top, left = (S - nh) // 2, (S - nw) // 2
        boxes = rng.rand(8, 4).astype(np.float32)
        boxes = np.sort(boxes.reshape(8, 2, 2), axis=1).reshape(8, 4)  # x1<x2, y1<y2
        fwd = np.empty_like(boxes)
        fwd[:, 0::2] = (left + boxes[:, 0::2] * nw) / S
        fwd[:, 1::2] = (top + boxes[:, 1::2] * nh) / S
        back = letterbox_unmap_boxes(fwd, h, w, S, S)
        np.testing.assert_allclose(back, boxes, atol=1e-5)


def test_hsv_conversion_matches_colorsys():
    """rgb_to_hsv / hsv_to_rgb match python's colorsys on random pixels
    and round-trip to the original RGB."""
    import colorsys

    from yolov3_tpu.ops.augment import hsv_to_rgb, rgb_to_hsv

    rng = np.random.RandomState(0)
    rgb = rng.rand(64, 3).astype(np.float32)
    rgb[:8] = np.round(rgb[:8])  # hit the degenerate corners (c == 0 etc.)
    hsv = np.asarray(rgb_to_hsv(jnp.asarray(rgb)))
    want = np.array([colorsys.rgb_to_hsv(*p) for p in rgb], np.float32)
    np.testing.assert_allclose(hsv, want, atol=1e-5)
    back = np.asarray(hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_hsv_jitter_in_augment_batch():
    """hue/saturation/exposure keys: disabled = identity; enabled changes
    pixels, keeps [0,1] range and shapes, leaves labels untouched."""
    images, labels = _batch(np.random.RandomState(5))
    out_img, out_lab = augment_batch(
        images, labels, jax.random.PRNGKey(5), flip=False, scale_jitter=0.0,
        brightness=0.0, contrast=0.0, hue=0.0, saturation=0.0, exposure=0.0)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(images))

    out_img, out_lab = augment_batch(
        images, labels, jax.random.PRNGKey(5), flip=False, scale_jitter=0.0,
        brightness=0.0, contrast=0.0, hue=0.1, saturation=1.5, exposure=1.5)
    out_img = np.asarray(out_img)
    assert out_img.shape == images.shape
    assert out_img.min() >= 0 and out_img.max() <= 1 + 1e-6
    assert not np.allclose(out_img, np.asarray(images))
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(labels))


def test_hsv_scale_bounds_below_one_rejected():
    import pytest

    images, labels = _batch(np.random.RandomState(6))
    with pytest.raises(ValueError, match="scale BOUND"):
        augment_batch(images, labels, jax.random.PRNGKey(6), saturation=0.5)
