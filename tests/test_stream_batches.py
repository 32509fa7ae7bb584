"""Zero-copy batched streaming path (tfrecord.stream_batches) parity.

The fast path decodes each example straight into its slot of a
preallocated batch (no per-example buffers, no np.stack) — these tests
pin it BIT-IDENTICAL to the generic Batcher(Dataset(parse_tfrecords))
path for every combination that matters: plain order, reservoir shuffle
(same algorithm over raw records vs decoded examples), worker counts,
and drop-remainder behavior. Reference surface: tf.data's batch() over
load_tfrecords.py:77-101.
"""

import numpy as np
import pytest

from yolov3_tpu.data.pipeline import Batcher, Dataset, batched, create_dataset, shuffled
from yolov3_tpu.data.tfrecord import parse_tfrecords, stream_batches

TFDIR = "datasets/shapes_toy/tfrecords/train"
NAMES = "datasets/shapes_toy/class.names"
SIZE = 96
MAXB = 10


def _generic(batch_size, shuffle=None):
    ds = Dataset(lambda: parse_tfrecords(TFDIR, SIZE, MAXB, NAMES))
    if shuffle is not None:
        ds = shuffled(ds, shuffle[0], shuffle[1])
    return list(Batcher(ds, batch_size))


def _assert_streams_equal(fast, ref):
    assert len(fast) == len(ref)
    for (fi, fl), (ri, rl) in zip(fast, ref):
        np.testing.assert_array_equal(fi, ri)
        np.testing.assert_array_equal(fl, rl)


@pytest.mark.parametrize("workers", [1, 3])
def test_bitwise_equal_to_generic_path(workers):
    fast = list(stream_batches(TFDIR, SIZE, MAXB, 4, class_file=NAMES,
                               num_workers=workers))
    _assert_streams_equal(fast, _generic(4))
    assert fast, "toy fixture must produce at least one batch"
    assert fast[0][0].dtype == np.float32 and fast[0][0].shape == (4, SIZE, SIZE, 3)
    assert fast[0][1].shape == (4, MAXB, 6)


def test_shuffled_order_matches_example_level_shuffle():
    # reservoir shuffle over RAW records must reproduce the example-level
    # shuffle exactly: the swap sequence depends only on positions + RNG
    for seed in (7, 12345):
        fast = list(stream_batches(TFDIR, SIZE, MAXB, 4, class_file=NAMES,
                                   num_workers=2, shuffle=(5, seed)))
        _assert_streams_equal(fast, _generic(4, shuffle=(5, seed)))


def test_drop_remainder_matches():
    n = sum(1 for _ in parse_tfrecords(TFDIR, SIZE, MAXB, NAMES))
    batch = n - 1 if n > 1 else 1  # force a remainder
    fast = list(stream_batches(TFDIR, SIZE, MAXB, batch, class_file=NAMES))
    _assert_streams_equal(fast, _generic(batch))
    assert len(fast) == n // batch


def test_batched_uses_fast_path_for_tfrecords():
    cfg = {"input_data_source": "tfrecords",
           "tfrecords": {"train": TFDIR, "valid": TFDIR}}
    (ds_train, _), _ = create_dataset(cfg, SIZE, MAXB, NAMES)
    assert getattr(ds_train, "batched_factory", None) is not None
    # transformed views must drop the factory (semantics would diverge)
    assert getattr(ds_train.take(2), "batched_factory", None) is None
    assert getattr(ds_train.map(lambda i, l: (i, l)), "batched_factory", None) is None
    _assert_streams_equal(list(batched(ds_train, 4)), _generic(4))
    _assert_streams_equal(list(batched(ds_train, 4, shuffle_buffer=5, seed=3)),
                          _generic(4, shuffle=(5, 3)))


def test_batched_generic_fallback():
    def gen():
        for i in range(6):
            yield (np.full((4, 4, 3), i, np.float32),
                   np.zeros((MAXB, 6), np.float32))

    it = batched(Dataset(gen), 2, shuffle_buffer=3, seed=9)
    ref = list(Batcher(shuffled(Dataset(gen), 3, 9), 2))
    _assert_streams_equal(list(it), ref)


def test_decode_error_in_remainder_still_raises(tmp_path):
    # generic-path parity: the dropped remainder's examples go through
    # decode too, so a corrupt record there must still surface
    from yolov3_tpu.data.tfrecord import encode_example, write_tfrecord

    good = encode_example({
        "image/encoded": [_tiny_jpeg()],
        "image/object/bbox/xmin": [0.1], "image/object/bbox/ymin": [0.1],
        "image/object/bbox/xmax": [0.5], "image/object/bbox/ymax": [0.5],
        "image/object/class/text": ["a"],
    })
    bad = encode_example({"image/encoded": [b"not an image"]})
    write_tfrecord(str(tmp_path / "file_00.tfrec"), [good, good, bad])
    names = tmp_path / "class.names"
    names.write_text("a\n")
    with pytest.raises(Exception):
        list(stream_batches(str(tmp_path), SIZE, MAXB, 2,
                            class_file=str(names)))


def _tiny_jpeg():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (200, 30, 30)).save(buf, format="JPEG")
    return buf.getvalue()
