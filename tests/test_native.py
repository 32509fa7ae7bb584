"""Native (C++) data-loader core: parity vs the pure-Python paths."""

import io

import numpy as np
import pytest

from yolov3_tpu.data import native
from yolov3_tpu.data.tfrecord import crc32c as py_crc32c, encode_example, write_tfrecord

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native core not built (no compiler?)")


def test_crc32c_matches_python():
    rng = np.random.RandomState(0)
    for n in (0, 1, 7, 8, 9, 1000):
        data = rng.bytes(n)
        assert native.crc32c(data) == py_crc32c(data)


def test_scan_tfrecord_matches_python(tmp_path):
    path = str(tmp_path / "x.tfrec")
    records = [encode_example({"a": [float(i)]}) for i in range(5)]
    write_tfrecord(path, records)
    buf = open(path, "rb").read()
    spans = native.scan_tfrecord(buf)
    assert len(spans) == 5
    for (off, ln), rec in zip(spans, records):
        assert buf[off : off + ln] == rec


def test_scan_rejects_corruption(tmp_path):
    path = str(tmp_path / "bad.tfrec")
    write_tfrecord(path, [encode_example({"a": [1.0]})])
    raw = bytearray(open(path, "rb").read())
    raw[-5] ^= 0xFF
    with pytest.raises(IOError):
        native.scan_tfrecord(bytes(raw))


def test_scan_rejects_overflowing_length(tmp_path):
    """A corrupt 8-byte length near UINT64_MAX must be reported as
    truncation (-1), not wrap the bounds check into a wild read."""
    import struct

    path = str(tmp_path / "huge.tfrec")
    write_tfrecord(path, [encode_example({"a": [1.0]})])
    raw = bytearray(open(path, "rb").read())
    raw[0:8] = struct.pack("<Q", (1 << 64) - 20)  # pos+12+len+4 wraps
    with pytest.raises(IOError):
        native.scan_tfrecord(bytes(raw), validate=False)


def test_scan_chunked_loop_covers_all_records(tmp_path):
    """chunk_records smaller than the record count: the wrapper must loop
    and return every span (regression for silent >cap truncation)."""
    path = str(tmp_path / "many.tfrec")
    records = [encode_example({"a": [float(i)]}) for i in range(10)]
    write_tfrecord(path, records)
    buf = open(path, "rb").read()
    spans = native.scan_tfrecord(buf, chunk_records=3)
    assert len(spans) == 10
    for (off, ln), rec in zip(spans, records):
        assert buf[off : off + ln] == rec


def test_decode_resize_matches_python_path():
    from PIL import Image

    from yolov3_tpu.data.image import decode_image, resize_bilinear

    rng = np.random.RandomState(1)
    img = Image.fromarray((rng.rand(200, 333, 3) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    data = buf.getvalue()

    out_native = native.decode_resize_jpeg(data, 128, 128)
    assert out_native is not None and out_native.shape == (128, 128, 3)

    decoded = decode_image(data).astype(np.float32)
    out_py = resize_bilinear(decoded, 128, 128) / 255.0
    # both use libjpeg-family decoders; tolerance covers IDCT variants
    assert np.abs(out_native - out_py).max() < 6.0 / 255.0


def test_decode_resize_bad_data_returns_none():
    assert native.decode_resize_jpeg(b"\xff\xd8 garbage", 32, 32) is None
