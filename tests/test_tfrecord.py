import numpy as np
import pytest

from yolov3_tpu.data.tfrecord import (
    decode_detection_example,
    encode_example,
    iter_tfrecord_records,
    parse_example,
    write_tfrecord,
)


def test_example_roundtrip(tmp_path):
    feats = {
        "image/encoded": [b"\x01\x02\x03"],
        "image/object/class/text": ["circle", "square"],
        "image/object/bbox/xmin": [0.1, 0.2],
        "image/object/bbox/ymin": [0.3, 0.4],
        "image/object/bbox/xmax": [0.5, 0.6],
        "image/object/bbox/ymax": [0.7, 0.8],
    }
    path = str(tmp_path / "a.tfrec")
    write_tfrecord(path, [encode_example(feats)])
    records = list(iter_tfrecord_records(path))
    assert len(records) == 1
    parsed = parse_example(records[0])
    assert parsed["image/encoded"] == [b"\x01\x02\x03"]
    assert parsed["image/object/class/text"] == [b"circle", b"square"]
    np.testing.assert_allclose(parsed["image/object/bbox/xmin"], [0.1, 0.2], rtol=1e-6)


def test_crc_validation(tmp_path):
    path = str(tmp_path / "bad.tfrec")
    write_tfrecord(path, [encode_example({"x": [1.0]})])
    raw = bytearray(open(path, "rb").read())
    raw[-5] ^= 0xFF  # corrupt payload
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(iter_tfrecord_records(path))


def test_decode_detection_example_padding():
    from yolov3_tpu.data.image import decode_image  # noqa: F401  (PIL presence)
    import io
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (64, 48), (255, 0, 0)).save(buf, format="JPEG")
    ex = parse_example(encode_example({
        "image/encoded": [buf.getvalue()],
        "image/object/class/text": ["b", "zzz"],
        "image/object/bbox/xmin": [0.1, 0.2],
        "image/object/bbox/ymin": [0.1, 0.2],
        "image/object/bbox/xmax": [0.3, 0.4],
        "image/object/bbox/ymax": [0.3, 0.4],
    }))
    img, labels = decode_detection_example(ex, 32, 10, {"a": 0, "b": 1})
    assert img.shape == (32, 32, 3) and labels.shape == (10, 6)
    assert labels[0, 5] == 1         # known class
    assert labels[1, 5] == -1        # unknown name → -1 (hash-table default parity)
    assert labels[2:].sum() == 0     # padded
    assert img.max() <= 1.0


def test_toy_dataset_reader(toy_dataset):
    from yolov3_tpu.data.tfrecord import parse_tfrecords

    exs = list(parse_tfrecords(f"{toy_dataset}/tfrecords/val", 128, 100,
                               f"{toy_dataset}/class.names"))
    assert len(exs) == 16
    img, labels = exs[0]
    assert img.shape == (128, 128, 3)
    assert (labels[:, 4] == 1).sum() >= 1
