import numpy as np
import pytest

from yolov3_tpu.data.pipeline import Batcher, Dataset, DevicePrefetcher


def _ds(n=10):
    def gen():
        for i in range(n):
            yield np.full((4, 4, 3), i, np.float32), np.zeros((5, 6), np.float32)

    return Dataset(gen, size=n)


def test_batcher_drops_remainder():
    batches = list(Batcher(_ds(10), 4))
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 4, 4, 3)


def test_dataset_take_and_map():
    ds = _ds(10).take(3).map(lambda img, lab: (img * 2, lab))
    items = list(ds)
    assert len(items) == 3
    assert items[1][0].max() == 2.0


def test_prefetcher_preserves_order_and_count():
    out = [float(np.asarray(img)[0, 0, 0, 0]) for img, _ in DevicePrefetcher(Batcher(_ds(8), 2))]
    assert out == [0.0, 2.0, 4.0, 6.0]


def test_prefetcher_propagates_errors():
    def gen():
        yield np.zeros((4, 4, 3), np.float32), np.zeros((5, 6), np.float32)
        raise RuntimeError("decode failed")

    ds = Dataset(gen)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(DevicePrefetcher(Batcher(ds, 1)))
