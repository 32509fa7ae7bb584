"""Toy-corpus generator split hygiene (tools/make_toy_dataset.py).

The convergence recipe (tools/train_convergence.py) generates corpora of
different sizes from the same seed; the val split must be (a) identical
across corpus sizes — so evals are comparable — and (b) disjoint from
every train split — so mAP is measured on truly held-out images. With a
single sequential RNG stream (the pre-round-3 scheme), the small corpus's
val images ARE the large corpus's later train images, which leaked eval
into train (0.99 leaked vs 0.97 honest on the round-3 tiny run).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))

from make_toy_dataset import main as make_dataset  # noqa: E402


def _records(root, split):
    from yolov3_tpu.data.tfrecord import iter_tfrecord_records

    path = os.path.join(root, "tfrecords", split, "file_00.tfrec")
    return list(iter_tfrecord_records(path))


def test_val_split_stable_and_disjoint_across_corpus_sizes(tmp_path):
    small = str(tmp_path / "small")
    large = str(tmp_path / "large")
    make_dataset(small, n_train=8, n_val=4, n_test=0, seed=11, img_size=96)
    make_dataset(large, n_train=24, n_val=4, n_test=0, seed=11, img_size=96)

    val_small = _records(small, "val")
    val_large = _records(large, "val")
    # (a) val is a function of (seed, n_val) only — not of n_train
    assert val_small == val_large

    # (b) no val record appears in either train split
    train_all = set(_records(small, "train")) | set(_records(large, "train"))
    assert len(set(_records(large, "train"))) == 24  # sanity: records unique
    for rec in val_small:
        assert rec not in train_all


def test_splits_internally_disjoint(tmp_path):
    root = str(tmp_path / "d")
    make_dataset(root, n_train=8, n_val=4, n_test=4, seed=3, img_size=96)
    train = set(_records(root, "train"))
    val = set(_records(root, "val"))
    test = set(_records(root, "test"))
    assert not (train & val) and not (train & test) and not (val & test)
