"""TensorBoard event writer (utils/tb.py): files must be readable by
TensorFlow's own event reader (format compatibility pin) and carry the
scalars we wrote.

New capability — the reference's TensorBoard callback is commented out
(reference train.py:200-204)."""

import glob
import os
import struct

import numpy as np
import pytest

from yolov3_tpu.data.tfrecord import masked_crc
from yolov3_tpu.utils.tb import SummaryWriter


def _read_records(path):
    """Decode the TFRecord framing (shared with data/tfrecord.py)."""
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return records
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == masked_crc(header)
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == masked_crc(payload)
            records.append(payload)


def test_writer_emits_valid_framing(tmp_path):
    with SummaryWriter(str(tmp_path / "run")) as tb:
        tb.add_scalar("train/loss", 3.25, step=0)
        tb.add_scalars({"train/loss": 2.5, "train/lr": 1e-3}, step=1)
    files = glob.glob(str(tmp_path / "run" / "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    # header event + 2 scalar events
    assert len(records) == 3
    assert b"brain.Event:2" in records[0]
    assert b"train/loss" in records[1]
    assert b"train/lr" in records[2]


def test_tensorflow_reads_the_events_back(tmp_path):
    """Round-trip through TF's own proto: the exact steps, tags, and
    simple_values come back (this is what stock TensorBoard parses)."""
    tf = pytest.importorskip("tensorflow")
    from tensorflow.core.util import event_pb2

    logdir = str(tmp_path / "run")
    with SummaryWriter(logdir) as tb:
        tb.add_scalar("train/loss", 3.25, step=7)
        tb.add_scalars({"a": -1.5, "b": 42.0}, step=8)

    path = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))[0]
    events = [event_pb2.Event.FromString(rec.numpy())
              for rec in tf.data.TFRecordDataset(path)]

    assert events[0].file_version == "brain.Event:2"
    assert events[1].step == 7
    assert {v.tag: v.simple_value for v in events[1].summary.value} == {
        "train/loss": pytest.approx(3.25)}
    assert events[2].step == 8
    got = {v.tag: v.simple_value for v in events[2].summary.value}
    assert got == {"a": pytest.approx(-1.5), "b": pytest.approx(42.0)}
    for ev in events[1:]:
        assert ev.wall_time > 0


def test_train_app_tensorboard_key(tmp_path, repo_root, toy_dataset):
    """`tensorboard: <dir>` in the train config writes per-epoch scalar
    events (train losses, throughput, lr, val loss)."""
    tf = pytest.importorskip("tensorflow")
    import yaml
    from tensorflow.core.util import event_pb2

    from yolov3_tpu.apps.train_app import Train

    from .conftest import absolutize_run_config

    cfg = yaml.safe_load(open(os.path.join(repo_root, "config/train_config.yaml")))
    logdir = str(tmp_path / "tb")
    cfg.update(image_size=96, epochs=2, batch_size=8, training_mode="fit",
               tensorboard=logdir,
               output_checkpoints_path=str(tmp_path / "ckpt.tf"))
    absolutize_run_config(cfg)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        Train()(**cfg)
    finally:
        os.chdir(cwd)

    path = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))[0]
    events = [event_pb2.Event.FromString(rec.numpy())
              for rec in tf.data.TFRecordDataset(path)]
    scalars = {}  # (step, tag) -> value
    for ev in events:
        for v in ev.summary.value:
            scalars[(ev.step, v.tag)] = v.simple_value
    for epoch in (1, 2):
        for tag in ("train/total_loss", "train/images_per_sec",
                    "train/learning_rate", "train/loss_xy", "train/loss_wh",
                    "train/loss_obj", "train/loss_class", "val/total_loss"):
            assert (epoch, tag) in scalars, f"missing {tag} at epoch {epoch}"
    assert np.isfinite(scalars[(1, "train/total_loss")])
    assert scalars[(1, "train/images_per_sec")] > 0
