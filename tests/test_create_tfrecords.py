"""COCO-JSON → TFRecords converter (tools/create_tfrecords.py): the
written shards must read back through our reference-parity tfrecord
loader with labels identical to the direct COCO-JSON dataset path."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_roundtrip_matches_coco_path(repo_root, toy_dataset, tmp_path):
    from create_tfrecords import main as create_main

    images_dir = os.path.join(repo_root, "datasets/shapes_toy/coco/images")
    annotations = os.path.join(repo_root, "datasets/shapes_toy/coco/annotations.json")
    out_dir = str(tmp_path / "tfrecords")
    names_out = str(tmp_path / "gen.names")
    create_main(["--images_dir", images_dir, "--annotations", annotations,
                 "--out_dir", out_dir, "--shard_size", "10",
                 "--names_out", names_out])

    # multiple shards actually produced (32 train images / shard_size 10)
    shards = sorted(os.listdir(out_dir))
    assert len(shards) >= 3 and all(s.endswith(".tfrec") for s in shards)
    # names in categories-list order == the toy class file
    gen_names = open(names_out).read().split()
    toy_names = open(os.path.join(repo_root, "datasets/shapes_toy/class.names")).read().split()
    assert gen_names == toy_names

    from yolov3_tpu.data.coco_json import create_dataset_from_files
    from yolov3_tpu.data.tfrecord import parse_tfrecords

    image_size, max_bboxes = 96, 20
    coco_ds, n = create_dataset_from_files(images_dir, annotations, image_size,
                                           max_bboxes=max_bboxes)
    coco_items = list(iter(coco_ds))
    tfr_items = list(parse_tfrecords(out_dir, image_size, max_bboxes, names_out))
    assert len(tfr_items) == len(coco_items) == n

    # same label rows image-by-image (both paths preserve file order);
    # boxes were written normalized, so values must match exactly
    for (img_c, lab_c), (img_t, lab_t) in zip(coco_items, tfr_items):
        np.testing.assert_allclose(lab_t, lab_c, atol=1e-6)
        assert img_t.shape == img_c.shape == (image_size, image_size, 3)
        # same underlying JPEG decoded through both paths
        np.testing.assert_allclose(img_t, img_c, atol=1e-2)
