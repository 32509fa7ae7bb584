"""Pascal VOC reader (data/voc.py) — extension beyond the reference's
TFRecord/COCO-JSON sources. Pins: 1-based-inclusive pixel → normalized
xyxy conversion, name→dense-id mapping via the .names file, padding,
dispatcher wiring, and the unknown-class error."""

import os

import numpy as np
import pytest
from PIL import Image

from yolov3_tpu.data.pipeline import create_dataset
from yolov3_tpu.data.voc import create_voc_dataset

XML = """<annotation>
  <filename>{name}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>"""

OBJ = """<object>
  <name>{cls}</name><difficult>0</difficult>
  <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
</object>"""


@pytest.fixture()
def voc_tree(tmp_path):
    img_dir = tmp_path / "JPEGImages"
    ann_dir = tmp_path / "Annotations"
    img_dir.mkdir()
    ann_dir.mkdir()
    names = tmp_path / "voc.names"
    names.write_text("cat\ndog\n")

    rng = np.random.RandomState(0)

    def add(name, w, h, objects):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{name}.jpg")
        (ann_dir / f"{name}.xml").write_text(
            XML.format(name=name, w=w, h=h,
                       objects="".join(OBJ.format(**o) for o in objects)))

    add("a", 200, 100, [dict(cls="cat", x1=21, y1=11, x2=120, y2=60),
                        dict(cls="dog", x1=1, y1=1, x2=200, y2=100)])
    add("b", 64, 64, [])
    return str(img_dir), str(ann_dir), str(names)


def test_voc_labels_exact(voc_tree):
    img_dir, ann_dir, names = voc_tree
    ds, size = create_voc_dataset(img_dir, ann_dir, 96, names, max_bboxes=5)
    assert size == 2
    items = list(ds)
    assert len(items) == 2
    img, lab = items[0]  # sorted order: a.xml first
    assert img.shape == (96, 96, 3) and img.dtype == np.float32
    # 1-based inclusive corners → (v-1)/extent
    np.testing.assert_allclose(
        lab[0], [20 / 200, 10 / 100, 119 / 200, 59 / 100, 1, 0], atol=1e-6)
    # full-image box clips to [0, 1]
    np.testing.assert_allclose(lab[1], [0, 0, 199 / 200, 99 / 100, 1, 1],
                               atol=1e-6)
    assert (lab[2:] == 0).all()
    _, lab_b = items[1]
    assert (lab_b == 0).all()  # no objects


def test_voc_through_dispatcher(voc_tree):
    img_dir, ann_dir, names = voc_tree
    cfg = {"input_data_source": "voc",
           "voc": {"train": {"images_dir": img_dir, "annotations_dir": ann_dir},
                   "valid": {"images_dir": img_dir, "annotations_dir": ann_dir}}}
    datasets, sizes = create_dataset(cfg, 64, 5, names)
    assert sizes == [2, 2]
    for ds in datasets:
        images = [img for img, _ in ds]
        assert len(images) == 2 and images[0].shape == (64, 64, 3)


def test_voc_unknown_class_raises(voc_tree, tmp_path):
    img_dir, ann_dir, names = voc_tree
    bad_names = tmp_path / "only_cat.names"
    bad_names.write_text("cat\n")
    with pytest.raises(ValueError, match="'dog' not in"):
        create_voc_dataset(img_dir, ann_dir, 96, str(bad_names))


def test_voc_train_e2e(voc_tree, tmp_path, repo_root):
    """A VOC tree drives the full train app end-to-end (fit mode, one
    epoch) and writes a checkpoint — the dispatcher contract holds through
    assignment/loss/step."""
    import os

    from yolov3_tpu.apps.train_app import Train

    img_dir, ann_dir, names = voc_tree
    split = {"images_dir": img_dir, "annotations_dir": ann_dir}
    ckpt = str(tmp_path / "voc_train.tf")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        Train()(
            model_config_file=os.path.join(
                repo_root, "config/models/yolov3_tiny/model.yaml"),
            image_size=64,
            batch_size=2,
            max_bboxes=5,
            debug_mode=False,
            anchors_file=os.path.join(
                repo_root, "datasets/shapes_toy/anchors/anchors_tiny.txt"),
            learning_rate=1e-3,
            early_stop_patience=3,
            epochs=1,
            training_mode="fit",
            render_dataset_example=False,
            max_dataset_examples=None,
            transfer_learning_config=None,
            dataset_config={"input_data_source": "voc",
                            "voc": {"train": split, "valid": split}},
            classes_name_file=names,
            output_checkpoints_path=ckpt,
            early_stopping=False,
            weights_save_peroid=1,
        )
    finally:
        os.chdir(cwd)
    assert os.path.exists(ckpt + ".npz")


def test_voc_overflow_raises(voc_tree):
    img_dir, ann_dir, names = voc_tree
    with pytest.raises(ValueError, match="exceed max_bboxes"):
        create_voc_dataset(img_dir, ann_dir, 96, names, max_bboxes=1)
