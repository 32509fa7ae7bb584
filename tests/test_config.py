import numpy as np
import pytest

from yolov3_tpu.config import get_anchors, count_file_lines, safe_eval_expr


def test_safe_eval_filters_expression():
    assert safe_eval_expr("3*(2+2+1+nclasses)", {"nclasses": 80}) == 255
    assert safe_eval_expr("3*(2+2+1+nclasses)", {"nclasses": 7}) == 36


def test_safe_eval_shape_tuple():
    assert safe_eval_expr("(None, None, 3)") == (None, None, 3)


def test_safe_eval_rejects_calls():
    with pytest.raises(ValueError):
        safe_eval_expr("__import__('os').system('true')")
    with pytest.raises(ValueError):
        safe_eval_expr("open('/etc/passwd')")


def test_anchors_shape(tmp_path):
    anchors = np.random.rand(9, 2)
    path = tmp_path / "anchors.txt"
    np.savetxt(path, anchors, delimiter=",")
    table = get_anchors(str(path))
    assert table.shape == (3, 3, 2)
    np.testing.assert_allclose(table.reshape(-1, 2), anchors, rtol=1e-6)


def test_count_file_lines(tmp_path):
    path = tmp_path / "names.txt"
    path.write_text("a\nb\nc\n")
    assert count_file_lines(str(path)) == 3


def test_batch_normalize_explicit_false_honored(tmp_path):
    """`batch_normalize: 0` must disable BN (bias conv); bare presence
    (`batch_normalize:` with no value) and `: 1` enable it."""
    from yolov3_tpu.models.spec import _parse_layer

    def layer(**kw):
        return _parse_layer({"type": "convolutional", "filters": 8, "size": 3,
                             "stride": 1, "pad": 1, "activation": "leaky", **kw}, 3)

    assert layer(batch_normalize=1)["batch_normalize"] is True
    assert layer(batch_normalize=None)["batch_normalize"] is True  # bare key
    assert layer(batch_normalize=0)["batch_normalize"] is False
    assert layer(batch_normalize=False)["batch_normalize"] is False
    assert layer()["batch_normalize"] is False  # absent


def test_layers_config_file_subdir_fallback(tmp_path):
    """layers_config_file paths relative to the model.yaml dir resolve even
    when they contain subdirectories."""
    import os
    import yaml

    from yolov3_tpu.models import parse_model_config

    sub = tmp_path / "layers"
    sub.mkdir()
    (sub / "body.yaml").write_text(yaml.safe_dump({"layers_config": [
        {"type": "convolutional", "filters": 8, "size": 3, "stride": 1,
         "pad": 1, "batch_normalize": 1, "activation": "leaky"},
        {"type": "yolo"},
    ]}))
    model = tmp_path / "model.yaml"
    model.write_text(yaml.safe_dump({
        "output_stage": "model",
        "sub_models_configs": [{
            "name": "model", "layers_config_file": "layers/body.yaml",
            "outputs_layers": [-1],
        }],
    }))
    cwd = os.getcwd()
    os.chdir("/")  # ensure the as-written relative path does NOT resolve
    try:
        spec = parse_model_config(str(model), nclasses=3)
    finally:
        os.chdir(cwd)
    assert len(spec.sub_models[0].layers) == 2


def test_kmeans_fallback_fewer_distinct_points_than_clusters():
    """numpy k-means++ must not crash when distinct points < n_clusters."""
    import sys

    import numpy as np

    sys.path.insert(0, "utilities")
    from create_yolov3_anchors import kmeans

    pts = np.array([[0.1, 0.1], [0.2, 0.3]] * 10, np.float32)  # 2 distinct
    centers = kmeans(pts, k=6, iters=10)
    assert centers.shape == (6, 2)
    assert np.isfinite(centers).all()
