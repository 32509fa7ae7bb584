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
