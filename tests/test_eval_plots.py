import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from yolov3_tpu.eval.plots import barh_multiple_plots


def test_barh_plot_renders(tmp_path):
    out = str(tmp_path / "plot.png")
    values = [np.array([1, 2, 3]), np.array([0, 1, 0]), np.array([2, 2, 2])]
    fig = barh_multiple_plots(values, ["tp", "fp", "fn"], ["a", "b", "c"],
                              title="test", out_path=out)
    assert fig is not None
    import os

    assert os.path.getsize(out) > 0
