"""Checkpoint averaging (tools/average_checkpoints.py) — SWA-style tool,
extension beyond the reference's save_weights-only checkpointing."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from yolov3_tpu.io.resolve import load_weights, save_weights  # noqa: E402
from yolov3_tpu.models import init_model, parse_model_config  # noqa: E402


def test_average_is_elementwise_mean_and_loadable(repo_root, tmp_path):
    from average_checkpoints import average_checkpoints

    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", 3)
    finally:
        os.chdir(cwd)
    p1, s1 = init_model(jax.random.PRNGKey(0), spec)
    p2, s2 = init_model(jax.random.PRNGKey(1), spec)
    a, b, out = (str(tmp_path / n) for n in ("a.tf", "b.tf", "avg.tf"))
    save_weights(spec, p1, s1, a)
    save_weights(spec, p2, s2, b)

    average_checkpoints([a, b], out)

    # the averaged checkpoint loads through the normal weights path…
    pm, sm = init_model(jax.random.PRNGKey(2), spec)
    pm, sm = load_weights(spec, pm, sm, out)
    # …and every leaf is the elementwise mean (params AND BN statistics)
    for tree_m, t1, t2 in ((pm, p1, p2), (sm, s1, s2)):
        for got, x, y in zip(jax.tree.leaves(tree_m), jax.tree.leaves(t1),
                             jax.tree.leaves(t2)):
            np.testing.assert_allclose(
                np.asarray(got), (np.asarray(x) + np.asarray(y)) / 2,
                rtol=1e-6, atol=1e-7)


def test_average_rejects_mismatched_keys(repo_root, tmp_path):
    from average_checkpoints import average_checkpoints

    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec_a = parse_model_config("config/models/yolov3_tiny/model.yaml", 3)
        spec_b = parse_model_config("config/models/yolov3_tiny/model.yaml", 7)
    finally:
        os.chdir(cwd)
    pa, sa = init_model(jax.random.PRNGKey(0), spec_a)
    pb, sb = init_model(jax.random.PRNGKey(0), spec_b)
    a, b = str(tmp_path / "a.tf"), str(tmp_path / "b.tf")
    save_weights(spec_a, pa, sa, a)
    save_weights(spec_b, pb, sb, b)
    # same key SET (same tree) but different shapes → numpy raises on mean;
    # a different nclasses changes only head shapes, so force the key check
    # with a truncated tree instead
    from yolov3_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from yolov3_tpu.io.resolve import native_path

    tree, _ = load_checkpoint(native_path(a))
    tree.pop(sorted(tree)[0])
    c = str(tmp_path / "c.tf.npz")
    save_checkpoint(c, tree)
    with pytest.raises(ValueError, match="key set differs"):
        average_checkpoints([a, c], str(tmp_path / "bad.tf"))

    with pytest.raises(ValueError, match="at least two"):
        average_checkpoints([a], str(tmp_path / "one.tf"))
