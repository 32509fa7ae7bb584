"""TFJS export (utilities/convert_model_to_tfjs.py): the jax2tf SavedModel
leg runs end-to-end — export, reload in TF, and verify the TF graph
reproduces the JAX forward (reference utilities/convert_model_to_tfjs.py
shells out on a Keras SavedModel; ours exports the JAX model via jax2tf).
The tensorflowjs CLI leg stays gated (not installed in this image)."""

import os
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                "utilities"))


def test_jax2tf_saved_model_roundtrip(repo_root, tmp_path):
    import jax
    from yolov3_tpu.models import parse_model_config, init_model, apply_model, fold_batch_norm
    from yolov3_tpu.io.resolve import save_weights
    from convert_model_to_tfjs import export_saved_model

    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    ckpt = str(tmp_path / "w")
    save_weights(spec, params, state, ckpt)
    names = tmp_path / "c.names"
    names.write_text("a\nb\nc\n")

    out_dir = str(tmp_path / "saved_model")
    cfg = os.path.join(repo_root, "config/models/yolov3_tiny/model.yaml")
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        export_saved_model(cfg, ckpt, str(names), 96, out_dir)
    finally:
        os.chdir(cwd)
    assert os.path.exists(os.path.join(out_dir, "saved_model.pb"))

    # reload and compare against the folded JAX forward
    x = np.random.RandomState(0).rand(1, 96, 96, 3).astype(np.float32)
    module = tf.saved_model.load(out_dir)
    tf_outs = module(tf.constant(x))

    folded = fold_batch_norm(params, state)
    jax_outs, _ = apply_model(spec, folded, {}, x, train=False)
    assert len(tf_outs) == len(jax_outs) == 2  # tiny: 2 heads
    for t, j in zip(tf_outs, jax_outs):
        np.testing.assert_allclose(np.asarray(t), np.asarray(j), atol=2e-5)


@pytest.mark.parametrize("model_yaml,size", [
    ("config/models/yolov3_tiny/model.yaml", 96),   # maxpool/upsample vocab
    ("config/models/yolov3/model.yaml", 64),        # shortcut/route vocab
    ("config/models/yolov3_spp/model.yaml", 64),    # SPP: stride-1 maxpools + cascaded concats
])
def test_tfjs_graph_model_roundtrip(repo_root, tmp_path, model_yaml, size):
    """The pure-Python TFJS graph-model export (no tensorflowjs CLI):
    export → read shards+topology back → run in TF → match the JAX
    forward. Also pins the op set to the TFJS kernel registry."""
    import jax
    from yolov3_tpu.export import (TFJS_SUPPORTED_OPS, build_tf_graph,
                                   read_graph_model, run_graph_model,
                                   write_graph_model)
    from yolov3_tpu.models import (apply_model, fold_batch_norm, init_model,
                                   parse_model_config)
    from yolov3_tpu.models.network import head_grid_sizes

    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config(model_yaml, nclasses=3)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(1), spec)
    # nonzero BN statistics so folding actually matters
    state = jax.tree.map(lambda x: x + 0.25, state)
    folded = fold_batch_norm(params, state)

    graph_def, input_name, output_names = build_tf_graph(spec, folded, size)
    assert {n.op for n in graph_def.node} <= TFJS_SUPPORTED_OPS
    assert not graph_def.library.function  # flat graph, no PartitionedCall

    grids = head_grid_sizes(spec, size)
    out_dir = str(tmp_path / "tfjs")
    write_graph_model(graph_def, out_dir, input_name, output_names,
                      (1, size, size, 3),
                      [(1, g, g, 3, 5 + 3) for g in grids])
    assert os.path.exists(os.path.join(out_dir, "model.json"))

    # the stripped topology must not carry weight payloads (the whole point
    # of the manifest) — and every Const must be in the manifest
    import json as _json
    with open(os.path.join(out_dir, "model.json")) as f:
        mj = _json.load(f)
    const_nodes = [n for n in mj["modelTopology"]["node"] if n["op"] == "Const"]
    for n in const_nodes:
        tensor = n["attr"]["value"]["tensor"]
        assert "tensorContent" not in tensor and "floatVal" not in tensor
    manifest_names = {w["name"] for w in mj["weightsManifest"][0]["weights"]}
    assert {n["name"] for n in const_nodes} == manifest_names

    # round-trip: re-injected Const values must be bit-identical
    from tensorflow.python.framework import tensor_util
    graph_def2, _ = read_graph_model(out_dir)
    by_name = {n.name: n for n in graph_def2.node}
    for n in graph_def.node:
        if n.op == "Const":
            a = tensor_util.MakeNdarray(n.attr["value"].tensor)
            b = tensor_util.MakeNdarray(by_name[n.name].attr["value"].tensor)
            np.testing.assert_array_equal(a, b.astype(a.dtype))

    x = np.random.RandomState(0).rand(1, size, size, 3).astype(np.float32)
    tf_outs = run_graph_model(out_dir, x)

    jax_outs, _ = apply_model(spec, folded, {}, x, train=False)
    jax_outs = sorted((np.asarray(o) for o in jax_outs), key=lambda o: o.shape[1])
    assert len(tf_outs) == len(jax_outs)
    for t, j in zip(tf_outs, jax_outs):
        assert t.shape == j.shape
        np.testing.assert_allclose(t, j, atol=2e-4)


def test_tfjs_quantized_manifest_roundtrip(repo_root, tmp_path):
    """uint8/uint16 manifest quantization: shards shrink, entries carry the
    tfjs `quantization` field, the reader's affine dequant bit-matches an
    independent quantize→dequant, and the graph still runs close to fp."""
    import jax
    from yolov3_tpu.export import (build_tf_graph, quantize_weight,
                                   read_graph_model, run_graph_model,
                                   write_graph_model)
    from yolov3_tpu.models import (apply_model, fold_batch_norm, init_model,
                                   parse_model_config)
    from yolov3_tpu.models.network import head_grid_sizes
    from tensorflow.python.framework import tensor_util

    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(2), spec)
    folded = fold_batch_norm(params, state)
    size = 96
    graph_def, input_name, output_names = build_tf_graph(spec, folded, size)
    grids = head_grid_sizes(spec, size)
    shapes = [(1, g, g, 3, 8) for g in grids]

    fp_dir, q_dir = str(tmp_path / "fp"), str(tmp_path / "q8")
    write_graph_model(graph_def, fp_dir, input_name, output_names,
                      (1, size, size, 3), shapes)
    write_graph_model(graph_def, q_dir, input_name, output_names,
                      (1, size, size, 3), shapes, quantize="uint8")

    def total_shard_bytes(d):
        import glob
        return sum(os.path.getsize(p) for p in glob.glob(os.path.join(d, "*.bin")))

    assert total_shard_bytes(q_dir) < 0.3 * total_shard_bytes(fp_dir)

    import json as _json
    with open(os.path.join(q_dir, "model.json")) as f:
        mj = _json.load(f)
    qentries = [w for w in mj["weightsManifest"][0]["weights"] if "quantization" in w]
    assert qentries and all(w["quantization"]["dtype"] == "uint8" and
                            w["dtype"] == "float32" for w in qentries)

    # reader dequant == independent quantize->dequant of the originals
    graph_q, _ = read_graph_model(q_dir)
    by_name = {n.name: n for n in graph_q.node}
    for node in graph_def.node:
        if node.op == "Const":
            orig = tensor_util.MakeNdarray(node.attr["value"].tensor)
            got = tensor_util.MakeNdarray(by_name[node.name].attr["value"].tensor)
            if orig.dtype == np.float32:
                q, meta = quantize_weight(np.ascontiguousarray(orig), "uint8")
                expect = (q.astype(np.float32) * np.float32(meta["scale"])
                          + np.float32(meta["min"]))
                np.testing.assert_array_equal(got, expect.reshape(got.shape))

    # the quantized graph still runs and tracks the fp forward loosely
    x = np.random.RandomState(0).rand(1, size, size, 3).astype(np.float32)
    q_outs = run_graph_model(q_dir, x)
    jax_outs, _ = apply_model(spec, folded, {}, x, train=False)
    jax_outs = sorted((np.asarray(o) for o in jax_outs), key=lambda o: o.shape[1])
    for t, j in zip(q_outs, jax_outs):
        assert t.shape == j.shape and np.isfinite(t).all()
        # uint8 weight noise through 13 convs: demand correlation, not parity
        assert np.corrcoef(t.ravel(), j.ravel())[0, 1] > 0.98


def test_tfjs_export_rejects_transformed_specs(repo_root):
    """Exporting an s2d-rewritten or int8-quantized spec must fail fast
    with an actionable message, not silently emit wrong geometry."""
    import jax
    from yolov3_tpu.export import build_tf_graph
    from yolov3_tpu.models import fold_batch_norm, init_model, parse_model_config
    from yolov3_tpu.ops.s2d import s2d_stem_train

    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    folded = fold_batch_norm(params, state)

    s2d_spec = s2d_stem_train(spec, image_size=64)
    assert s2d_spec is not spec  # the rewrite must actually trigger
    with pytest.raises(ValueError, match="un-rewritten"):
        build_tf_graph(s2d_spec, folded, 64)

    # int8-quantized params (kernel_q, no kernel) must be rejected too
    bad = {sm: dict(layers) for sm, layers in folded.items()}
    first_sm = spec.sub_models[0].name
    first_key = next(iter(bad[first_sm]))
    entry = dict(bad[first_sm][first_key])
    entry["kernel_q"] = entry.pop("kernel")
    bad[first_sm][first_key] = entry
    with pytest.raises(ValueError, match="quantiz"):
        build_tf_graph(spec, bad, 64)
