"""EXECUTION of the browser port (js/src/*.js) — not just audit.

No JS engine exists in this image (node/deno/quickjs/js2py all absent;
re-verified rounds 3-5), which left js/ as the single SURVEY §2 row without
runtime evidence (VERDICT r4 row 21). These tests close that gap with the
in-repo jsvm harness (yolov3_tpu/jsvm/): a from-scratch interpreter for the
ES subset the port uses plus a numpy-backed TFJS shim with faithful
tidy/dispose semantics. The REAL js/src sources execute here, against the
Python pipeline's goldens:

  * decode.js   ≡ ops/decode.py     (≤2e-5, every scale)
  * nms.js      ≡ ops/nms.py        (selection-index-exact)
  * inference.js end-to-end: preprocess → graph model → decode → NMS →
    render, on crafted heads (exact parity vs the Python pipeline) AND on
    a real exported TFJS graph-model artifact (export/tfjs_graph.py)
  * render.js: canvas draw-call geometry, label format, palette hashing
  * memory: ZERO live tensors after runInference — the executable form of
    the disposal audit in test_js_translation_audit.py

Reference parity target: /root/reference/js/src (inference.js:1) — the
reference's browser pipeline, which our js/ re-implements cleanly.
"""

import math
import os

import numpy as np
import pytest

from yolov3_tpu.jsvm import (GraphModelHost, Interpreter, JsError, JSPromise,
                             JsImage, RecordingCanvas, TfShim)

JS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "js", "src")


def make_interp(model_loader=None):
    shim = TfShim(model_loader=model_loader)
    return Interpreter({"tf": shim}), shim


# ---------------------------------------------------------------------------
# interpreter language surface (the constructs js/src relies on)


def test_interpreter_language_surface():
    interp, _ = make_interp()
    # operators, precedence, template literals, closures
    assert interp.run("1 + 2 * 3 - 4 / 2;") == 5.0
    assert interp.eval_expr("`a=${1 + 1}b${'x'.length}`") == "a=2b1"
    assert interp.eval_expr("null ?? 'fallback'") == "fallback"
    assert interp.eval_expr("0 ?? 'fallback'") == 0.0  # ?? only on null/undefined
    assert interp.eval_expr("0 || 'fallback'") == "fallback"
    assert interp.eval_expr("[3, 1, 2].sort((a, b) => a - b).join('-')") == "1-2-3"
    assert interp.eval_expr("[1, 2, 3].map((v, i) => v * 10 + i)") == [10.0, 21.0, 32.0]
    # destructuring: array, object, defaults, params
    out = interp.run("""
    function f({ a, b = 7 }, [x, , z] = [1, 2, 3], ...rest) {
      return [a, b, x, z, rest.length];
    }
    f({ a: 5 }, [10, 20, 30], "r1", "r2");
    """)
    assert out == [5.0, 7.0, 10.0, 30.0, 2.0]
    # spread in calls and literals
    assert interp.eval_expr("[0, ...[1, 2], 3].length") == 4.0
    # try/finally ordering and exceptions reaching catch
    out = interp.run("""
    let log = [];
    function g() {
      try { log.push("t"); throw "boom"; }
      catch (e) { log.push("c:" + e); }
      finally { log.push("f"); }
      return log.join(",");
    }
    g();
    """)
    assert out == "t,c:boom,f"
    # int32 ops: the render.js hash ("person" → Java-style abs int32 hash)
    out = interp.run("""
    function hash(s) {
      let h = 0;
      for (let i = 0; i < s.length; i++) h = (Math.imul(31, h) + s.charCodeAt(i)) | 0;
      return Math.abs(h);
    }
    hash("person");
    """)
    assert out == 991716523.0
    # async/await/Promise.all resolve synchronously in this runtime
    out = interp.run("""
    async function doubled(v) { return v * 2; }
    async function run() {
      const xs = await Promise.all([doubled(1), doubled(2)]);
      return xs[0] + xs[1];
    }
    run();
    """)
    assert isinstance(out, JSPromise) and out.value == 6.0
    # toFixed matches ECMA rounding used by render.js labels
    assert interp.eval_expr("(87.6).toFixed(0)") == "88"
    assert interp.eval_expr("(0.4999).toFixed(0)") == "0"
    assert interp.eval_expr("(99.5).toFixed(0)") == "100"


def test_interpreter_js_semantics_fidelity():
    """Review-pass regressions: ES semantics the port could silently trip
    on if they drifted (per-iteration let bindings, single-eval compound
    targets, ToInt32 on NaN, parseInt/parseFloat coercion, template
    escapes, catch-binding error objects, `new` precedence)."""
    interp, _ = make_interp()
    # ES2020 per-iteration let binding: closures capture that iteration
    out = interp.run("""
    const fns = [];
    for (let i = 0; i < 3; i++) fns.push(() => i);
    fns.map((f) => f());
    """)
    assert out == [0.0, 1.0, 2.0]
    # compound assignment evaluates the index expression exactly once
    out = interp.run("""
    let calls = 0;
    function idx() { calls++; return 0; }
    const arr = [10];
    arr[idx()] += 1;
    [arr[0], calls];
    """)
    assert out == [11.0, 1.0]
    # ECMA ToInt32 treats NaN/Infinity as 0
    assert interp.eval_expr("~NaN") == -1.0
    assert interp.eval_expr("(0/0) | 0") == 0.0
    # parseInt/parseFloat longest-prefix coercion, NaN on no digits
    assert interp.eval_expr("parseInt('10px')") == 10.0
    assert interp.eval_expr("parseInt(5.0)") == 5.0
    assert math.isnan(interp.eval_expr("parseFloat('abc')"))
    assert interp.eval_expr("parseFloat('2.5e1x')") == 25.0
    # template literals process \\u escapes like plain strings
    assert interp.eval_expr("`\\u0041${1}`") == "A1"
    # interpreter-raised errors bind as Error-shaped objects in catch
    out = interp.run("""
    let got = null;
    try { undefinedName; } catch (e) { got = e.message + "|" + e.name; }
    got;
    """)
    assert out == "undefinedName is not defined|JsError"
    # `new X().y()` is (new X()).y(), not new (X().y)()
    out = interp.run("""
    function Box(v) { return { v, double: function () { return v * 2; } }; }
    new Box(7).double();
    """)
    assert out == 14.0


def test_shim_tidy_disposes_on_throw():
    """TFJS disposes every scope tensor when the tidy'd fn throws — a
    failing decode must not read as a (false) leak of the JS port."""
    interp, shim = make_interp()
    with pytest.raises(Exception, match="boom"):
        interp.run("""
        tf.tidy(() => {
          const a = tf.tensor([1, 2, 3]);
          const b = a.mul(2);
          throw "boom";
        });
        """)
    assert shim.num_live() == 0


def test_module_graph_caching(tmp_path):
    (tmp_path / "util.js").write_text(
        "export let loads = 0;\nloads = loads + 1;\n"
        "export function inc(v) { return v + 1; }\n")
    (tmp_path / "a.js").write_text(
        'import { inc } from "./util.js";\nexport function a(v) { return inc(v); }\n')
    (tmp_path / "b.js").write_text(
        'import { inc } from "./util.js";\nexport function b(v) { return inc(v) * 10; }\n')
    interp, _ = make_interp()
    a = interp.load_module(str(tmp_path / "a.js"))
    b = interp.load_module(str(tmp_path / "b.js"))
    assert interp.call(a["a"], 1.0) == 2.0
    assert interp.call(b["b"], 1.0) == 20.0
    # util.js executed once despite two importers
    assert interp.load_module(str(tmp_path / "util.js"))["loads"] == 1.0


def test_shim_tidy_and_dispose_semantics():
    interp, shim = make_interp()
    env_src = """
    const kept = tf.tidy(() => {
      const a = tf.tensor([1, 2, 3]);
      const b = a.mul(2);
      const c = b.add(1);
      return c;
    });
    kept.arraySync();
    """
    out = interp.run(env_src)
    assert out == [3.0, 5.0, 7.0]
    assert shim.num_live() == 1  # a and b reclaimed, c kept
    interp, shim = make_interp()
    with pytest.raises(JsError, match="disposed"):
        interp.run("""
        const t = tf.tensor([1, 2]);
        tf.dispose(t);
        t.arraySync();
        """)


# ---------------------------------------------------------------------------
# decode.js — executed vs ops/decode.py


def test_decode_js_executes_and_matches_python():
    from yolov3_tpu.ops.decode import yolo_decode
    import jax.numpy as jnp

    interp, shim = make_interp()
    mod = interp.load_module(os.path.join(JS, "decode.js"))

    rng = np.random.default_rng(0)
    nclasses = 4
    grids_np = [rng.normal(size=(2, g, g, 3, 5 + nclasses)).astype(np.float32)
                for g in (2, 4, 8)]
    anchors = [[[0.2, 0.3], [0.4, 0.2], [0.1, 0.1]],
               [[0.05, 0.08], [0.12, 0.2], [0.3, 0.1]],
               [[0.02, 0.03], [0.06, 0.05], [0.09, 0.12]]]

    grids_js = [shim.tensor(g.tolist()) for g in grids_np]
    out = interp.call(mod["decodeOutputs"], grids_js,
                      [list(map(list, a)) for a in anchors], float(nclasses))

    pb, pc, pp = yolo_decode([jnp.asarray(g) for g in grids_np],
                             np.asarray(anchors, np.float32), nclasses)
    n_expected = sum(g * g * 3 for g in (2, 4, 8))
    assert out["boxes"].shape == [2, n_expected, 4]
    np.testing.assert_allclose(out["boxes"]._np(), np.asarray(pb), atol=2e-5)
    np.testing.assert_allclose(out["confidence"]._np(), np.asarray(pc), atol=2e-5)
    np.testing.assert_allclose(out["classProbs"]._np(), np.asarray(pp), atol=2e-5)
    # tf.tidy reclaimed every intermediate: inputs + the 3 returned outputs
    assert shim.num_live() == len(grids_js) + 3


# ---------------------------------------------------------------------------
# nms.js — executed vs ops/nms.py


def _python_nms(boxes, conf, probs, max_boxes=100, iou=0.5, score=0.1):
    from yolov3_tpu.ops import nms as pnms
    import jax.numpy as jnp

    out = pnms.yolo_nms_exact(jnp.asarray(boxes), jnp.asarray(conf),
                              jnp.asarray(probs), max_boxes=max_boxes,
                              iou_threshold=iou, score_threshold=score)
    bb, ci, sc, sel, nv = out
    gb, gc, gs, _ = pnms.gather_detections(bb, ci, sc, sel, nv)
    n = int(nv[0])
    return (np.asarray(gb)[0, :n], np.asarray(gc)[0, :n], np.asarray(gs)[0, :n])


def test_nms_js_executes_index_exact_vs_python():
    interp, shim = make_interp()
    mod = interp.load_module(os.path.join(JS, "nms.js"))

    rng = np.random.default_rng(7)
    n, nc = 200, 5
    centers = rng.uniform(0.1, 0.9, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.35, size=(n, 2)).astype(np.float32)
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)[None]
    conf = rng.uniform(0, 1, size=(1, n, 1)).astype(np.float32)
    probs = rng.uniform(0, 1, size=(1, n, nc)).astype(np.float32)

    det = interp.call(mod["yoloNms"],
                      {"boxes": shim.tensor(boxes.tolist()),
                       "confidence": shim.tensor(conf.tolist()),
                       "classProbs": shim.tensor(probs.tolist())},
                      20.0, 0.5, 0.1)
    py_boxes, py_classes, py_scores = _python_nms(
        boxes, conf, probs, max_boxes=20)

    assert len(det["scores"]) == len(py_scores)
    np.testing.assert_array_equal(np.asarray(det["boxes"], np.float32), py_boxes)
    np.testing.assert_array_equal(np.asarray(det["scores"], np.float32), py_scores)
    np.testing.assert_array_equal(np.asarray(det["classes"], np.int64), py_classes)
    # only the caller's 3 input tensors stay live — nms.js disposed the rest
    assert shim.num_live() == 3


def test_nms_js_threshold_and_suppression_semantics():
    """Crafted cases: score filter is strict-greater, overlapping lower-score
    boxes suppressed at IoU > threshold — same on both sides."""
    interp, shim = make_interp()
    mod = interp.load_module(os.path.join(JS, "nms.js"))

    # box 0: high score.  box 1: identical box, lower score → suppressed.
    # box 2: disjoint, mid score → kept.  box 3: below threshold → dropped.
    boxes = np.array([[[0.1, 0.1, 0.3, 0.3],
                       [0.1, 0.1, 0.3, 0.3],
                       [0.6, 0.6, 0.8, 0.8],
                       [0.4, 0.4, 0.5, 0.5]]], np.float32)
    conf = np.array([[[0.9], [0.8], [0.7], [0.05]]], np.float32)
    probs = np.array([[[0.9, 0.1], [0.8, 0.2], [0.1, 0.9], [0.9, 0.1]]], np.float32)

    det = interp.call(mod["yoloNms"],
                      {"boxes": shim.tensor(boxes.tolist()),
                       "confidence": shim.tensor(conf.tolist()),
                       "classProbs": shim.tensor(probs.tolist())},
                      10.0, 0.5, 0.1)
    assert np.asarray(det["classes"]).tolist() == [0, 1]
    np.testing.assert_allclose(det["scores"], [0.81, 0.63], atol=1e-6)

    py_boxes, py_classes, py_scores = _python_nms(boxes, conf, probs, max_boxes=10)
    np.testing.assert_array_equal(np.asarray(det["boxes"], np.float32), py_boxes)
    np.testing.assert_array_equal(np.asarray(det["classes"], np.int64), py_classes)


# ---------------------------------------------------------------------------
# inference.js + render.js — full pipeline


class FakeGraphModel:
    """executeAsync returns preset head grids (decode/NMS/render still run
    the real JS); grid order deliberately 26-first to exercise the port's
    13-grid-first sort (js/src/inference.js:53)."""

    def __init__(self, shim, grids):
        self._shim = shim
        self._grids = grids

    def executeAsync(self, input_tensor):
        assert input_tensor.shape == [1, 416, 416, 3]
        from yolov3_tpu.jsvm.tfshim import TfTensor

        return JSPromise([TfTensor(self._shim, g) for g in self._grids])


def _crafted_heads(nclasses=4):
    """Two tiny-416-shaped heads (13² and 26²) with well-separated objects:
    scores far apart so NMS ordering is unambiguous on both float stacks."""
    g13 = np.full((1, 13, 13, 3, 5 + nclasses), 0.0, np.float32)
    g26 = np.full((1, 26, 26, 3, 5 + nclasses), 0.0, np.float32)
    g13[..., 4] = -12.0
    g26[..., 4] = -12.0
    anchors13 = np.array([[116, 90], [156, 198], [373, 326]], np.float32) / 416.0

    def put(grid, row, col, a, obj, cls, nc, wh=(0.0, 0.0)):
        grid[0, row, col, a, 0:2] = 0.0          # center at cell middle
        grid[0, row, col, a, 2:4] = wh           # wh logits
        grid[0, row, col, a, 4] = obj
        grid[0, row, col, a, 5:5 + nc] = -6.0
        grid[0, row, col, a, 5 + cls] = 6.0

    put(g13, 3, 4, 0, 5.0, 1, nclasses)
    put(g13, 8, 10, 2, 4.0, 3, nclasses)
    # same box as (3,4,anchor0) via wh-logit retarget, lower score → suppressed
    put(g13, 3, 4, 1, 1.0, 1, nclasses,
        wh=(math.log(anchors13[0, 0] / anchors13[1, 0]),
            math.log(anchors13[0, 1] / anchors13[1, 1])))
    put(g26, 5, 5, 1, 3.0, 0, nclasses)
    put(g26, 20, 6, 0, 2.0, 2, nclasses)
    return g13, g26


def _js_hash_color(name: str) -> str:
    palette = ["#e6194b", "#3cb44b", "#4363d8", "#f58231", "#911eb4",
               "#46f0f0", "#f032e6", "#bcf60c", "#fabebe", "#008080"]
    h = 0
    for ch in name:
        h = ((31 * h) + ord(ch)) & 0xFFFFFFFF
        if h >= 0x80000000:
            h -= 0x100000000
        h &= 0xFFFFFFFF
    if h >= 0x80000000:
        h -= 0x100000000
    return palette[abs(h) % len(palette)]


def test_run_inference_js_end_to_end_crafted_heads():
    """Full browser pipeline on crafted heads: preprocess → model → decode →
    NMS → render, exact parity vs the Python pipeline, zero leaks."""
    from yolov3_tpu.ops.decode import yolo_decode
    import jax.numpy as jnp

    nclasses = 4
    g13, g26 = _crafted_heads(nclasses)
    interp, shim = make_interp(
        model_loader=lambda s, url: FakeGraphModel(s, [g26, g13]))
    mod = interp.load_module(os.path.join(JS, "inference.js"))

    rng = np.random.default_rng(11)
    img_np = rng.integers(0, 256, size=(100, 80, 3), dtype=np.uint8)
    overlay = RecordingCanvas()
    # nClasses is derived from classNames.length (js/src/inference.js:55) —
    # the list length must match the crafted heads' class dimension
    class_names = ["cat", "dog", "bird", "fish"]

    dets = interp.call(mod["runInference"], {
        "modelUrl": "fake://model", "image": JsImage(img_np),
        "overlay": overlay, "classNames": class_names,
    })
    assert shim.num_live() == 0, "browser port leaked tensors"

    # Python golden: same anchors table (audited == datasets/coco2012), the
    # 13-grid head first, identical thresholds
    anchors = np.loadtxt(
        os.path.join(os.path.dirname(JS), "..", "datasets", "coco2012", "anchors.txt"),
        delimiter=",", dtype=np.float32).reshape(3, 3, 2)[:2]
    pb, pc, pp = yolo_decode([jnp.asarray(g13), jnp.asarray(g26)], anchors, nclasses)
    py_boxes, py_classes, py_scores = _python_nms(
        np.asarray(pb), np.asarray(pc), np.asarray(pp))

    assert len(dets) == len(py_scores) == 4
    js_boxes = np.array([d["box"] for d in dets], np.float32)
    js_scores = np.array([d["score"] for d in dets], np.float32)
    np.testing.assert_allclose(js_boxes, py_boxes, atol=2e-5)
    np.testing.assert_allclose(js_scores, py_scores, atol=2e-5)
    expected_names = [class_names[c] for c in py_classes]
    assert [d["className"] for d in dets] == expected_names
    assert set(expected_names) == {"cat", "dog", "bird", "fish"}

    # render.js drew each detection at displayed-image geometry
    assert overlay.width == 80 and overlay.height == 100
    strokes = overlay.ctx.ops("strokeRect")
    texts = overlay.ctx.ops("fillText")
    assert len(strokes) == len(texts) == len(dets)
    for call, det in zip(strokes, dets):
        x0, y0, x1, y1 = det["box"]
        np.testing.assert_allclose(
            call["args"],
            [x0 * 80, y0 * 100, (x1 - x0) * 80, (y1 - y0) * 100], atol=1e-6)
        assert call["color"] == _js_hash_color(det["className"])
    for call, det in zip(texts, dets):
        label = call["args"][0]
        assert label == f"{det['className']}: {int(det['score'] * 100 + 0.5)}%"


def test_run_inference_js_empty_detections_path():
    """scoreThreshold above every candidate: empty gathers flow through the
    whole pipeline (map over [], render loop over []) with zero leaks."""
    nclasses = 4
    g13, g26 = _crafted_heads(nclasses)
    interp, shim = make_interp(
        model_loader=lambda s, url: FakeGraphModel(s, [g26, g13]))
    mod = interp.load_module(os.path.join(JS, "inference.js"))
    rng = np.random.default_rng(11)
    img_np = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    overlay = RecordingCanvas()
    dets = interp.call(mod["runInference"], {
        "modelUrl": "fake://model", "image": JsImage(img_np),
        "overlay": overlay, "classNames": ["cat", "dog", "bird", "fish"],
        "scoreThreshold": 0.9999,
    })
    assert dets == []
    assert shim.num_live() == 0
    assert [c for c in overlay.ctx.calls if c["op"] != "clearRect"] == []


def test_run_inference_js_real_graph_model(repo_root, tmp_path):
    """The js pipeline drives a REAL exported TFJS graph-model artifact
    (the same files a browser would fetch), executed through TF exactly as
    the TFJS runtime materializes it. Random weights give near-tied scores,
    so content parity lives in the crafted-heads test; here we pin the
    structural contract: it runs, detections are well-formed, the detection
    COUNT matches the Python pipeline, and nothing leaks."""
    import jax
    from yolov3_tpu.data.image import resize_bilinear
    from yolov3_tpu.export import build_tf_graph, run_graph_model, write_graph_model
    from yolov3_tpu.models import fold_batch_norm, init_model, parse_model_config
    from yolov3_tpu.models.network import head_grid_sizes
    from yolov3_tpu.ops.decode import yolo_decode
    import jax.numpy as jnp

    pytest.importorskip("tensorflow")
    size = 416
    cwd = os.getcwd()
    os.chdir(repo_root)
    try:
        spec = parse_model_config("config/models/yolov3_tiny/model.yaml", nclasses=3)
    finally:
        os.chdir(cwd)
    params, state = init_model(jax.random.PRNGKey(1), spec)
    state = jax.tree.map(lambda x: x + 0.25, state)
    folded = fold_batch_norm(params, state)
    graph_def, input_name, output_names = build_tf_graph(spec, folded, size)
    out_dir = str(tmp_path / "tfjs")
    write_graph_model(graph_def, out_dir, input_name, output_names,
                      (1, size, size, 3),
                      [(1, g, g, 3, 8) for g in head_grid_sizes(spec, size)])

    interp, shim = make_interp(model_loader=GraphModelHost)
    mod = interp.load_module(os.path.join(JS, "inference.js"))
    rng = np.random.default_rng(3)
    img_np = rng.integers(0, 256, size=(200, 160, 3), dtype=np.uint8)
    overlay = RecordingCanvas()
    dets = interp.call(mod["runInference"], {
        "modelUrl": out_dir, "image": JsImage(img_np),
        "overlay": overlay, "classNames": ["a", "b", "c"],
    })
    assert shim.num_live() == 0, "browser port leaked tensors"

    x = resize_bilinear(img_np.astype(np.float32), size, size)[None] / 255.0
    outs = run_graph_model(out_dir, x.astype(np.float32))
    anchors = np.loadtxt(os.path.join(repo_root, "datasets/coco2012/anchors.txt"),
                         delimiter=",", dtype=np.float32).reshape(3, 3, 2)[:2]
    pb, pc, pp = yolo_decode([jnp.asarray(o) for o in outs], anchors, 3)
    py_boxes, py_classes, py_scores = _python_nms(
        np.asarray(pb), np.asarray(pc), np.asarray(pp))

    assert len(dets) == len(py_scores)
    for d in dets:
        assert len(d["box"]) == 4
        assert 0.1 < d["score"] <= 1.0
        assert d["className"] in ("a", "b", "c")
    assert len(overlay.ctx.ops("strokeRect")) == len(dets)
