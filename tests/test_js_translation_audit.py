"""Translation audit of the browser port (js/src/*.js) against the Python
spec (VERDICT r2 item 6).

Since round 5 the port is also EXECUTED in-env by the jsvm harness
(yolov3_tpu/jsvm/ + tests/test_js_execution.py) — decode/NMS/inference/
render run as real source against the Python pipeline's goldens. These
source-level audits are retained as a fast drift tripwire (they fail on
semantic edits even when the execution tests aren't touched) and as the pin
for facts execution can't see (e.g. that every tf.* name exists in the real
TFJS 4.x registry, which the numpy shim can't prove).

Audited invariants (reference: js/ mirrors /root/reference/js/src behavior):
  * decode: channel split layout (xy|wh|obj|cls), sigmoid/exp targets,
    (sigmoid(xy)+offset)/grid, exp(wh)*anchors, min-corner-before-max
    concat, per-scale flatten + axis-1 concat;
  * nms: score = objectness * max class prob, argmax class, TFJS's
    [y1,x1,y2,x2] reorder, call argument order, shared defaults;
  * inference: 416 input, /255 normalization, halfPixelCenters resize,
    COCO anchor table == datasets/coco2012/anchors.txt, 13-grid-first
    head ordering;
  * every tf.* call names a real TFJS API.
"""

import os
import re

import numpy as np

JS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "js", "src")
OPS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "yolov3_tpu", "ops")


def read(path):
    with open(path) as f:
        return f.read()


def strip_comments(src):
    return re.sub(r"//[^\n]*", "", src)


def test_decode_channel_layout_matches_python():
    js = strip_comments(read(os.path.join(JS, "decode.js")))
    slices = re.findall(
        r"\.slice\(\[0, 0, 0, 0, (\w+)\], \[b, gh, gw, na, (\w+)\]\)", js)
    # (start, size) per channel group, in source order
    assert slices == [("0", "2"), ("2", "2"), ("4", "1"), ("5", "nClasses")], slices

    py = read(os.path.join(OPS, "decode.py"))
    m = re.search(r"jnp\.split\(grid_out[^,]*, \[([\d, ]+)\], axis=-1\)", py)
    assert m, "decode.py channel split not found"
    boundaries = [int(x) for x in m.group(1).split(",")]
    # same layout: xy ends at 2, wh at 4, obj at 5, cls = rest
    assert boundaries == [2, 4, 5]


def test_decode_op_chain_matches_python():
    js = strip_comments(read(os.path.join(JS, "decode.js")))
    # center = (sigmoid(xy) + cell offsets) / (gw, gh)
    assert "tf.sigmoid(xyL).add(offsets).div(tf.tensor([gw, gh]))" in js
    # wh = exp(wh_logits) * normalized anchors
    assert re.search(r"tf\.exp\(whL\)\.mul\(anchors", js)
    # offsets = (col=x, row=y) — col varies along gw (dim 2), row along gh
    assert "tf.range(0, gw).reshape([1, 1, gw, 1, 1])" in js
    assert "tf.range(0, gh).reshape([1, gh, 1, 1, 1])" in js
    assert "tf.concat([col, row], -1)" in js
    # corners min-before-max, concatenated on the channel axis
    assert "tf.concat([center.sub(wh.div(2)), center.add(wh.div(2))], -1)" in js
    # per-scale flatten to (B, g*g*na, ·) then axis-1 concat across scales
    assert "boxes.reshape([b, gh * gw * na, 4])" in js
    assert "tf.concat(allBoxes, 1)" in js

    py = read(os.path.join(OPS, "decode.py"))
    assert "(xy + offsets) / grid_dims" in py
    assert "jnp.exp(wh_l) * anchors" in py
    assert "center - wh / 2.0, center + wh / 2.0" in py
    assert re.search(r"jnp\.concatenate\(all_boxes, axis=1\)", py)
    # sigmoid applied to xy / obj / cls logits, not wh
    assert "jax.nn.sigmoid(xy_l)" in py and "jax.nn.sigmoid(obj_l)" in py
    assert "jax.nn.sigmoid(cls_l)" in py and "sigmoid(wh_l)" not in py
    assert "tf.sigmoid(whL)" not in strip_comments(read(os.path.join(JS, "decode.js")))


def test_nms_semantics_match_python():
    js = strip_comments(read(os.path.join(JS, "nms.js")))
    # score = objectness × best class prob; class = argmax
    assert "confidence.squeeze(-1).mul(classProbs.max(-1))" in js
    assert "classProbs.argMax(-1)" in js
    # TFJS NMS wants [y1, x1, y2, x2]
    assert "tf.concat([ymin, xmin, ymax, xmax], -1)" in js
    # call argument order (boxes, scores, maxBoxes, iouThreshold, scoreThreshold)
    assert re.search(
        r"nonMaxSuppressionAsync\(\s*yxyx, scores1d, maxBoxes, iouThreshold, scoreThreshold\)",
        js)
    # gathered outputs come from the xyxy boxes, not the yxyx reorder
    assert "boxes2d.gather(selected)" in js

    py = read(os.path.join(OPS, "nms.py"))
    assert re.search(r"max_boxes: int = 100", py)
    assert re.search(r"iou_threshold: float = 0\.5", py)
    assert re.search(r"score_threshold: float = 0\.1", py)
    # shared defaults
    assert re.search(
        r"maxBoxes = 100, iouThreshold = 0\.5, scoreThreshold = 0\.1", js)
    # python side scores candidates the same way (objectness × max class prob)
    assert re.search(r"confidence[^\n]*\*[^\n]*max|scores = .*conf.*probs", py, re.S)


def test_inference_preprocess_and_anchor_table():
    js = strip_comments(read(os.path.join(JS, "inference.js")))
    assert "const IMAGE_SIZE = 416" in js
    assert ".div(255)" in js
    # resizeBilinear(size, alignCorners=false, halfPixelCenters=true): the
    # TF2 sampling data/image.py uses — the TFJS default would be ~0.5px off
    assert re.search(
        r"resizeBilinear\(\[IMAGE_SIZE, IMAGE_SIZE\], false, true\)", js)
    # heads sorted 13-grid first to pair with the anchors table
    assert re.search(r"outputs\.sort\(\(a, b\) => a\.shape\[1\] - b\.shape\[1\]\)", js)

    # DEFAULT_ANCHORS == bundled COCO anchors (both normalized, 13-grid first)
    m = re.search(r"DEFAULT_ANCHORS = \[(.*?)\n\];", js, re.S)
    assert m, "DEFAULT_ANCHORS not found"
    fracs = re.findall(r"\[(\d+) / (\d+), (\d+) / (\d+)\]", m.group(1))
    got = np.array([[int(a) / int(b), int(c) / int(d)] for a, b, c, d in fracs],
                   np.float32)
    ref = np.loadtxt("datasets/coco2012/anchors.txt", delimiter=",",
                     dtype=np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_render_geometry_and_label_format():
    js = strip_comments(read(os.path.join(JS, "render.js")))
    # normalized xyxy scaled by the DISPLAYED image dims (utils/render.py:59-62)
    assert "x0 * image.width" in js and "y0 * image.height" in js
    assert "(x1 - x0) * image.width" in js and "(y1 - y0) * image.height" in js
    # label "class: NN%" — same format as utils/render.py detections_str
    assert "`${det.className}: ${(100 * det.score).toFixed(0)}%`" in js


TFJS_API = {
    # every tf.* name the port may use (real TFJS 4.x API surface)
    "tidy", "dispose", "concat", "range", "tensor", "sigmoid", "exp",
    "split", "image", "loadGraphModel", "browser",
}


def test_all_tf_calls_name_real_tfjs_api():
    used = set()
    for fname in ("decode.js", "nms.js", "inference.js", "render.js"):
        src = strip_comments(read(os.path.join(JS, fname)))
        used |= set(re.findall(r"\btf\.(\w+)", src))
    unknown = used - TFJS_API
    assert not unknown, f"unknown tf.* members referenced: {unknown}"


def test_resource_disposal_paths():
    """Leak discipline: model outputs/intermediates disposed even on throw."""
    inf = strip_comments(read(os.path.join(JS, "inference.js")))
    assert re.search(r"finally \{.*tf\.dispose\(owned\)", inf, re.S)
    nms = strip_comments(read(os.path.join(JS, "nms.js")))
    assert re.search(r"finally \{\s*tf\.dispose\(", nms, re.S)
