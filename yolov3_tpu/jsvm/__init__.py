"""jsvm — in-env execution harness for the browser port (js/src).

No JS engine exists in this image (node/deno/quickjs/js2py all absent,
re-verified every round), so the browser port could previously only be
*audited* textually (tests/test_js_translation_audit.py). This package
closes that gap: a from-scratch lexer/parser/interpreter for the ES-2020
subset the port uses, plus a numpy-backed TFJS API shim with faithful
tidy/dispose memory semantics, let the REAL js/src sources execute in
Python against the Python pipeline's goldens (ops/decode.py, ops/nms.py,
the TFJS graph-model artifact of export/tfjs_graph.py).

Typical use (see tests/test_js_execution.py and tools/run_js_pipeline.py):

    from yolov3_tpu.jsvm import Interpreter, TfShim
    shim = TfShim(model_loader=lambda s, url: GraphModelHost(s, url))
    interp = Interpreter({"tf": shim})
    mod = interp.load_module("js/src/inference.js")
    detections = interp.call(mod["runInference"], {...})

Reference: the reference ships its browser port at js/src (inference.js:1);
ours executes here, engine or not.
"""

from .interp import (Interpreter, JSFunction, JSPromise, JsError,
                     JsSyntaxError, JsThrow, js_to_string, js_truthy)
from .tfshim import (GraphModelHost, JsImage, RecordingCanvas,
                     RecordingContext2D, TfShim, TfTensor)

__all__ = [
    "Interpreter", "JSFunction", "JSPromise", "JsError", "JsSyntaxError",
    "JsThrow", "js_to_string", "js_truthy",
    "GraphModelHost", "JsImage", "RecordingCanvas", "RecordingContext2D",
    "TfShim", "TfTensor",
]
