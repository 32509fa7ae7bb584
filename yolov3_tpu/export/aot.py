"""AOT serving artifacts — compile once, deploy anywhere, via ``jax.export``.

The reference's only deployment artifact is a Keras SavedModel written for
the TFJS converter (reference inference.py:105-107). The TPU-native
equivalent is ``jax.export``: the fused forward+decode+NMS serving program
(whichever tier was configured — bf16, int8 PTQ, S2D stem) is lowered to
versioned StableHLO with the BN-folded (and possibly quantized) weights
baked in as module constants, then serialized with a **symbolic batch
dimension** so one artifact serves every batch size. Loading an artifact
needs jax and this file's ~30-line loader — no model configs, no weights
pipeline, no model-building code — and runs on any platform the artifact
was lowered for (default: both ``cpu`` and ``tpu``).

Artifact format: a single zip file containing
  ``manifest.json``      run metadata — image size, class names, NMS
                         parameters, quantize tier, jax/package versions,
                         lowering platforms (everything a server needs to
                         preprocess requests and label responses);
  ``module.jaxexport``   ``jax.export.Exported.serialize()`` bytes.

Producer CLI: ``utilities/export_serving_artifact.py``. Consumers:
``load_detector_artifact`` below, and ``serve.py`` via the ``artifact:``
config key.
"""

from __future__ import annotations

import json
import time
import zipfile

MANIFEST_NAME = "manifest.json"
MODULE_NAME = "module.jaxexport"
FORMAT_VERSION = 1


def export_detector(predict_fn, image_size: int, platforms=("cpu", "tpu")):
    """Lower + export ``predict_fn`` (a ``make_predictor`` result) over a
    symbolic batch: the exported module accepts ``(b, H, W, 3)`` float32
    for ANY b ≥ 1. Returns a ``jax.export.Exported``."""
    import jax
    from jax import export as jax_export

    (batch,) = jax_export.symbolic_shape("b")
    args = jax.ShapeDtypeStruct(
        (batch, int(image_size), int(image_size), 3), jax.numpy.float32)
    return jax_export.export(predict_fn, platforms=tuple(platforms))(args)


def save_detector_artifact(path: str, exported, manifest: dict) -> dict:
    """Write the artifact zip; returns the full manifest as written."""
    import jax

    manifest = dict(manifest)
    manifest.setdefault("format_version", FORMAT_VERSION)
    manifest.setdefault("framework", "yolov3_tpu")
    manifest.setdefault("jax_version", jax.__version__)
    manifest.setdefault("platforms", list(exported.platforms))
    manifest.setdefault("created_unix", int(time.time()))
    blob = exported.serialize()
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(MANIFEST_NAME, json.dumps(manifest, indent=2, sort_keys=True))
        # the serialized module is already compact flatbuffer+bytecode;
        # store uncompressed so loads are a straight read
        zf.writestr(zipfile.ZipInfo(MODULE_NAME), blob)
    return manifest


def load_detector_artifact(path: str):
    """Load an artifact → ``(predict, manifest)``.

    ``predict(images)`` takes ``(B, H, W, 3)`` float32 in [0, 1] (square
    ``manifest["image_size"]`` resize, /255 — the reference ``image_file``
    preprocessing) and returns the ``yolo_nms`` tuple
    ``(bboxes, class_idx, scores, selected, num_valid)``. Each distinct
    batch size compiles once (jit cache); weights live in the module.
    """
    import jax
    from jax import export as jax_export

    with zipfile.ZipFile(path, "r") as zf:
        manifest = json.loads(zf.read(MANIFEST_NAME).decode())
        # version-gate BEFORE touching the module bytes: a future format's
        # module must produce this clear error, not a deserialize crash
        version = int(manifest.get("format_version", 0))
        if version > FORMAT_VERSION:
            raise ValueError(
                f"artifact {path} has format_version {version}; this loader "
                f"understands ≤ {FORMAT_VERSION} — upgrade yolov3_tpu")
        exported = jax_export.deserialize(zf.read(MODULE_NAME))
    return jax.jit(exported.call), manifest
