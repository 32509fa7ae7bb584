"""yolov3_tpu — a TPU-native (JAX / XLA / Pallas / pjit) object-detection framework.

A ground-up re-design of the capabilities of the TF2/Keras reference
``ronen-halevy/yolo-v3-tf2``: YAML-driven model DSL (Darknet-53 backbone +
FPN necks + YOLO heads), TFRecord / COCO-JSON input pipelines, grid-scatter
target assignment, the 4-term composite YOLO loss, train / inference /
evaluate entry points, Darknet ``.weights`` import, k-means anchors, and
data-parallel training over a TPU ICI mesh.

Design stance (TPU-first, not a port):
  * functional core — params and BN statistics are pytrees, every compute
    path is a pure jittable function with static shapes;
  * the hot loop (forward, loss, target assignment, decode, NMS) runs
    entirely on device under one ``jax.jit``;
  * multi-chip scaling via ``jax.sharding.Mesh`` + ``NamedSharding``
    (batch-sharded data parallelism, XLA-compiled gradient ``psum``);
  * inference-time BatchNorm folding and bf16 compute for MXU throughput.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("YOLOV3_TPU_PLATFORM"):
    # Escape hatch for environments whose site hooks pre-select a platform
    # and override JAX_PLATFORMS (the config knob still works until the
    # first backend use). E.g. YOLOV3_TPU_PLATFORM=cpu with
    # XLA_FLAGS=--xla_force_host_platform_device_count=8 runs any CLI on a
    # virtual multi-chip CPU mesh (data_parallel: true).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["YOLOV3_TPU_PLATFORM"])
