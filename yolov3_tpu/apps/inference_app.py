"""Inference application — the reference inference.py surface.

Accepts the detect_config.yaml schema. The inference pipeline is ONE jit:
BN-folded bf16-optional forward + decode + NMS, compiled per (batch,
image_size). Outputs: annotated detect_<i>.jpg images + a detect.txt line
per image (reference inference.py:38-50), same tuple format.

Parity notes:
  * tfrecords mode matches reference inference.py:119-123 — whose
    letterbox is the identity because parse_tfrecords squash-resizes to a
    square first (load_tfrecords.py:44); image_file / images_dir mode uses
    plain square resize (:148-158). The reference's geometry on each path
    is preserved exactly.
  * detect_<i>.jpg uses a global image counter (the reference resets the
    index per batch, silently overwriting files — SURVEY §2 quirk; fixed).
  * save_model_path exports a native .npz weights bundle instead of a TF
    SavedModel (TFJS export path: utilities/convert_model_to_tfjs.py).
"""

from __future__ import annotations

import logging
import os
import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_anchors, dir_filelist, read_class_names
from ..data.image import decode_image, resize_bilinear
from ..data.tfrecord import parse_tfrecords
from ..models import parse_model_config, init_model, apply_model, fold_batch_norm
from ..io.resolve import load_weights, save_weights
from ..ops.decode import yolo_decode
from ..ops.nms import yolo_nms
from ..utils.render import render_text_annotated_bboxes

log = logging.getLogger(__name__)


def make_predictor(spec, params, bn_state, anchors_table, nclasses,
                   yolo_max_boxes, nms_iou_threshold, nms_score_threshold,
                   fold_bn: bool = True, compute_dtype=None,
                   quantize=None, calibration_batches=None, mesh=None,
                   image_size=None, nms_per_class: bool = False):
    """Build the fused forward+decode+NMS jitted function.

    ``mesh``: a ``jax.sharding.Mesh`` for sharded serving — params
    replicate and the image batch shards over the mesh's data axis. With a
    1-D data mesh every pipeline stage (convs, decode, NMS, gather) is
    per-image independent, so XLA compiles a collective-free SPMD program
    (linear scale-out over ICI); the data-axis size must divide the batch
    size (e.g. 8 chips, batch 128). A 2-D (data × spatial) mesh
    additionally shards image HEIGHT over the spatial axis
    (mesh.py::image_sharding): GSPMD splits every conv spatially and
    inserts halo exchanges over ICI — the way to put several chips on ONE
    image (B=1 latency, beyond-HBM resolutions). Outputs stay sharded on
    data only (decode/NMS mix rows, so XLA gathers the spatial shards
    where the dataflow first requires it).

    ``quantize='int8'`` enables the int8 PTQ serving tier: per-channel
    weights, calibrated per-tensor activation scales (validate mAP for your
    weights — tools/int8_accuracy_gate.py). ``quantize='int8_chain'`` keeps
    activations int8 end-to-end between convs (requant in each conv's
    epilogue) — equivalent accuracy, measured ~2-3% slower on v5e because
    XLA already fuses the dequant→leaky→requant chain between convs into
    one elementwise kernel, and the explicit QAct boundaries perturb its
    fusion choices (PERF.md). Both require ``calibration_batches``.
    """
    run_params = fold_batch_norm(params, bn_state) if fold_bn else params
    run_state = {} if fold_bn else bn_state
    if quantize in ("int8", "int8_chain"):
        if not fold_bn:
            raise ValueError("int8 quantization requires fold_bn=True")
        from ..ops.quantize import calibrate_scales, quantize_params

        if not calibration_batches:
            raise ValueError("int8 quantization needs calibration_batches")
        in_absmax, out_absmax = calibrate_scales(spec, run_params, calibration_batches)
        run_params = quantize_params(
            spec, run_params, in_absmax,
            out_absmax=out_absmax if quantize == "int8_chain" else None)
        # bit-exact stem rewrite (no-op for non-Darknet stems) — ops/s2d.py
        from ..ops.s2d import s2d_stem

        spec, run_params = s2d_stem(spec, run_params, image_size=image_size)
        compute_dtype = None
    if compute_dtype is not None:
        run_params = jax.tree.map(lambda x: x.astype(compute_dtype), run_params)
    anchors = jnp.asarray(anchors_table, jnp.float32)

    def predict_fn(images):
        if compute_dtype is not None:
            images = images.astype(compute_dtype)
        outputs, _ = apply_model(spec, run_params, run_state, images, train=False)
        boxes, conf, probs = yolo_decode(outputs, anchors, nclasses)
        return yolo_nms(
            boxes, conf, probs,
            max_boxes=yolo_max_boxes,
            iou_threshold=nms_iou_threshold,
            score_threshold=nms_score_threshold,
            per_class=nms_per_class,
        )

    if mesh is None:
        return jax.jit(predict_fn)
    from ..parallel.mesh import batch_sharding, image_sharding

    data = batch_sharding(mesh)
    # every output of yolo_nms is batch-leading → shard them all on data;
    # inputs also split H over a 'spatial' mesh axis when one is present
    return jax.jit(predict_fn, in_shardings=image_sharding(mesh),
                   out_shardings=(data, data, data, data, data))


def calibration_batches_from_dir(images_dir, image_size, limit: int = 8,
                                 preprocess=None):
    """int8-calibration batches from a directory of images (square resize,
    /255 — the ``image_file`` preprocessing; pass ``preprocess`` to match a
    letterboxed pipeline). Shared by serve/export."""
    preprocess = preprocess or resize_bilinear
    calib = []
    for file in dir_filelist(images_dir, (".jpeg", ".jpg", ".png", ".bmp"))[:limit]:
        with open(file, "rb") as f:
            img = decode_image(f.read()).astype(np.float32) / 255.0
        calib.append(preprocess(img, image_size, image_size))
    if not calib:
        raise ValueError(f"no calibration images in {images_dir}")
    return [np.stack(calib)]


def build_serving_predictor(model_config_file, classes_name_file, anchors_file,
                            input_weights_path, image_size, yolo_max_boxes=100,
                            nms_iou_threshold=0.5, nms_score_threshold=0.3,
                            quantize=None, compute_precision=None,
                            calibration_images_dir=None, mesh=None,
                            letterbox=False, nms_per_class=False):
    """Detect-config keys → ``(predictor, class_names, model_name)``.

    The one-stop predictor constructor shared by ``serve.py`` and
    ``utilities/export_serving_artifact.py``: parse model, load weights,
    calibrate int8 if asked (``letterbox`` selects the calibration
    geometry to match the caller's preprocessing), and return the fused
    jitted program (optionally sharded over ``mesh``).
    """
    anchors_table = get_anchors(anchors_file)
    class_names = read_class_names(classes_name_file)
    spec = parse_model_config(model_config_file, len(class_names))
    params, bn_state = init_model(jax.random.PRNGKey(0), spec)
    params, bn_state = load_weights(spec, params, bn_state, input_weights_path)

    calibration_batches = None
    if quantize in ("int8", "int8_chain"):
        if not calibration_images_dir:
            raise ValueError(f"quantize: {quantize} needs calibration_images_dir")
        from ..data.image import letterbox_resize

        calibration_batches = calibration_batches_from_dir(
            calibration_images_dir, image_size,
            preprocess=letterbox_resize if letterbox else None)

    compute_dtype = {"bf16": jnp.bfloat16, "fp32": None, None: None}[compute_precision]
    predictor = make_predictor(
        spec, params, bn_state, anchors_table, len(class_names),
        yolo_max_boxes, nms_iou_threshold, nms_score_threshold,
        compute_dtype=compute_dtype, quantize=quantize,
        calibration_batches=calibration_batches, image_size=image_size,
        mesh=mesh, nms_per_class=nms_per_class)
    model_name = os.path.basename(os.path.dirname(model_config_file)) or "yolov3"
    return predictor, class_names, model_name


def _open_video(path):
    """→ ``(capture, fps, (width, height))``; OpenCV decodes the container."""
    import cv2

    if not path:
        raise ValueError("input_data_source: video_file needs video_file_path")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"cannot open video {path}")
    fps = float(cap.get(cv2.CAP_PROP_FPS)) or 25.0
    size = (int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)))
    return cap, fps, size


def _video_frames(cap):
    """Yield RGB float32 [0,1] frames until the stream ends."""
    while True:
        ok, frame = cap.read()
        if not ok:
            return
        yield frame[:, :, ::-1].astype(np.float32) / 255.0


def gather_valid_detections(bboxes, class_indices, scores, selected, num_valid):
    """reference inference.py:21-28."""
    sel = selected[: int(num_valid)]
    return bboxes[sel], class_indices[sel], scores[sel]


class Inference:
    def __call__(
        self,
        model_config_file,
        classes_name_file,
        anchors_file,
        input_weights_path,
        image_size,
        input_data_source,
        images_dir,
        tfrecords_dir,
        batch_size,
        image_file_path,
        output_dir,
        yolo_max_boxes,
        nms_iou_threshold,
        nms_score_threshold,
        bbox_color,
        font_size,
        video_file_path=None,
        letterbox=False,
        nms_per_class=False,
        display_result_images=None,
        save_model_path=None,
        quantize=None,
        compute_precision=None,
        data_parallel=False,
        spatial_partitioning=1,
        **kwargs,
    ):
        from ..utils.compile_cache import enable_from_env_or_config

        enable_from_env_or_config(kwargs.get("compilation_cache"))
        os.makedirs(output_dir, exist_ok=True)
        detect_txt = f"{output_dir}/detect.txt"
        if os.path.exists(detect_txt):
            os.remove(detect_txt)
        outfile = open(detect_txt, "a")

        anchors_table = get_anchors(anchors_file)
        class_names = read_class_names(classes_name_file)
        nclasses = len(class_names)

        spec = parse_model_config(model_config_file, nclasses)
        params, bn_state = init_model(jax.random.PRNGKey(0), spec)

        # summary lands in the run's output_dir (reference inference.py:98-99
        # writes cwd-relative; keeping it with the run's artifacts means
        # tools driven from the repo root never dirty the tracked copy)
        with open(os.path.join(output_dir, "model_inference_summary.txt"), "w") as f:
            from .train_app import model_summary

            f.write(model_summary(spec, params) + "\n")

        params, bn_state = load_weights(spec, params, bn_state, input_weights_path)
        print("weights loaded")

        if save_model_path:
            print(f"Saving weights loaded model to {save_model_path}: (configurable)")
            save_weights(spec, params, bn_state, os.path.join(save_model_path, "model"))

        from ..data.image import letterbox_resize

        # letterbox: true (extension) — aspect-preserving preprocessing for
        # the per-image modes (image_file/images_dir/video_file); boxes are
        # un-mapped to the original frame and rendered on the original
        # pixels. The reference's plain-resize geometry stays the default
        # (inference.py:148-158); tfrecords mode is already square.
        prep = letterbox_resize if letterbox else resize_bilinear

        calibration_batches = None
        if quantize in ("int8", "int8_chain"):
            # calibrate on up to 8 images from the configured input source
            calib_images = []
            if input_data_source == "tfrecords":
                # parse_tfrecords yields square image_size images already —
                # the reference's letterbox on top is the identity there
                for img, _ in parse_tfrecords(tfrecords_dir, image_size, yolo_max_boxes, None):
                    calib_images.append(img)
                    if len(calib_images) >= 8:
                        break
            elif input_data_source == "video_file":
                cap, _, _ = _open_video(video_file_path)
                try:
                    for frame in _video_frames(cap):
                        calib_images.append(
                            prep(frame, image_size, image_size))
                        if len(calib_images) >= 8:
                            break
                finally:
                    cap.release()
                if not calib_images:
                    raise ValueError(
                        f"no decodable calibration frames in {video_file_path}")
            elif input_data_source == "image_file":
                with open(image_file_path, "rb") as f:
                    orig = decode_image(f.read()).astype(np.float32) / 255.0
                calib_images.append(prep(orig, image_size, image_size))
            else:  # images_dir — shared helper (clear empty-dir error)
                calibration_batches = calibration_batches_from_dir(
                    images_dir, image_size, preprocess=prep)
            if calibration_batches is None:
                if not calib_images:
                    raise ValueError(
                        f"no calibration images from input_data_source="
                        f"{input_data_source!r}")
                calibration_batches = [np.stack(calib_images)]

        mesh = None
        spatial_partitioning = int(spatial_partitioning or 1)
        batched_sources = ("tfrecords", "video_file")
        if data_parallel or spatial_partitioning > 1:
            if data_parallel and input_data_source not in batched_sources:
                # image_file / images_dir predict one image at a time — a
                # batch-sharded jit would reject the (1, H, W, 3) input.
                # (spatial_partitioning alone IS valid there: with the data
                # axis collapsed to 1 the whole mesh works on each image.)
                raise ValueError(
                    "data_parallel requires a batched input_data_source "
                    "(tfrecords/video_file); image_file/images_dir predict "
                    "per-image")
            from ..parallel.mesh import make_data_parallel_mesh

            eff_batch = batch_size if input_data_source in batched_sources else 1
            mesh = make_data_parallel_mesh(eff_batch, spatial=spatial_partitioning)

        predict = make_predictor(
            spec, params, bn_state, anchors_table, nclasses,
            yolo_max_boxes, nms_iou_threshold, nms_score_threshold,
            compute_dtype={"bf16": jnp.bfloat16, "fp32": None, None: None}[compute_precision],
            quantize=quantize, calibration_batches=calibration_batches, mesh=mesh,
            image_size=image_size, nms_per_class=nms_per_class,
        )

        image_counter = 0
        results = []

        def process(batch_images, raw_sizes=None, n_real=None, sink=None,
                    originals=None):
            """Run one compiled batch; render/write the first ``n_real``
            images (tail batches arrive zero-padded to the compiled size).
            ``sink(annotated_pil)`` overrides the per-image jpg save (video
            mode streams annotated frames to a VideoWriter instead).
            ``originals`` (letterbox mode): the full-resolution source
            images — boxes are un-mapped out of the letterbox frame and
            rendered directly on them."""
            nonlocal image_counter
            out = predict(jnp.asarray(batch_images))
            bboxes, class_idx, scores, selected, num_valid = map(np.asarray, out)
            for i in range(len(batch_images) if n_real is None else n_real):
                bb, cc, ss = gather_valid_detections(
                    bboxes[i], class_idx[i], scores[i], selected[i], num_valid[i]
                )
                names = [class_names[int(c)] for c in cc]
                if originals is not None:
                    from ..data.image import letterbox_unmap_boxes

                    oh, ow = originals[i].shape[:2]
                    bb = letterbox_unmap_boxes(bb, oh, ow, image_size, image_size)
                    render_source = originals[i]
                else:
                    render_source = batch_images[i]
                annotated, detections = render_text_annotated_bboxes(
                    render_source, bb, names, ss, bbox_color, font_size
                )
                if raw_sizes is not None and originals is None:
                    annotated = annotated.resize(raw_sizes[i])
                outfile.write(f"{detections}\n")
                outfile.flush()
                if sink is None:
                    annotated.save(f"{output_dir}/detect_{image_counter}.jpg")
                else:
                    sink(annotated)
                image_counter += 1
                results.append((names, bb, ss))

        if input_data_source == "tfrecords":
            # parse_tfrecords yields square image_size images — the
            # reference's letterbox on top (inference.py:119-123) is the
            # identity there (its parser squash-resized first too)
            batch = []
            for img, _ in parse_tfrecords(tfrecords_dir, image_size, yolo_max_boxes, None):
                batch.append(img)
                if len(batch) == batch_size:
                    process(np.stack(batch))
                    batch = []
            if batch:  # pad the tail to the compiled batch size, slice after
                pad = batch_size - len(batch)
                padded = np.stack(batch + [np.zeros_like(batch[0])] * pad)
                process(padded, n_real=len(batch))
        elif input_data_source == "video_file":
            # video mode (extension — the reference has no video path):
            # frames batch to the SAME compiled program as tfrecords mode
            # (static batch_size, zero-padded tail), geometry matches the
            # image_file path (plain square resize); annotated frames
            # stream to <output_dir>/detect.mp4 at the source fps/size,
            # detect.txt gets one tuple line per frame.
            import cv2

            cap, fps, vid_size = _open_video(video_file_path)
            video_out = f"{output_dir}/detect.mp4"
            writer = cv2.VideoWriter(
                video_out, cv2.VideoWriter_fourcc(*"mp4v"), fps, vid_size)
            if not writer.isOpened():
                cap.release()
                raise ValueError(f"cannot open video writer for {video_out}")

            def sink(annotated):
                writer.write(np.asarray(annotated)[:, :, ::-1])  # RGB→BGR

            try:
                batch = []
                sizes = []
                origs = []
                for frame in _video_frames(cap):
                    batch.append(prep(frame, image_size, image_size))
                    sizes.append(vid_size)
                    if letterbox:
                        origs.append(frame)
                    if len(batch) == batch_size:
                        process(np.stack(batch), raw_sizes=sizes, sink=sink,
                                originals=origs if letterbox else None)
                        # videos are unbounded — keep only the freshest
                        # batch's detections in memory (detect.txt has every
                        # frame); the return value is the LAST frames' tuples
                        del results[:-batch_size]
                        batch, sizes, origs = [], [], []
                if batch:
                    pad = batch_size - len(batch)
                    padded = np.stack(batch + [np.zeros_like(batch[0])] * pad)
                    process(padded, raw_sizes=sizes, n_real=len(batch), sink=sink,
                            originals=origs if letterbox else None)
                    del results[:-len(batch)]
            finally:
                cap.release()
                writer.release()
            print(f"wrote {image_counter} annotated frames to {video_out}")
        else:
            if input_data_source == "image_file":
                filenames = [image_file_path]
            elif input_data_source == "images_dir":
                filenames = dir_filelist(images_dir, (".jpeg", ".jpg", ".png", ".bmp"))
            else:
                filenames = []

            for file in filenames:
                with open(file, "rb") as f:
                    orig = decode_image(f.read()).astype(np.float32) / 255.0
                image = prep(orig, image_size, image_size)
                process(image[None], raw_sizes=[(orig.shape[1], orig.shape[0])],
                        originals=[orig] if letterbox else None)

        outfile.close()
        if results:
            names, bb, ss = results[-1]
            for class_name, box, score in zip(names, bb, ss):
                print(f"{class_name} bbox: {box} score: {score}")
        return results
