#!/usr/bin/env python
"""Browser (TFJS) export — reference utilities/convert_model_to_tfjs.py analog.

The reference shells out to ``tensorflowjs_converter`` on a Keras
SavedModel. Here the TFJS graph-model (model.json + weight shards — what
``js/src/inference.js`` loads with ``tf.loadGraphModel``) is written by a
pure-Python converter (``yolov3_tpu/export/tfjs_graph.py``): the BN-folded
model is re-emitted as a flat TF GraphDef of TFJS-registry ops and the
Const payloads are extracted into 4 MB shards. The tensorflowjs CLI is
never needed — and deliberately never used: jax2tf under current JAX emits
XlaCallModule-only graphs, so running the CLI on our SavedModel would
produce a browser-unusable artifact. A jax2tf SavedModel is still exported
alongside (the reference's ``model.save`` artifact; useful for TF
serving), and the reference's L2→L1L2 regularizer-name patch is applied to
model.json for parity.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def load_folded_model(model_config_file, weights_path, classes_name_file):
    """(spec, folded_params) — parse, load weights, fold BN, once."""
    import jax

    from yolov3_tpu.config import count_file_lines
    from yolov3_tpu.io.resolve import load_weights
    from yolov3_tpu.models import fold_batch_norm, init_model, parse_model_config

    nclasses = count_file_lines(classes_name_file)
    spec = parse_model_config(model_config_file, nclasses)
    params, state = init_model(jax.random.PRNGKey(0), spec)
    params, state = load_weights(spec, params, state, weights_path)
    return spec, fold_batch_norm(params, state)


def export_saved_model(model_config_file, weights_path, classes_name_file,
                       image_size, out_dir, prebuilt=None):
    from yolov3_tpu.models import apply_model

    spec, folded = prebuilt or load_folded_model(
        model_config_file, weights_path, classes_name_file)

    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError as e:
        raise SystemExit(f"SavedModel export requires tensorflow + jax2tf: {e}")

    def fwd(images):
        outs, _ = apply_model(spec, folded, {}, images, train=False)
        return tuple(outs)

    tf_fn = tf.function(
        jax2tf.convert(fwd, with_gradient=False),
        input_signature=[tf.TensorSpec((1, image_size, image_size, 3), tf.float32)],
        autograph=False,
    )
    module = tf.Module()
    module.__call__ = tf_fn
    tf.saved_model.save(module, out_dir)
    print(f"SavedModel written to {out_dir}")
    return out_dir


def export_tfjs_graph_model(model_config_file, weights_path, classes_name_file,
                            image_size, out_dir, prebuilt=None, quantize=None):
    """Pure-Python TFJS graph-model export (no tensorflowjs CLI).

    ``quantize``: None | "uint8" | "uint16" — affine manifest quantization
    (the official converter's --quantize_uint8/16; 4×/2× smaller download).
    """
    from yolov3_tpu.export import build_tf_graph, write_graph_model
    from yolov3_tpu.models.network import head_grid_sizes

    spec, folded = prebuilt or load_folded_model(
        model_config_file, weights_path, classes_name_file)

    graph_def, input_name, output_names = build_tf_graph(spec, folded, image_size)
    grids = head_grid_sizes(spec, image_size)
    output_shapes = [(1, g, g, 3, 5 + spec.nclasses) for g in grids]
    path = write_graph_model(graph_def, out_dir, input_name, output_names,
                             (1, image_size, image_size, 3), output_shapes,
                             quantize=quantize)
    patch_model_json(out_dir)
    print(f"TFJS graph model written to {path}"
          + (f" (weights {quantize}-quantized)" if quantize else ""))
    return path


def patch_model_json(tfjs_dir):
    """Reference patch: '"L2"' → '"L1L2"' regularizer class name."""
    path = os.path.join(tfjs_dir, "model.json")
    if not os.path.exists(path):
        return
    with open(path) as f:
        content = f.read()
    with open(path, "w") as f:
        f.write(content.replace('"L2"', '"L1L2"'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_config_file", required=True)
    parser.add_argument("--weights_path", required=True)
    parser.add_argument("--classes_name_file", required=True)
    parser.add_argument("--image_size", type=int, default=416)
    parser.add_argument("--saved_model_dir", default="/tmp/yolov3_saved_model")
    parser.add_argument("--tfjs_out_dir", default="/tmp/yolov3_tfjs")
    parser.add_argument("--quantize", choices=["uint8", "uint16"], default=None,
                        help="affine-quantize manifest weights (smaller download)")
    args = parser.parse_args()

    prebuilt = load_folded_model(args.model_config_file, args.weights_path,
                                 args.classes_name_file)
    export_saved_model(args.model_config_file, args.weights_path,
                       args.classes_name_file, args.image_size,
                       args.saved_model_dir, prebuilt=prebuilt)
    export_tfjs_graph_model(args.model_config_file, args.weights_path,
                            args.classes_name_file, args.image_size,
                            args.tfjs_out_dir, prebuilt=prebuilt,
                            quantize=args.quantize)


if __name__ == "__main__":
    main()
