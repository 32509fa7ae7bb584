"""Post-training int8 quantization for inference (experimental serving tier).

TPU v5e has 2× int8 MXU throughput over bf16. This module provides:
  * ``calibrate_activation_scales`` — run sample batches through the
    BN-folded model collecting per-conv input abs-max (one jit, taps
    returned as outputs — no eager layer-by-layer dispatch);
  * ``quantize_params`` — per-output-channel symmetric int8 weights +
    calibrated per-tensor input scales; BN must be folded first (bias
    stays fp32);
  * the quantized forward runs through the regular interpreter — a conv
    whose params carry ``kernel_q`` takes the int8 path
    (models/layers.py::conv2d_int8).

The heads' final 1×1 convs are kept in bf16/fp32 by default
(``skip_final_convs``): box/score logits are precision-sensitive and those
layers are a negligible FLOP share.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.network import apply_model


def head_conv_taps(spec):
    """(sm_name, layer_key) of the conv feeding each yolo layer.

    Walks backwards from EVERY yolo layer to its nearest preceding conv —
    correct for both per-sub-model head configs (one yolo per sub-model)
    and compact single-file specs where several heads share one sub-model.
    """
    taps = set()
    for sm in spec.sub_models:
        for j, layer in enumerate(sm.layers):
            if layer.kind != "yolo":
                continue
            for i in range(j - 1, -1, -1):
                if sm.layers[i].kind == "convolutional":
                    taps.add((sm.name, f"layer{i}"))
                    break
    return taps


def calibrate_activation_scales(spec, folded_params, images_batches):
    """Per-conv input abs-max over calibration batches → {(sm, layer): float}."""
    taps_order = []

    def make_forward():
        def fwd(params, images):
            taps = {}

            def observer(sm_name, layer_key, x):
                taps[(sm_name, layer_key)] = jnp.max(jnp.abs(x.astype(jnp.float32)))

            apply_model(spec, params, {}, images, train=False, conv_observer=observer)
            return taps

        return jax.jit(fwd)

    fwd = make_forward()
    absmax: dict = {}
    for images in images_batches:
        taps = fwd(folded_params, jnp.asarray(images))
        for key, val in taps.items():
            val = float(val)
            absmax[key] = max(absmax.get(key, 0.0), val)
    return absmax


def quantize_params(spec, folded_params, act_absmax, skip_final_convs: bool = True):
    """BN-folded params → int8-quantized params.

    Per-output-channel symmetric weight quantization; activation scale =
    calibrated absmax / 127. Convs flagged for skipping (final head convs)
    keep their fp params.
    """
    final_convs = head_conv_taps(spec) if skip_final_convs else set()

    qparams = {}
    for sm in spec.sub_models:
        sm_q = {}
        for key, entry in folded_params[sm.name].items():
            tap = (sm.name, key)
            if tap in final_convs or tap not in act_absmax or act_absmax[tap] <= 0:
                sm_q[key] = dict(entry)
                continue
            kernel = np.asarray(entry["kernel"], np.float32)
            w_absmax = np.maximum(np.abs(kernel).max(axis=(0, 1, 2)), 1e-12)  # (cout,)
            w_scale = w_absmax / 127.0
            kernel_q = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
            sm_q[key] = {
                "kernel_q": jnp.asarray(kernel_q),
                "w_scale": jnp.asarray(w_scale, jnp.float32),
                "in_scale": jnp.float32(act_absmax[tap] / 127.0),
                "bias": jnp.asarray(entry.get("bias", np.zeros(kernel.shape[-1], np.float32)),
                                    jnp.float32),
            }
        qparams[sm.name] = sm_q
    return qparams
