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


def calibrate_scales(spec, folded_params, images_batches):
    """One jitted calibration pass → (conv-input absmax, layer-output absmax).

    Input absmax keys: (sm_name, layer_key) of each conv's input tensor.
    Output absmax keys: (sm_name, layer_key) of EVERY layer's output (after
    activation) — used as the requant scale when conv chains stay int8.
    """

    def fwd(params, images):
        in_taps, out_taps = {}, {}

        def in_obs(sm_name, layer_key, x):
            in_taps[(sm_name, layer_key)] = jnp.max(jnp.abs(x.astype(jnp.float32)))

        def out_obs(sm_name, layer_key, x):
            out_taps[(sm_name, layer_key)] = jnp.max(jnp.abs(x.astype(jnp.float32)))

        apply_model(spec, params, {}, images, train=False,
                    conv_observer=in_obs, out_observer=out_obs)
        return in_taps, out_taps

    fwd = jax.jit(fwd)
    in_absmax: dict = {}
    out_absmax: dict = {}
    for images in images_batches:
        in_taps, out_taps = fwd(folded_params, jnp.asarray(images))
        for acc, taps in ((in_absmax, in_taps), (out_absmax, out_taps)):
            for key, val in taps.items():
                acc[key] = max(acc.get(key, 0.0), float(val))
    return in_absmax, out_absmax


def calibrate_activation_scales(spec, folded_params, images_batches):
    """Per-conv input abs-max over calibration batches → {(sm, layer): float}."""
    return calibrate_scales(spec, folded_params, images_batches)[0]


def quantized_conv_skips(spec, skip_final_convs: bool = True, min_k2cin: int = 0):
    """Set of ``(sm_name, layer_key)`` conv taps the int8 serving tier
    leaves in fp: the final head convs (``skip_final_convs``) plus — in the
    mixed-precision serving mode — convs whose contraction size
    kernel²·Cin is below ``min_k2cin``. Shared by ``quantize_params`` /
    ``fake_quant_weights`` / ``make_activation_fake_quant`` so the QAT
    training lattice matches the actual serving configuration."""
    skips = head_conv_taps(spec) if skip_final_convs else set()
    if min_k2cin:
        from ..models.network import _infer_channels

        per_layer = _infer_channels(spec)
        for sm in spec.sub_models:
            for i, layer in enumerate(sm.layers):
                if layer.kind != "convolutional":
                    continue
                cin, _ = per_layer[(sm.name, i)]
                if layer["size"] ** 2 * cin < min_k2cin:
                    skips.add((sm.name, f"layer{i}"))
    return skips


def quantize_params(spec, folded_params, act_absmax, skip_final_convs: bool = True,
                    out_absmax=None, min_k2cin: int = 0):
    """BN-folded params → int8-quantized params.

    Per-output-channel symmetric weight quantization; activation scale =
    calibrated absmax / 127. Convs flagged for skipping (final head convs)
    keep their fp params.

    With ``out_absmax`` (layer-output absmax from ``calibrate_scales``),
    chain mode: each quantized conv additionally carries ``out_scale`` so
    its epilogue emits int8 directly, and each shortcut layer gets an
    ``out_scale`` entry for the fused dequant-add-requant — activations
    then stay int8 end-to-end between convs (half the HBM traffic of bf16,
    no per-conv VPU quantize round-trip).

    ``min_k2cin``: skip convs whose contraction size kernel²·Cin is below
    this threshold. Those layers are HBM-bound, not MXU-bound — int8 pays a
    separate requant kernel (s32 accumulator read + s8 write) that costs
    more than the halved MXU time saves, so high-resolution/low-channel
    stem layers run faster in bf16 (mixed-precision inference).
    """
    final_convs = quantized_conv_skips(spec, skip_final_convs, min_k2cin)

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
            if out_absmax is not None and out_absmax.get(tap, 0.0) > 0:
                sm_q[key]["out_scale"] = jnp.float32(out_absmax[tap] / 127.0)
        if out_absmax is not None:
            for i, layer in enumerate(sm.layers):
                key = f"layer{i}"
                tap = (sm.name, key)
                if layer.kind == "shortcut" and out_absmax.get(tap, 0.0) > 0:
                    sm_q[key] = {"out_scale": jnp.float32(out_absmax[tap] / 127.0)}
        qparams[sm.name] = sm_q
    return qparams


# ---------------------------------------------------------------------------
# Weight-only quantization-aware training (QAT)
# ---------------------------------------------------------------------------


def fake_quant_kernel(kernel):
    """Straight-through-estimator fake-quant of one conv kernel.

    Forward: snap to the per-output-channel symmetric int8 lattice —
    EXACTLY ``quantize_params``' weight scheme (absmax/127 scale,
    round-half-even, clip ±127). Backward: identity (STE), so the fp32
    master keeps training through the rounding.

    Fold-invariance: BN folding multiplies the kernel by a per-output-
    channel factor s; both the per-channel absmax and the values scale by
    |s| together, so the quantized INTEGERS after folding equal
    sign(s) × the integers before folding and the dequantized products are
    identical. Training against this lattice therefore trains against the
    exact weight error the int8 serving tier (PTQ on folded kernels) will
    realize.
    """
    k32 = kernel.astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(k32), axis=(0, 1, 2)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(k32 / w_scale), -127, 127) * w_scale
    return kernel + jax.lax.stop_gradient(q.astype(kernel.dtype) - kernel)


def fake_quant_activation(x):
    """STE fake-quant of one activation tensor on the serving int8 lattice.

    Forward: per-tensor symmetric int8 — dynamic absmax/127 scale,
    round-half-even, clip ±127 — the same lattice ``conv2d_int8`` realizes
    on conv inputs at serving time (there the scale is the *calibrated*
    absmax; here it is the batch's own, the standard QAT approximation —
    serving recalibrates on the trained weights anyway, so what training
    must adapt to is the rounding noise, not the exact scale value).
    Backward: identity (STE). Scale math in fp32 regardless of the
    activation dtype (mirrors ``fake_quant_kernel``).
    """
    x32 = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127) * scale
    return x + jax.lax.stop_gradient(q.astype(x.dtype) - x)


def make_activation_fake_quant(spec, skip_final_convs: bool = True,
                               min_k2cin: int = 0):
    """→ ``transform(sm_name, layer_key, x)`` for apply_model's
    ``conv_input_transform``: fake-quants every conv input the int8 serving
    tier would quantize; the inputs of the convs feeding yolo layers pass
    through untouched, as do (with ``min_k2cin``) the convs the
    mixed-precision serving mode keeps in bf16 — same skip set as
    ``quantize_params`` (``quantized_conv_skips``)."""
    final = quantized_conv_skips(spec, skip_final_convs, min_k2cin)

    def transform(sm_name, layer_key, x):
        if (sm_name, layer_key) in final:
            return x
        return fake_quant_activation(x)

    return transform


def fake_quant_weights(spec, params, skip_final_convs: bool = True,
                       min_k2cin: int = 0):
    """Fake-quant every conv kernel the int8 serving tier would quantize.

    The convs feeding yolo layers stay fp (mirrors ``quantize_params``'
    ``skip_final_convs`` default — box/score logits stay precision-clean);
    ``min_k2cin`` additionally skips the convs a mixed-precision serving
    config keeps in bf16 (``quantized_conv_skips``).
    BN params/biases are untouched: serving folds BN into the kernel and
    the lattice commutes with the fold (see ``fake_quant_kernel``).
    """
    final = quantized_conv_skips(spec, skip_final_convs, min_k2cin)
    out = {}
    for sm in spec.sub_models:
        sm_p = {}
        for key, entry in params[sm.name].items():
            if (sm.name, key) in final or "kernel" not in entry:
                sm_p[key] = entry
            else:
                e = dict(entry)
                e["kernel"] = fake_quant_kernel(entry["kernel"])
                sm_p[key] = e
        out[sm.name] = sm_p
    return out
