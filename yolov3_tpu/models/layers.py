"""Primitive layer ops — pure jnp/lax functions, NHWC, static shapes.

Semantics match the reference's Keras layer stack (core/parse_model.py:13-213):
  * convolutional: Darknet padding — 'SAME' for stride 1, explicit
    ((1,0),(1,0)) zero-pad + VALID for stride 2 (parse_model.py:34-35);
    bias only when no BN (:41); LeakyReLU(0.1) (:51-52).
  * batch norm: Keras defaults — eps 1e-3, momentum 0.99, biased batch
    variance, running stats carried as functional state.
  * upsample: nearest-neighbor ×stride (Keras UpSampling2D default).
  * maxpool: Keras MaxPooling2D with configured size/stride/padding.

All convolutions go through ``lax.conv_general_dilated`` with
``preferred_element_type=float32`` so bf16 activations/weights still
accumulate in fp32 on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-3
BN_MOMENTUM = 0.99
LEAKY_SLOPE = 0.1

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(x, kernel, stride: int, pad: int):
    """Darknet-style conv. kernel: (kh, kw, cin, cout)."""
    if stride > 1:
        # ZeroPadding2D(((1, 0), (1, 0))) + VALID — top/left pad only.
        padding = [(1, 0), (1, 0)]
    elif pad == 1:
        k = kernel.shape[0]
        p = (k - 1) // 2
        padding = [(p, k - 1 - p), (p, k - 1 - p)]
    else:
        padding = [(0, 0), (0, 0)]
    # low-precision activations stay low-precision (MXU still accumulates
    # fp32 internally); fp32 stays fp32 end-to-end
    preferred = jnp.float32 if x.dtype == jnp.float32 else None
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DIMSPEC,
        preferred_element_type=preferred,
    )


def conv2d_int8(x, qparams, stride: int, pad: int):
    """Quantized conv: int8 weights × int8 activations → int32 MXU, rescale.

    qparams: kernel_q int8 (kh,kw,cin,cout); w_scale (cout,) f32 per-channel
    weight scale; in_scale () f32 activation scale (calibrated absmax/127);
    bias (cout,) f32 (BN pre-folded). Output dtype follows the input's.
    """
    in_scale = qparams["in_scale"]
    inv = 1.0 / in_scale
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(jnp.int8)
    if stride > 1:
        padding = [(1, 0), (1, 0)]
    elif pad == 1:
        k = qparams["kernel_q"].shape[0]
        p = (k - 1) // 2
        padding = [(p, k - 1 - p), (p, k - 1 - p)]
    else:
        padding = [(0, 0), (0, 0)]
    acc = lax.conv_general_dilated(
        xq,
        qparams["kernel_q"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DIMSPEC,
        preferred_element_type=jnp.int32,
    )
    scale = (qparams["w_scale"] * in_scale).astype(jnp.float32)
    y = acc.astype(jnp.float32) * scale + qparams["bias"]
    return y.astype(x.dtype)


def batch_norm(x, bn_params, bn_state, train: bool, momentum=BN_MOMENTUM, eps=BN_EPS):
    """Functional BatchNorm over NHWC (channel axis -1).

    Returns (y, new_state). In training mode statistics are computed over
    (N, H, W) — under a batch-sharded jit this is a *global* mean/var
    (XLA inserts the cross-chip reduction), i.e. sync-BN for free.
    """
    gamma = bn_params["gamma"]
    beta = bn_params["beta"]
    if train:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
        new_state = {
            "mean": momentum * bn_state["mean"] + (1.0 - momentum) * mean,
            "var": momentum * bn_state["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = bn_state["mean"], bn_state["var"]
        new_state = bn_state
    scale = gamma * lax.rsqrt(var + eps)
    y = (x - mean.astype(x.dtype)) * scale.astype(x.dtype) + beta.astype(x.dtype)
    return y, new_state


def leaky_relu(x, slope=LEAKY_SLOPE):
    return jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))


def upsample_nearest(x, stride: int):
    x = jnp.repeat(x, stride, axis=1)
    return jnp.repeat(x, stride, axis=2)


def max_pool(x, size_xy, stride_xy, padding: str):
    pads = _pool_same_pads(x.shape, size_xy, stride_xy) if padding.lower() == "same" else [(0, 0), (0, 0)]
    # init must be a Python scalar literal — an Array init makes lax lower to
    # the generic reduce_window primitive, which has no autodiff rule
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, size_xy[0], size_xy[1], 1),
        window_strides=(1, stride_xy[0], stride_xy[1], 1),
        padding=[(0, 0), pads[0], pads[1], (0, 0)],
    )


def _pool_same_pads(shape, size_xy, stride_xy):
    pads = []
    for dim, k, s in zip(shape[1:3], size_xy, stride_xy):
        out = -(-dim // s)  # ceil
        total = max((out - 1) * s + k - dim, 0)
        pads.append((total // 2, total - total // 2))
    return pads


def glorot_uniform(key, shape, dtype=jnp.float32):
    """Keras Conv2D default kernel init (glorot_uniform over HWIO)."""
    kh, kw, cin, cout = shape
    fan_in = kh * kw * cin
    fan_out = kh * kw * cout
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)
