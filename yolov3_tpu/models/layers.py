"""Primitive layer ops — pure jnp/lax functions, NHWC, static shapes.

Semantics match the reference's Keras layer stack (core/parse_model.py:13-213):
  * convolutional: Darknet padding — 'SAME' for stride 1, explicit
    ((1,0),(1,0)) zero-pad + VALID for stride 2 (parse_model.py:34-35);
    bias only when no BN (:41); LeakyReLU(0.1) (:51-52).
  * batch norm: Keras defaults — eps 1e-3, momentum 0.99, biased batch
    variance, running stats carried as functional state.
  * upsample: nearest-neighbor ×stride (Keras UpSampling2D default).
  * maxpool: Keras MaxPooling2D with configured size/stride/padding.

Convolutions go through ``lax.conv_general_dilated``. fp32 inputs pin
``preferred_element_type=float32``; bf16 inputs keep bf16 *outputs* (the
TPU MXU accumulates fp32 internally either way — materializing fp32
outputs would double activation HBM traffic for nothing; on CPU/GPU test
backends bf16 convs may accumulate at lower precision, which the parity
tests' tolerances absorb).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-3
BN_MOMENTUM = 0.99
LEAKY_SLOPE = 0.1

_DIMSPEC = ("NHWC", "HWIO", "NHWC")
_DIMSPEC_HWNC = ("HWNC", "HWIO", "HWNC")

_LAYOUT = "nhwc"  # see set_layout


def set_layout(mode: str):
    """Whole-model logical layout: "nhwc" (default) or "hwnc".

    "hwnc" runs EVERY intermediate activation logically as (H, W, B, C) —
    row-major physical order then equals the {3,0,2,1} layout XLA picks
    for in-model int8 activations, so XLA's layout-assignment pass has no
    batch-minor/row-major mismatch to reconcile anywhere in the network
    (the full-model version of the per-call-site HWBC trick, PERF.md
    conv1x1 post-mortem). Boundary cost: one input transpose and one tiny
    transpose per head output (network.py). Env YOLOV3_LAYOUT overrides.
    Single-device experiments only — the parallel/ sharding specs address
    the batch axis by NHWC position.
    """
    global _LAYOUT
    assert mode in ("nhwc", "hwnc")
    _LAYOUT = mode


def layout() -> str:
    import os

    return os.environ.get("YOLOV3_LAYOUT", _LAYOUT).lower()


def _dimspec():
    return _DIMSPEC_HWNC if layout() == "hwnc" else _DIMSPEC


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QAct:
    """Quantized activation flowing between layers: symmetric int8 + scale.

    fp value = q * scale. Keeping the int8 representation *between* conv
    kernels (instead of materializing bf16 and re-quantizing at the next
    conv) halves activation HBM traffic and removes the per-conv VPU
    quantize round-trip — the requant is fused into the producing conv's
    epilogue by XLA.

    Deliberately NOT a tuple subclass: the interpreter distinguishes
    single activations from multi-input lists with isinstance checks.
    """

    q: jax.Array      # int8
    scale: jax.Array  # f32 scalar


def dequantize(x: QAct, dtype=jnp.float32):
    return (x.q.astype(jnp.float32) * x.scale).astype(dtype)


def requantize(y32, out_scale):
    """fp32 → symmetric int8 at the given scale (round-half-even like np/TF).

    Multiplies by the reciprocal (computed once, scalar) — out_scale is a
    traced parameter, so XLA does not canonicalize a division by it into a
    multiply inside the big elementwise fusion.
    """
    inv = 1.0 / out_scale
    q = jnp.clip(jnp.round(y32 * inv), -127, 127).astype(jnp.int8)
    return QAct(q, out_scale)


def add_requant(a: QAct, b: QAct, out_scale):
    """Fused shortcut: dequant both int8 inputs, add in fp32, requant.

    One elementwise XLA fusion — loads 2×int8, writes 1×int8.
    """
    y32 = a.q.astype(jnp.float32) * a.scale + b.q.astype(jnp.float32) * b.scale
    return requantize(y32, out_scale)


def conv2d(x, kernel, stride: int, pad: int, explicit_pad=None):
    """Darknet-style conv. kernel: (kh, kw, cin, cout).

    ``explicit_pad``: ((top, bottom), (left, right)) override used by
    geometry-rewriting transforms (ops/s2d.py) whose padding does not fit
    the Darknet stride-1-SAME / stride-2-topleft vocabulary.
    """
    if explicit_pad is not None:
        padding = [tuple(explicit_pad[0]), tuple(explicit_pad[1])]
    elif stride > 1:
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
        dimension_numbers=_dimspec(),
        preferred_element_type=preferred,
    )


_PALLAS_1X1 = False  # "auto" (TPU only) | True | False — see set_pallas_conv1x1
# default off until validated on-chip; flip to "auto" after the on-chip
# exactness + perf check (YOLOV3_PALLAS_1X1=1 overrides)


def set_pallas_conv1x1(mode):
    """Route eligible int8 1×1 convs through the fused Pallas kernel.

    Default is OFF (module-level ``_PALLAS_1X1 = False``): the kernel wins
    standalone but loses in-model to XLA's conv emitter at every measured
    call site (layout copies at the custom-call boundary — PERF.md).
    ``"auto"`` enables it when the default backend is TPU; ``True`` forces
    it; env ``YOLOV3_PALLAS_1X1`` overrides all of these.
    """
    global _PALLAS_1X1
    _PALLAS_1X1 = mode


def _pallas_1x1_enabled() -> bool:
    import os

    env = os.environ.get("YOLOV3_PALLAS_1X1")
    if env is not None:
        return env.strip().lower() not in ("", "0", "false", "off", "no")
    if _PALLAS_1X1 == "auto":
        return jax.default_backend() == "tpu"
    return bool(_PALLAS_1X1)


def conv2d_int8(x, qparams, stride: int, pad: int, leaky: bool = False,
                fp_dtype=jnp.float32, explicit_pad=None):
    """Quantized conv: int8 weights × int8 activations → int32 MXU, rescale.

    qparams: kernel_q int8 (kh,kw,cin,cout); w_scale (cout,) f32 per-channel
    weight scale; in_scale () f32 activation scale (calibrated absmax/127,
    used only when ``x`` is a fp array); bias (cout,) f32 (BN pre-folded);
    optional out_scale () f32 — when present the epilogue (bias + leaky)
    requantizes and a ``QAct`` int8 activation is returned, keeping conv
    chains int8 end-to-end.

    ``x``: fp array (quantized here with in_scale) or QAct (consumed
    directly — a calibrated producer out_scale IS this conv's input scale,
    so no requant happens on linear conv→conv edges).
    """
    if isinstance(x, QAct):
        xq, in_scale = x.q, x.scale
    else:
        in_scale = qparams["in_scale"]
        fp_dtype = x.dtype
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / in_scale), -127, 127).astype(jnp.int8)

    # 1×1 stride-1 convs are matmuls — route through the Pallas kernel that
    # keeps the s32 accumulator and requant epilogue in VMEM, skipping the
    # HBM accumulator round-trip XLA's conv emitter forces (ops/pallas/conv1x1.py)
    kq = qparams["kernel_q"]
    if kq.shape[0] == 1 and kq.shape[1] == 1 and stride == 1 and explicit_pad is None:
        from ..ops.pallas import conv1x1 as _c1

        if _c1.eligible(kq.shape, stride, explicit_pad) and _pallas_1x1_enabled():
            import os as _os

            cin, cout = kq.shape[2], kq.shape[3]
            scale = (qparams["w_scale"] * in_scale).astype(jnp.float32)
            if layout() == "hwnc":
                # activations are already logically (H,W,B,C): the matmul
                # view is a pure reshape, no transpose boundary at all
                shape4 = xq.shape[:3] + (cout,)
                xm = xq.reshape(-1, cin)

                def back(t, _s=shape4):
                    return t.reshape(_s)
            else:
                b, h, w, _ = xq.shape
                # XLA lays in-model int8 activations out {3,0,2,1} (C minor,
                # then B) — row-major for logical (H,W,B,C). Feeding the
                # kernel through that transpose turns the layout change into
                # a bitcast instead of a full-tensor copy on each side of
                # the custom call.
                hwbc = _os.environ.get("YOLOV3_PALLAS_1X1_LAYOUT", "hwbc") == "hwbc"
                if hwbc:
                    xm = xq.transpose(1, 2, 0, 3).reshape(-1, cin)
                else:
                    xm = xq.reshape(-1, cin)

                def back(t):
                    if hwbc:
                        return t.reshape(h, w, b, cout).transpose(2, 0, 1, 3)
                    return t.reshape(b, h, w, cout)

            if "out_scale" in qparams:
                q = _c1.conv1x1_int8_requant(
                    xm, kq.reshape(cin, cout), scale,
                    qparams["bias"], 1.0 / qparams["out_scale"], leaky=leaky)
                return QAct(back(q), qparams["out_scale"])
            y = _c1.conv1x1_int8_requant(
                xm, kq.reshape(cin, cout), scale,
                qparams["bias"], 1.0, leaky=leaky, out_dtype=fp_dtype)
            return back(y)

    if explicit_pad is not None:
        padding = [tuple(explicit_pad[0]), tuple(explicit_pad[1])]
    elif stride > 1:
        padding = [(1, 0), (1, 0)]
    elif pad == 1:
        k = qparams["kernel_q"].shape[0]
        p = (k - 1) // 2
        padding = [(p, k - 1 - p), (p, k - 1 - p)]
    else:
        padding = [(0, 0), (0, 0)]
    # f32 output: the MXU still takes the s8×s8 fast path and accumulates
    # exactly in int32; converting on writeout (instead of materializing the
    # s32 accumulator and converting in a separate fusion) halves the
    # accumulator HBM traffic. f32 holds the exact sums up to 2^24 (products
    # ≤ 127² ≈ 2^14 over ≤ 9·1024 terms ⇒ ~2^27 worst case — ≤1ulp off,
    # far below the int8 quantization noise).
    acc = lax.conv_general_dilated(
        xq,
        qparams["kernel_q"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_dimspec(),
        preferred_element_type=jnp.float32,
    )
    scale = (qparams["w_scale"] * in_scale).astype(jnp.float32)
    y = acc * scale + qparams["bias"]
    if leaky:
        y = leaky_relu(y)
    if "out_scale" in qparams:
        return requantize(y, qparams["out_scale"])
    return y.astype(fp_dtype)


def s2d_phase_kernel_conv0(k):
    """(3,3,cin,cout) → (4,4,cin,4·cout) phase-stacked stem kernel, pure jnp.

    Differentiable twin of ops/s2d.py::_rewrite_conv0_kernel: builds the
    space-to-depth phase kernel *inside* the traced graph from the original
    3×3 kernel, so the rewritten stem trains against the ORIGINAL params —
    the construction is linear (pad + concat), autodiff sums the four phase
    gradients back onto the one 3×3 kernel, which is exactly the gradient
    of the un-rewritten conv (same products, same sums). See ops/s2d.py for
    the geometry derivation.
    """
    groups = [
        jnp.pad(k, ((pi, 1 - pi), (pj, 1 - pj), (0, 0), (0, 0)))
        for pi in range(2) for pj in range(2)
    ]
    return jnp.concatenate(groups, axis=-1)


def s2d_phase_kernel_conv1(k):
    """(3,3,cin,cout) → (2,2,4·cin,cout) phase-consuming kernel, pure jnp.

    Differentiable twin of ops/s2d.py::_rewrite_conv1_kernel. Tap (cdi,cdj)
    of phase group (qi,qj) reads original tap (2·cdi+qi−1, 2·cdj+qj−1);
    taps falling outside the 3×3 window are structural zeros — realized by
    slicing a zero-padded kernel with stride 2.
    """
    kp = jnp.pad(k, ((1, 1), (1, 1), (0, 0), (0, 0)))
    groups = [
        kp[qi:qi + 3:2, qj:qj + 3:2]
        for qi in range(2) for qj in range(2)
    ]
    return jnp.concatenate(groups, axis=2)


def _pallas_bn_stats() -> bool:
    """A/B gate for the fused Pallas BN-statistics kernel (PERF.md)."""
    import os

    return os.environ.get("YOLOV3_PALLAS_BN_STATS", "") == "1"


_BN_STATS_SUBSAMPLE = 1


def set_bn_stats_subsample(s: int):
    """Training-mode BN statistics from a stride-``s`` spatial subsample.

    APPROXIMATION, opt-in (train config ``bn_stats_subsample`` /
    YOLOV3_BN_STATS_SUBSAMPLE): mean/var estimated from every s-th row and
    column instead of all pixels — at B=128 416² a stride-2 estimator
    still sees ≥1.3M samples per channel at the deepest 13² stage (B·7²),
    but the statistics pass reads 1/s² of the activation bytes, attacking
    the ~28 ms/step of convert_reduce/multiply_reduce the Pallas kernel
    could not (PERF.md negative result). Normalization, gradients through
    the subsampled stats, and the running-average update all use the same
    estimate, so train/eval stay consistent.
    """
    global _BN_STATS_SUBSAMPLE
    assert int(s) >= 1
    _BN_STATS_SUBSAMPLE = int(s)


def _bn_stats_subsample() -> int:
    import os

    env = os.environ.get("YOLOV3_BN_STATS_SUBSAMPLE", "")
    return int(env) if env else _BN_STATS_SUBSAMPLE


def batch_norm(x, bn_params, bn_state, train: bool, momentum=BN_MOMENTUM, eps=BN_EPS,
               phases: int = 1):
    """Functional BatchNorm over NHWC (channel axis -1).

    Returns (y, new_state). In training mode statistics are computed over
    (N, H, W) — under a batch-sharded jit this is a *global* mean/var
    (XLA inserts the cross-chip reduction), i.e. sync-BN for free.

    ``phases``: when >1 the channel axis holds ``phases`` spatial-phase
    copies of a ``C = channels/phases``-channel tensor (space-to-depth stem,
    ops/s2d.py) — statistics reduce over the phase groups too (each phase is
    a disjoint set of the original spatial positions, so this is the SAME
    per-channel mean/var as the un-rewritten layout), params/state stay
    per-original-channel (C,), and normalization tiles them across phases.
    """
    gamma = bn_params["gamma"]
    beta = bn_params["beta"]
    if train:
        ss = _bn_stats_subsample()
        if ss > 1:
            h = 0 if layout() == "hwnc" else 1
            # stats-only spatial subsample (set_bn_stats_subsample); the
            # normalization below still touches every pixel of x
            sl = [slice(None)] * x.ndim
            sl[h] = slice(None, None, ss)
            sl[h + 1] = slice(None, None, ss)
            x32 = x[tuple(sl)].astype(jnp.float32)
        else:
            x32 = x.astype(jnp.float32)
        # single-pass statistics: E[x²] − mean² instead of jnp.var's
        # two-pass mean-then-squared-diff — both reductions fuse into ONE
        # traversal of the activation tensor (the train step reads every
        # activation once instead of twice; ~10% step time at B=128).
        # Matches Keras's biased batch variance mathematically; fp32
        # accumulation keeps the cancellation error ~1e-6 relative.
        if phases > 1:
            xr = x32.reshape(*x32.shape[:-1], phases, x32.shape[-1] // phases)
            if _pallas_bn_stats():
                from ..ops.pallas.bn_stats import bn_moments
                mean, var = bn_moments(xr)
            else:
                mean = jnp.mean(xr, axis=(0, 1, 2, 3))
                var = jnp.maximum(jnp.mean(xr * xr, axis=(0, 1, 2, 3)) - mean * mean, 0.0)
        elif _pallas_bn_stats():
            # A/B lever (YOLOV3_PALLAS_BN_STATS=1): fused Pallas sum/sumsq —
            # same f32 reductions, tile-serial order (ops/pallas/bn_stats.py)
            from ..ops.pallas.bn_stats import bn_moments
            mean, var = bn_moments(x if ss == 1 else x32.astype(x.dtype))
        else:
            mean = jnp.mean(x32, axis=(0, 1, 2))
            var = jnp.maximum(jnp.mean(x32 * x32, axis=(0, 1, 2)) - mean * mean, 0.0)
        new_state = {
            "mean": momentum * bn_state["mean"] + (1.0 - momentum) * mean,
            "var": momentum * bn_state["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = bn_state["mean"], bn_state["var"]
        new_state = bn_state
    scale = gamma * lax.rsqrt(var + eps)
    if phases > 1:
        mean, scale, beta = (jnp.tile(v, phases) for v in (mean, scale, beta))
    y = (x - mean.astype(x.dtype)) * scale.astype(x.dtype) + beta.astype(x.dtype)
    return y, new_state


def leaky_relu(x, slope=LEAKY_SLOPE):
    return jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))


def upsample_nearest(x, stride: int):
    h = 0 if layout() == "hwnc" else 1
    x = jnp.repeat(x, stride, axis=h)
    return jnp.repeat(x, stride, axis=h + 1)


def max_pool(x, size_xy, stride_xy, padding: str):
    hwnc = layout() == "hwnc"
    h = 0 if hwnc else 1
    pads = (_pool_same_pads(x.shape[h:h + 2], size_xy, stride_xy)
            if padding.lower() == "same" else [(0, 0), (0, 0)])
    # init must be a Python scalar literal — an Array init makes lax lower to
    # the generic reduce_window primitive, which has no autodiff rule
    if jnp.issubdtype(x.dtype, jnp.floating):
        neg_inf = -jnp.inf
    else:
        neg_inf = x.dtype.type(jnp.iinfo(x.dtype).min)
    wdims = [1, 1, 1, 1]
    wstrides = [1, 1, 1, 1]
    wpads = [(0, 0)] * 4
    wdims[h:h + 2] = [size_xy[0], size_xy[1]]
    wstrides[h:h + 2] = [stride_xy[0], stride_xy[1]]
    wpads[h:h + 2] = [pads[0], pads[1]]
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=tuple(wdims),
        window_strides=tuple(wstrides),
        padding=wpads,
    )


def _pool_same_pads(hw, size_xy, stride_xy):
    pads = []
    for dim, k, s in zip(hw, size_xy, stride_xy):
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
