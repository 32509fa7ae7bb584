"""Pallas TPU kernel: fused 1×1 int8 conv — matmul + requant epilogue in VMEM.

Why this exists (PERF.md "Where the int8 time goes"): XLA:TPU always
materializes a convolution's accumulator to HBM (negative-results entry —
``preferred_element_type`` does not change that), so every int8 1×1 conv
pays write+read of a 4-byte accumulator per output element before the
requant epilogue (scale·acc + bias → leaky → round/clip → int8). For the
HBM-bound 1×1 squeeze convs of Darknet-53 that accumulator round-trip is
~4.5× the useful int8 traffic (measured ~31-34 TOPS vs the 394 TOPS v5e
peak).

A 1×1 stride-1 conv over NHWC is exactly a matmul: x (B·H·W, Cin) @
w (Cin, Cout). Unlike the 3×3 case (where a Pallas im2col kernel measurably
LOSES to XLA's conv emitter — PERF.md), the 1×1 case needs no data
rearrangement, so the whole layer becomes: DMA int8 x tile → MXU s8×s8→s32
dot → epilogue on the f32 copy in VMEM → DMA int8 q tile out. HBM traffic
drops from ~(1+4+4+1) to (1+1) bytes per element.

Accumulation here is exact int32 (vs the XLA path's f32-accumulate, itself
exact to 2^24 — see layers.conv2d_int8); the epilogue math is the same op
sequence, so results are bit-equal to the XLA path except for the
documented ≤1-ulp f32-reassociation ties of the conv emitter itself.

Reference anchor: this fuses what core/parse_model.py:37-52 expresses as
Conv2D(1×1)+BN+LeakyReLU after BN-fold + int8 quantization (ops/quantize).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:  # pragma: no cover - exercised implicitly on import
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # noqa: BLE001 - any import failure → XLA fallback
    _PALLAS_OK = False

from .common import LEAKY_SLOPE, leaky as _leaky, requant_clip  # noqa: F401 (LEAKY_SLOPE re-export)

# VMEM working-set budget per grid step (bytes). v5e has ~16 MiB/core;
# leave room for double-buffered DMA of the x/out tiles.
_VMEM_BUDGET = 6 * 2**20


def _kernel(x_ref, w_ref, scale_ref, bias_ref, inv_ref, out_ref, *, leaky: bool,
            requant: bool):
    acc = lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    if leaky:
        y = _leaky(y)
    if requant:
        out_ref[:] = requant_clip(y, inv_ref[0, 0]).astype(jnp.int8)
    else:
        out_ref[:] = y.astype(out_ref.dtype)


def _pick_tile_m(m: int, k: int, n: int) -> int:
    """Largest power-of-two row tile fitting the VMEM budget (≥256).

    Raises when even the minimum tile cannot fit alongside the resident
    (k, n) weight block — a clear diagnostic instead of a Mosaic
    allocation failure (unreachable at Darknet shapes, which cap at 1024
    channels; guards generic callers)."""
    # per-row bytes: x k·1, acc n·4 (+f32 epilogue copy n·4), out n·1
    per_row = k + 9 * n
    weight_block = k * n  # int8, resident across all grid steps
    tile = 256
    if weight_block + tile * per_row > _VMEM_BUDGET:
        raise ValueError(
            f"conv1x1 shapes (k={k}, n={n}) exceed the VMEM budget even at "
            f"the minimum 256-row tile; use the XLA conv path")
    while (weight_block + tile * 2 * per_row <= _VMEM_BUDGET
           and tile * 2 <= max(256, m)):
        tile *= 2
    return tile


_INTERPRET = False  # tests flip this to run the kernel on CPU


def conv1x1_int8_requant(xq, wq, scale, bias, inv_out_scale, *, leaky: bool,
                         out_dtype=jnp.int8, interpret: bool | None = None):
    """Fused q = requant(leaky(scale·(xq@wq) + bias)).

    xq (M, Cin) int8; wq (Cin, Cout) int8; scale/bias (Cout,) f32
    (scale = w_scale·in_scale, bias BN-folded); inv_out_scale () f32 —
    pass 0 with ``out_dtype=jnp.float32`` to skip requant and emit fp.
    Returns (M, Cout) ``out_dtype``. M need not divide the tile: trailing
    blocks are padded on read and masked on write by Pallas.
    """
    if not _PALLAS_OK:
        raise RuntimeError(
            "jax.experimental.pallas unavailable in this environment — "
            "use the XLA conv path (models/layers.py::conv2d_int8)")
    if interpret is None:
        interpret = _INTERPRET
    m, k = xq.shape
    n = wq.shape[1]
    tile_m = _pick_tile_m(m, k, n)
    requant = out_dtype == jnp.int8
    kern = functools.partial(_kernel, leaky=leaky, requant=requant)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=(pl.cdiv(m, tile_m),),
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xq, wq.astype(jnp.int8), scale.reshape(1, n).astype(jnp.float32),
      bias.reshape(1, n).astype(jnp.float32),
      jnp.asarray(inv_out_scale, jnp.float32).reshape(1, 1))


# Channel gates: only layers whose operands fill the 128-lane VPU/MXU and
# whose activations XLA keeps row-major in-model. Early high-resolution
# layers (cin 64/128) are laid out batch-minor inside the full program —
# a Pallas custom call there forces transpose copies that cost more than
# the accumulator round-trip it saves (measured end-to-end, PERF.md).
MIN_CIN = 256
MIN_COUT = 128


def _gates():
    import os

    return (int(os.environ.get("YOLOV3_PALLAS_1X1_MIN_CIN", MIN_CIN)),
            int(os.environ.get("YOLOV3_PALLAS_1X1_MIN_COUT", MIN_COUT)))


def eligible(kernel_q_shape, stride: int, explicit_pad) -> bool:
    """Structural check: is this conv the 1×1 stride-1 matmul case?"""
    kh, kw, cin, cout = kernel_q_shape
    min_cin, min_cout = _gates()
    return (_PALLAS_OK and kh == 1 and kw == 1 and stride == 1
            and explicit_pad is None and cin >= min_cin and cout >= min_cout)
