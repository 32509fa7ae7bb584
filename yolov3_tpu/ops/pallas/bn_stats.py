"""Pallas TPU kernel: fused per-channel sum/sum-of-squares reduction for
training-mode BatchNorm statistics.

The train step's BN statistics pass (models/layers.py::batch_norm, train
branch) reads every activation tensor once per layer: XLA fuses
``mean(x)`` and ``mean(x·x)`` into one ``convert_reduce`` traversal, which
the round-2 profile attributes 21.0 ms/step at B=128 416² (PERF.md,
training breakdown). That fusion is already single-pass; the remaining
headroom is scheduling (reduction epilogues, f32 convert placement), so
this kernel is an A/B experiment per VERDICT r2 item 2: stream bf16
activation tiles through VMEM once, accumulate f32 sum/sumsq per channel
in a revisited output block, and hand back exactly the two reductions.

Layout: the NHWC activation reshapes (bitcast, row-major) to rows of
``g·C`` lanes where ``g = max(1, 128 // C)`` — full 128-lane utilization
even for the stem's C=32 — and the per-group partials fold outside the
kernel (a (g, C) sum, trivial). Accumulation across grid steps relies on
the TPU grid's sequential execution (same revisiting-output pattern as
ops/pallas/conv1x1.py's K loop).

Exactness: fp32 accumulation of bf16 inputs, identical to XLA's
convert_reduce up to reduction ORDER (tile-serial here vs XLA's tree;
both are f32 sums of the same terms — tests bound the difference at
~1e-6 relative, the same tolerance the E[x²]−mean² rewrite already
documents).

Usage is gated behind ``bn_stats: pallas`` (train config) /
YOLOV3_PALLAS_BN_STATS=1 — measured A/B decides the default (PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _kernel(x_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...].astype(jnp.float32)
    out_ref[0, :] += jnp.sum(x, axis=0)
    out_ref[1, :] += jnp.sum(x * x, axis=0)


def bn_sums(x, interpret: bool | None = None):
    """Per-channel (sum, sumsq) of an NHWC activation, one HBM pass.

    Args:
      x: (..., C) activation, any float dtype; all leading axes reduce.
      interpret: run in Pallas interpret mode; None = auto (interpret
        everywhere but real TPU, so CPU tests/virtual meshes just work).

    Returns:
      (sum, sumsq): two (C,) float32 vectors.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c = x.shape[-1]
    n = x.size // c
    g = max(1, _LANES // c)
    lanes = g * c

    # rows must tile evenly into (bt, lanes) blocks: pick bt from the
    # divisors of n // g (all our shapes are powers of two; fall back to a
    # zero-padded tail for odd sizes — zeros are sum/sumsq-neutral)
    rows = n // g if n % g == 0 else n // g + 1
    bt = 512
    while bt > 1 and rows % bt:
        bt //= 2
    if n % g or rows % bt:
        rows_padded = -(-rows // bt) * bt
        pad_elems = rows_padded * lanes - n * c
        flat = jnp.pad(x.reshape(-1), (0, pad_elems))
        rows = rows_padded
        x2d = flat.reshape(rows, lanes)
    else:
        x2d = x.reshape(rows, lanes)

    out = pl.pallas_call(
        _kernel,
        grid=(rows // bt,),
        in_specs=[pl.BlockSpec((bt, lanes), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, lanes), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, lanes), jnp.float32),
        interpret=interpret,
    )(x2d)
    s = out[0].reshape(g, c).sum(axis=0)
    s2 = out[1].reshape(g, c).sum(axis=0)
    return s, s2


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def bn_moments(x, interpret: bool | None = None):
    """(mean, biased var) over all non-channel axes via the fused kernel.

    Drop-in for the jnp one-pass statistics in models/layers.py::batch_norm;
    the custom VJP is the analytic gradient of (mean, E[x²]−mean²), the
    same expression autodiff derives for the jnp version, so training math
    is unchanged up to reduction order.
    """
    mean, var, _ = _moments_fwd_impl(x, interpret)
    return mean, var


def _moments_fwd_impl(x, interpret):
    n = x.size // x.shape[-1]
    s, s2 = bn_sums(x, interpret=interpret)
    mean = s / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return mean, var, n


def _moments_fwd(x, interpret):
    mean, var, n = _moments_fwd_impl(x, interpret)
    return (mean, var), (x, mean, n)


def _moments_bwd(interpret, res, cts):
    x, mean, n = res
    dmean, dvar = cts
    # d/dx of mean: dmean/n;   of var = E[x²]−mean²: (2x/n − 2·mean/n)·dvar
    inv_n = 1.0 / n
    dx = (dmean * inv_n + dvar * (2.0 * inv_n) * (x.astype(jnp.float32) - mean))
    return (dx.astype(x.dtype),)


bn_moments.defvjp(_moments_fwd, _moments_bwd)
