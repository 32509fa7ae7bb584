"""Pallas TPU kernel for the greedy NMS suppression sweep.

The suppression recurrence (keep[i] = valid[i] ∧ ¬suppressed[i];
suppressed |= keep[i] ∧ IoU[i,:] > thr for later boxes) is inherently
sequential in i, but each step is one K-wide VPU op. Running it as a
Pallas kernel keeps the whole K×K decision matrix and the running
suppression vector resident in VMEM across all K steps — no per-step XLA
while-loop carry traffic — with one grid step per image.

Layout: K is padded to a multiple of 128 (lane width). Masks are kept as
float32 {0,1} rows of shape (1, K) — the natural VPU tile — and the
decision matrix is precomputed (outside) as float32 {0,1}.

Off-TPU, pass ``interpret=True`` explicitly (the CPU tests do) — this
module does no backend detection; the transparent scan fallback lives in
the caller's gate (ops/nms.py::yolo_nms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# largest K whose (K,K) f32 decision block fits VMEM with double-buffering
# headroom (K=1024 → 4 MiB/block vs ~16 MiB/core on v5e; K=2048 → 16 MiB
# would already fail Mosaic allocation)
MAX_SWEEP_K = 1024


def _suppress_kernel(suppress_mat_ref, valid_ref, keep_ref, sup_scratch):
    """One image: suppress_mat (K,K) {0,1}; valid (1,K); keep out (1,K).

    Lane-dynamic scalar reads/writes are avoided: scalars are extracted by
    one-hot reduction and keep bits accumulated with one-hot adds — every
    step is a handful of K-wide VPU ops on VMEM-resident rows.
    """
    k = valid_ref.shape[1]
    sup_scratch[...] = jnp.zeros((1, k), jnp.float32)
    keep_ref[...] = jnp.zeros((1, k), jnp.float32)
    lanes = lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, _):
        onehot = (lanes == i).astype(jnp.float32)
        sup_i = jnp.sum(sup_scratch[...] * onehot)
        valid_i = jnp.sum(valid_ref[...] * onehot)
        keep_i = valid_i * (1.0 - sup_i)
        keep_ref[...] = keep_ref[...] + keep_i * onehot
        # a kept box suppresses every later box with IoU above threshold
        row = suppress_mat_ref[i, :]
        later = (lanes > i).astype(jnp.float32)
        sup_scratch[...] = jnp.maximum(sup_scratch[...], keep_i * row[None, :] * later)
        return 0

    lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_suppression_sweep(suppress_mat, valid, interpret: bool = False):
    """Batched sweep. suppress_mat: (B, K, K) float {0,1} — IoU > threshold;
    valid: (B, K) float {0,1} — score above threshold. Returns keep (B, K)
    float {0,1}. K must be a multiple of 128."""
    b, k, _ = suppress_mat.shape
    if k % 128 and not interpret:
        raise ValueError(f"K={k} must be a multiple of 128")
    if k > MAX_SWEEP_K and not interpret:
        # the (K,K) f32 block must fit VMEM (~16 MiB/core on v5e) with
        # double-buffering headroom; callers gate on this constant to keep
        # the documented silent-scan fallback
        raise ValueError(f"K={k} exceeds the VMEM-feasible bound {MAX_SWEEP_K}")
    return pl.pallas_call(
        _suppress_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, k, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, k), jnp.float32)],
        interpret=interpret,
    )(
        suppress_mat.astype(jnp.float32),
        valid.astype(jnp.float32).reshape(b, 1, k),
    )[:, 0, :]


def reference_sweep(suppress_mat, valid):
    """jnp scan with identical semantics (for parity tests / fallback)."""
    b, k, _ = suppress_mat.shape

    def one(mat, val):
        def body(i, carry):
            keep, sup = carry
            keep_i = val[i] * (1.0 - sup[i])
            keep = keep.at[i].set(keep_i)
            later = (lax.broadcasted_iota(jnp.int32, (k,), 0) > i).astype(jnp.float32)
            sup = jnp.maximum(sup, keep_i * mat[i] * later)
            return keep, sup

        keep, _ = lax.fori_loop(0, k, body, (jnp.zeros(k), jnp.zeros(k)))
        return keep

    return jax.vmap(one)(suppress_mat.astype(jnp.float32), valid.astype(jnp.float32))
