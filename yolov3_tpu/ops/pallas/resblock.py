"""Pallas TPU kernel: fused Darknet residual block, int8 end-to-end in VMEM.

Why (PERF.md): per-conv Pallas custom calls measurably lose in-model —
XLA's `{3,0,2,1}` int8 intermediate layouts force full-tensor copies at
every custom-call boundary, and the channel-gate sweep showed every
individual call site is net-negative. The only Pallas shape that can pay
is multi-conv fusion: ONE boundary pair per residual *stage* (8 blocks at
26², 4 at 13²), with every intermediate of every block — the 1×1 squeeze
accumulator, its requant, the 3×3 accumulator, its requant, and the
shortcut add — living entirely in VMEM.

Layout: activations travel between fused blocks as a flat zero-halo
matrix ``(B·(H+2)·(W+2), C)`` int8 — each row is one (possibly halo)
pixel. In this layout the 3×3 conv is 9 *flat row shifts* + matmuls:
pixel (b,i,j) sits at row ((b·(H+2))+i)·(W+2)+j, so neighbor (di,dj) is
exactly ``off = di·(W+2)+dj`` rows away, and the zero halo provides SAME
padding for free. Shifted reads come from a guard-padded VMEM scratch so
they are static slices (no rolls — `pltpu.roll` on int8 crashes Mosaic,
see PERF.md). Halo rows compute garbage (bias→leaky→requant of a zero
accumulator) and are re-zeroed by a mask before each use, preserving the
halo invariant block to block.

Math per block (bit-compatible with the unfused chain path in
models/network.py: conv2d_int8 → conv2d_int8 → add_requant, except
accumulation here is exact int32 vs XLA's f32 — identical ≤2^24):

    q1 = requant(leaky(acc1·scale1 + bias1), s1)      # 1×1 squeeze C→Cm
    q2 = requant(leaky(acc2·scale2 + bias2), s2)      # 3×3 expand Cm→C
    out = requant(xq·s_x + q2·s2, s_out)              # shortcut add

Reference anchor: core/parse_model.py:143-160 (shortcut) over the
backbone residual pairs (config/models/yolov3/backbone.yaml).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:  # pragma: no cover
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # noqa: BLE001
    _PALLAS_OK = False

from .common import leaky as _leaky, requant_clip


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def halo_mask(h: int, w: int) -> np.ndarray:
    """(Hp·Wp,) int8 mask: 1 on interior pixels, 0 on the halo ring."""
    m = np.zeros((h + 2, w + 2), np.int8)
    m[1:h + 1, 1:w + 1] = 1
    return m.reshape(-1)


def to_halo(x):
    """(B,H,W,C) → flat zero-halo matrix (B·(H+2)·(W+2), C)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return xp.reshape(b * (h + 2) * (w + 2), c)


def from_halo(xp, b: int, h: int, w: int):
    """Inverse of to_halo: slice the interior back to (B,H,W,C)."""
    c = xp.shape[1]
    x4 = xp.reshape(b, h + 2, w + 2, c)
    return x4[:, 1:h + 1, 1:w + 1, :]


def _kernel(xp_ref, w1_ref, w2_ref, s1_ref, b1_ref, s2_ref, b2_ref,
            mask_ref, sc_ref, out_ref, a1x_ref, *, hp: int, wp: int,
            guard: int, rows: int):
    """One grid step: ``bt`` images' flat halo rows through a whole block.

    sc_ref (SMEM, (1,4)): [inv_s1, s2_scale, s_x, inv_out]; the conv2
    requant reciprocal rides in s2_ref's second row (per-channel lane
    broadcast is free, SMEM scalars are not vectorized).
    """
    xq = xp_ref[:]                                           # (rows, C) int8
    # --- 1×1 squeeze: matmul + requant epilogue ---
    acc1 = lax.dot_general(xq, w1_ref[:], (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.int32)
    y1 = acc1.astype(jnp.float32) * s1_ref[0:1] + b1_ref[0:1]
    q1 = requant_clip(_leaky(y1), sc_ref[0, 0]).astype(jnp.int8)
    # re-zero halo rows (bias garbage there); select, not multiply —
    # Mosaic has no int8 muli lowering
    keep = mask_ref[:] != 0
    q1 = jnp.where(keep, q1, 0)

    # --- 3×3 as 9 shifted matmuls from guard-padded scratch ---
    zg = jnp.zeros((guard, q1.shape[1]), jnp.int8)
    a1x_ref[0:guard, :] = zg
    a1x_ref[guard:guard + rows, :] = q1
    a1x_ref[guard + rows:guard + rows + guard, :] = zg
    # 9 shifted dots accumulated in s32. The concat-K alternative (im2col
    # gather into one (rows, 9·Cm) buffer + ONE dot) measured 8% SLOWER at
    # 26²: the sublane-unaligned VMEM copies cost more than the 8 vector
    # adds they replace.
    cm = q1.shape[1]
    acc2 = None
    for dy in range(3):
        for dx in range(3):
            off = (dy - 1) * wp + (dx - 1)
            sl = a1x_ref[guard + off:guard + off + rows, :]
            p = lax.dot_general(sl, w2_ref[(dy * 3 + dx) * cm:(dy * 3 + dx + 1) * cm, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            acc2 = p if acc2 is None else acc2 + p
    y2 = acc2.astype(jnp.float32) * s2_ref[0:1] + b2_ref[0:1]
    q2 = requant_clip(_leaky(y2), s2_ref[1:2])

    # --- shortcut: dequant-add-requant (models/layers.py::add_requant) ---
    yf = xq.astype(jnp.float32) * sc_ref[0, 2] + q2 * sc_ref[0, 1]
    qo = requant_clip(yf, sc_ref[0, 3]).astype(jnp.int8)
    out_ref[:] = jnp.where(keep, qo, 0)


_INTERPRET = False  # tests flip this


def fused_resblock(xp, w1, w2, scale1, bias1, inv_s1, scale2, bias2,
                   inv_s2, s2, s_x, inv_out, *, b: int, h: int, w: int,
                   bt: int | None = None, interpret: bool | None = None):
    """One residual block over the flat zero-halo layout.

    xp (B·(H+2)·(W+2), C) int8 zero-halo; w1 (C, Cm) int8; w2 (9, Cm, C)
    int8 (tap-major, tap = dy·3+dx); scale1/bias1 (Cm,) f32 with
    scale1 = w1_scale·s_x; scale2/bias2 (C,) f32 with scale2 = w2_scale·s1;
    inv_s1/inv_s2 = in-graph reciprocals of the conv out_scales (pass the
    same 1.0/scale values the unfused requantize computes, for bit
    parity); s2/s_x/inv_out are the shortcut-add scalars. Returns the
    same-shape flat halo matrix at scale 1/inv_out.
    """
    if interpret is None:
        interpret = _INTERPRET
    hp, wp = h + 2, w + 2
    rows_img = hp * wp
    c = xp.shape[1]
    cm = w1.shape[1]
    # Mosaic needs the row-block divisible by 8 (sublane tile); the
    # interpreter (CPU tests) has no such constraint
    def ok(t):
        return b % t == 0 and (interpret or (t * rows_img) % 8 == 0)

    if bt is None:
        # fit the s32 accumulators + scratch in ~8 MiB
        budget_bt = max(1, min(b, (8 * 2**20) // (rows_img * (8 * c + 5 * cm))))
        bt = budget_bt
        while bt > 1 and not ok(bt):
            bt -= 1
        if not ok(bt):  # odd rows/img: grow to the first aligned multiple
            bt = next((t for t in range(1, b + 1) if ok(t)), None)
            if bt is None:
                raise ValueError(
                    f"no batch tile for B={b}, rows/img={rows_img} with "
                    f"rows%8==0 — pass bt explicitly")
            if bt > budget_bt:
                # regrowing past the budget-derived tile would exceed VMEM
                # (e.g. 13² C=1024: odd rows/img forces bt%8==0 but bt=8
                # needs ~24.7 MB) — fail fast instead of a Mosaic
                # allocation error at compile time
                raise ValueError(
                    f"aligned batch tile bt={bt} exceeds the VMEM budget "
                    f"(budget allows bt≤{budget_bt}) for B={b}, "
                    f"rows/img={rows_img}, C={c} — this shape needs a "
                    f"channel-split grid; pass bt explicitly to override")
    rows = bt * rows_img
    if not ok(bt):
        raise ValueError(f"bt={bt} invalid for B={b}, rows/img={rows_img}")
    guard = _round_up(wp + 1, 8)
    mask = jnp.asarray(np.tile(halo_mask(h, w), bt).reshape(rows, 1))
    sc = jnp.stack([jnp.asarray(inv_s1, jnp.float32),
                    jnp.asarray(s2, jnp.float32),
                    jnp.asarray(s_x, jnp.float32),
                    jnp.asarray(inv_out, jnp.float32)]).reshape(1, 4)
    s2v = jnp.stack([scale2.astype(jnp.float32),
                     jnp.broadcast_to(jnp.asarray(inv_s2, jnp.float32), (c,))])
    kern = functools.partial(_kernel, hp=hp, wp=wp, guard=guard, rows=rows)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(xp.shape, jnp.int8),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cm), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cm, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cm), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows + 2 * guard, cm), jnp.int8)],
        interpret=interpret,
    )(xp, w1, w2.reshape(9 * cm, c), scale1.reshape(1, cm).astype(jnp.float32),
      bias1.reshape(1, cm).astype(jnp.float32), s2v,
      bias2.reshape(1, c).astype(jnp.float32), mask, sc)
