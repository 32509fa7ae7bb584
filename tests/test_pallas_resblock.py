"""Fused residual-block kernel (ops/pallas/resblock.py): exactness vs an
int32-exact numpy reference of the unfused chain math
(conv2d_int8 1×1 → conv2d_int8 3×3 → add_requant), halo-layout helpers,
and the halo invariant (output halo stays zero)."""

import numpy as np
import jax.numpy as jnp
import pytest

from yolov3_tpu.ops.pallas import resblock as R


def _leaky(y):
    return np.where(y >= 0, y, (y * np.float32(0.1)).astype(np.float32))


def _rq(y, inv):
    return np.clip(np.round(y * np.float32(inv)), -127, 127)


def _ref_block(xq, w1, w2, scale1, bias1, inv1, scale2, bias2, inv2, s2, s_x, inv_out):
    """(B,H,W,C) int8 → (B,H,W,C) int8 via exact int32 conv math.

    Takes the same f32 reciprocals the kernel receives, so rounding ties
    cannot diverge between reference and kernel."""
    b, h, w, c = xq.shape
    cm = w1.shape[1]
    acc1 = xq.astype(np.int32) @ w1.astype(np.int32)        # 1×1
    q1 = _rq(_leaky(acc1.astype(np.float32) * scale1 + bias1), inv1)
    q1p = np.zeros((b, h + 2, w + 2, cm), np.int32)
    q1p[:, 1:h + 1, 1:w + 1] = q1
    acc2 = np.zeros((b, h, w, c), np.int64)
    for dy in range(3):
        for dx in range(3):
            acc2 += q1p[:, dy:dy + h, dx:dx + w].astype(np.int64) @ \
                w2[dy * 3 + dx].astype(np.int64)
    q2 = _rq(_leaky(acc2.astype(np.float32) * scale2 + bias2), inv2)
    yf = xq.astype(np.float32) * np.float32(s_x) + q2.astype(np.float32) * np.float32(s2)
    return _rq(yf, inv_out).astype(np.int8)


@pytest.mark.parametrize("b,h,w,c,cm", [(2, 13, 13, 128, 64), (1, 7, 9, 256, 128)])
def test_fused_block_exact(b, h, w, c, cm):
    rng = np.random.RandomState(c + h)
    xq = rng.randint(-127, 128, (b, h, w, c)).astype(np.int8)
    w1 = rng.randint(-127, 128, (c, cm)).astype(np.int8)
    w2 = rng.randint(-20, 21, (9, cm, c)).astype(np.int8)  # keep acc2 < 2^31
    scale1 = (rng.rand(cm) * 1e-3 + 1e-4).astype(np.float32)
    bias1 = rng.randn(cm).astype(np.float32)
    scale2 = (rng.rand(c) * 1e-4 + 1e-5).astype(np.float32)
    bias2 = rng.randn(c).astype(np.float32)
    # non-round scales: with "nice" ratios (e.g. 0.04/0.07/0.06) the
    # requant products land on a coarse lattice hitting exact .5f ties,
    # where the fused kernel's fma contraction may round differently than
    # the unfused reference (same caveat class as XLA's own conv
    # reassociation ties). Calibrated production scales are never lattice.
    s2, s_x = np.float32(0.07273), np.float32(0.04131)
    inv1, inv2, inv_out = (np.float32(1.0 / np.float32(s))
                           for s in (0.05177, 0.07273, 0.06113))

    ref = _ref_block(xq, w1, w2, scale1, bias1, inv1, scale2, bias2, inv2,
                     s2, s_x, inv_out)

    xp = R.to_halo(jnp.asarray(xq))
    out = R.fused_resblock(
        xp, jnp.asarray(w1), jnp.asarray(w2),
        jnp.asarray(scale1), jnp.asarray(bias1), inv1,
        jnp.asarray(scale2), jnp.asarray(bias2), inv2,
        s2, s_x, inv_out,
        b=b, h=h, w=w, interpret=True)
    # output halo must be zero (the invariant the next block relies on)
    out4 = np.asarray(out).reshape(b, h + 2, w + 2, c)
    assert out4[:, 0].max() == 0 and out4[:, -1].max() == 0
    assert out4[:, :, 0].max() == 0 and out4[:, :, -1].max() == 0
    np.testing.assert_array_equal(np.asarray(R.from_halo(out, b, h, w)), ref)


def test_halo_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randint(-127, 128, (3, 5, 6, 32)).astype(np.int8)
    xp = R.to_halo(jnp.asarray(x))
    assert xp.shape == (3 * 7 * 8, 32)
    np.testing.assert_array_equal(np.asarray(R.from_halo(xp, 3, 5, 6)), x)


def test_batch_tiling_divisor():
    """bt auto-pick must divide B and fit the budget."""
    rng = np.random.RandomState(1)
    b, h, w, c, cm = 6, 5, 5, 128, 64
    xq = rng.randint(-127, 128, (b, h, w, c)).astype(np.int8)
    w1 = rng.randint(-127, 128, (c, cm)).astype(np.int8)
    w2 = rng.randint(-20, 21, (9, cm, c)).astype(np.int8)
    ones_m = np.ones(cm, np.float32)
    ones_c = np.ones(c, np.float32)
    args = (ones_m * 1.07e-3, 0 * ones_m, np.float32(19.31),
            ones_c * 1.13e-4, 0 * ones_c, np.float32(14.77),
            np.float32(0.0677), np.float32(0.0413), np.float32(16.13))
    out = R.fused_resblock(
        R.to_halo(jnp.asarray(xq)), jnp.asarray(w1), jnp.asarray(w2),
        jnp.asarray(args[0]), jnp.asarray(args[1]), args[2],
        jnp.asarray(args[3]), jnp.asarray(args[4]), args[5],
        args[6], args[7], args[8],
        b=b, h=h, w=w, interpret=True)
    ref = _ref_block(xq, w1, w2, *args)
    np.testing.assert_array_equal(np.asarray(R.from_halo(out, b, h, w)), ref)


def test_auto_bt_fails_fast_when_alignment_exceeds_budget():
    """13² C=1024 (odd rows/img): the sublane-aligned batch tile (bt=8)
    needs ~24.7 MB VMEM — auto-pick must raise a clear ValueError instead
    of selecting it and dying in Mosaic's allocator at compile time."""
    b, h, w, c, cm = 128, 13, 13, 1024, 512
    xp = jnp.zeros(((h + 2) * (w + 2) * b, c), jnp.int8)
    w1 = jnp.zeros((c, cm), jnp.int8)
    w2 = jnp.zeros((9, cm, c), jnp.int8)
    ones_m = jnp.ones(cm, jnp.float32)
    ones_c = jnp.ones(c, jnp.float32)
    with pytest.raises(ValueError, match="VMEM budget"):
        R.fused_resblock(xp, w1, w2, ones_m, ones_m, 1.0,
                         ones_c, ones_c, 1.0, 0.1, 0.1, 1.0,
                         b=b, h=h, w=w, interpret=False)
