"""Fused Pallas 1×1 int8 conv (ops/pallas/conv1x1.py): exactness vs an
int32-exact reference, tile-edge masking, and the conv2d_int8 routing.

Runs the kernel in interpret mode (CPU); the perf claim is measured on the
real chip (PERF.md), correctness is pinned here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolov3_tpu.models import layers as L
from yolov3_tpu.ops.pallas import conv1x1 as C


def _ref(xq, wq, scale, bias, inv, leaky, requant):
    """int32-exact reference in plain numpy."""
    acc = xq.astype(np.int32) @ wq.astype(np.int32)
    y = acc.astype(np.float32) * scale + bias
    if leaky:
        y = np.where(y >= 0, y, (y * np.float32(0.1)).astype(np.float32))
    if not requant:
        return y
    q = np.clip(np.round(y * inv), -127, 127)
    return q.astype(np.int8)


@pytest.mark.parametrize("m,k,n", [(512, 128, 256), (169, 256, 128), (1024, 64, 32)])
@pytest.mark.parametrize("leaky", [True, False])
def test_kernel_exact_vs_int32_reference(m, k, n, leaky):
    """m=169 exercises the padded trailing block (tile 256 > m)."""
    rng = np.random.RandomState(m + n)
    xq = rng.randint(-127, 128, (m, k)).astype(np.int8)
    wq = rng.randint(-127, 128, (k, n)).astype(np.int8)
    scale = (rng.rand(n) * 1e-2).astype(np.float32)
    bias = rng.randn(n).astype(np.float32)
    inv = np.float32(17.0)

    out = C.conv1x1_int8_requant(jnp.asarray(xq), jnp.asarray(wq),
                                 jnp.asarray(scale), jnp.asarray(bias), inv,
                                 leaky=leaky, interpret=True)
    ref = _ref(xq, wq, scale, bias, inv, leaky, requant=True)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_kernel_fp_output_path():
    rng = np.random.RandomState(7)
    m, k, n = 300, 128, 64  # non-divisible m again
    xq = rng.randint(-127, 128, (m, k)).astype(np.int8)
    wq = rng.randint(-127, 128, (k, n)).astype(np.int8)
    scale = (rng.rand(n) * 1e-2).astype(np.float32)
    bias = rng.randn(n).astype(np.float32)
    out = C.conv1x1_int8_requant(jnp.asarray(xq), jnp.asarray(wq),
                                 jnp.asarray(scale), jnp.asarray(bias), 1.0,
                                 leaky=True, out_dtype=jnp.float32, interpret=True)
    ref = _ref(xq, wq, scale, bias, 1.0, leaky=True, requant=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_conv2d_int8_routes_through_kernel(monkeypatch):
    """With the switch forced on (interpret mode), conv2d_int8's 1×1 path
    must produce the same QAct chain results as the XLA path."""
    # ambient A/B-sweep env vars would override the monkeypatched switch
    # (env wins in _pallas_1x1_enabled) and make this test vacuous
    for var in ("YOLOV3_PALLAS_1X1", "YOLOV3_PALLAS_1X1_MIN_CIN",
                "YOLOV3_PALLAS_1X1_MIN_COUT", "YOLOV3_PALLAS_1X1_LAYOUT"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setattr(C, "_INTERPRET", True)
    monkeypatch.setattr(L, "_PALLAS_1X1", False)

    rng = np.random.RandomState(0)
    # channels must clear the MIN_CIN/MIN_COUT gates so the 1×1 routes
    b, h, cin, cout = 2, 13, C.MIN_CIN, C.MIN_COUT
    x = L.QAct(jnp.asarray(rng.randint(-127, 128, (b, h, h, cin)), jnp.int8),
               jnp.float32(0.04))
    qparams = {
        "kernel_q": jnp.asarray(rng.randint(-127, 128, (1, 1, cin, cout)), jnp.int8),
        "w_scale": jnp.asarray((rng.rand(cout) * 1e-2).astype(np.float32)),
        "bias": jnp.asarray(rng.randn(cout).astype(np.float32)),
        "out_scale": jnp.float32(0.07),
        "in_scale": jnp.float32(0.04),
    }
    ref = L.conv2d_int8(x, qparams, stride=1, pad=1, leaky=True)

    monkeypatch.setattr(L, "_PALLAS_1X1", True)
    out = L.conv2d_int8(x, qparams, stride=1, pad=1, leaky=True)
    assert isinstance(out, L.QAct) and isinstance(ref, L.QAct)
    # XLA path accumulates in f32 (exact here: |acc| << 2^24), kernel in s32
    np.testing.assert_array_equal(np.asarray(out.q), np.asarray(ref.q))
    np.testing.assert_allclose(float(out.scale), float(ref.scale))

    # fp-output (no out_scale) mode
    q2 = {k: v for k, v in qparams.items() if k != "out_scale"}
    xf = jnp.asarray(rng.rand(b, h, h, cin).astype(np.float32))
    monkeypatch.setattr(L, "_PALLAS_1X1", False)
    ref_f = L.conv2d_int8(xf, q2, stride=1, pad=1, leaky=True)
    monkeypatch.setattr(L, "_PALLAS_1X1", True)
    out_f = L.conv2d_int8(xf, q2, stride=1, pad=1, leaky=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               rtol=1e-6, atol=1e-6)

    # 3×3 / strided convs must NOT route through the kernel
    q3 = dict(qparams)
    q3["kernel_q"] = jnp.asarray(rng.randint(-127, 128, (3, 3, cin, cout)), jnp.int8)
    out3 = L.conv2d_int8(x, q3, stride=1, pad=1, leaky=True)
    assert isinstance(out3, L.QAct)  # runs the XLA path fine


def test_eligibility(monkeypatch):
    for var in ("YOLOV3_PALLAS_1X1_MIN_CIN", "YOLOV3_PALLAS_1X1_MIN_COUT"):
        monkeypatch.delenv(var, raising=False)
    big = (1, 1, C.MIN_CIN, C.MIN_COUT)
    assert C.eligible(big, 1, None)
    assert not C.eligible((3, 3, C.MIN_CIN, C.MIN_COUT), 1, None)
    assert not C.eligible(big, 2, None)
    assert not C.eligible(big, 1, ((1, 0), (1, 0)))
    # channel gates: small early-stem layers stay on the XLA conv path
    # (batch-minor in-model layouts make the custom call a net loss there)
    assert not C.eligible((1, 1, 64, 32), 1, None)
    assert not C.eligible((1, 1, 128, C.MIN_COUT), 1, None)
