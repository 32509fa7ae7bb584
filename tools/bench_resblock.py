"""On-chip A/B: fused Pallas residual block vs the unfused XLA int8 chain.

Measures one Darknet residual block (1×1 squeeze → 3×3 expand → shortcut
add, int8 chain semantics) at the production stage shapes. Methodology is
bench.py's: data generated ON device (the tunnel data plane is ~MB/s),
ITERS iterations chained inside one jit (each iteration's input is the
previous output — same shape/dtype by construction, zero host
involvement), completion forced via a scalar checksum fetch.

    python tools/bench_resblock.py [--iters 50] [--b 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--stages", default="13,26")
    ap.add_argument("--bt", type=int, default=None)
    args = ap.parse_args()

    from yolov3_tpu.models import layers as L
    from yolov3_tpu.ops.pallas import resblock as R

    for hw in (int(s) for s in args.stages.split(",")):
        c = 1024 if hw == 13 else (512 if hw == 26 else 256)
        cm = c // 2
        b = args.b
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        xq = jax.random.randint(ks[0], (b, hw, hw, c), -127, 128, jnp.int8)
        w1 = jax.random.randint(ks[1], (1, 1, c, cm), -127, 128, jnp.int8)
        w2 = jax.random.randint(ks[2], (3, 3, cm, c), -127, 128, jnp.int8)
        sc1 = jax.random.uniform(ks[3], (cm,), jnp.float32, 1e-4, 1e-3)
        b1 = jax.random.normal(ks[4], (cm,), jnp.float32)
        sc2 = jax.random.uniform(ks[5], (c,), jnp.float32, 1e-5, 1e-4)
        b2 = jax.random.normal(ks[6], (c,), jnp.float32)
        s_x, s1, s2, s_out = (jnp.float32(v) for v in (0.0413, 0.0518, 0.0727, 0.0611))

        q1p = {"kernel_q": w1, "w_scale": sc1, "bias": b1, "out_scale": s1}
        q2p = {"kernel_q": w2, "w_scale": sc2, "bias": b2, "out_scale": s2}

        def xla_block(x):
            a = L.conv2d_int8(x, q1p, stride=1, pad=1, leaky=True)
            a = L.conv2d_int8(a, q2p, stride=1, pad=1, leaky=True)
            return L.add_requant(x, a, s_out)

        # chained iterations: output QAct scale differs from input scale —
        # rescale is a lie numerically but shape/dtype-exact, which is all
        # a throughput measurement needs
        @jax.jit
        def run_xla(xq):
            def step(carry, _):
                out = xla_block(L.QAct(carry, s_x))
                return out.q, ()
            final, _ = lax.scan(step, xq, None, length=args.iters)
            return jnp.sum(jnp.abs(final.astype(jnp.int32)))

        w1f = w1.reshape(c, cm)
        w2f = w2.reshape(9, cm, c)
        inv1 = 1.0 / s1
        inv2 = 1.0 / s2
        inv_out = 1.0 / s_out
        scale1 = sc1 * s_x
        scale2 = sc2 * s1

        @jax.jit
        def run_fused(xp):
            def step(carry, _):
                out = R.fused_resblock(carry, w1f, w2f, scale1, b1, inv1,
                                       scale2, b2, inv2, s2, s_x, inv_out,
                                       b=b, h=hw, w=hw, bt=args.bt)
                return out, ()
            final, _ = lax.scan(step, xp, None, length=args.iters)
            return jnp.sum(jnp.abs(final.astype(jnp.int32)))

        xp = jax.jit(lambda x: R.to_halo(x))(xq)

        flops = 2 * b * hw * hw * (c * cm + 9 * cm * c) * args.iters

        for name, fn, inp in (("xla  ", run_xla, xq), ("pallas", run_fused, xp)):
            try:
                float(fn(inp))  # compile + warm
                t0 = time.perf_counter()
                float(fn(inp))
                dt = time.perf_counter() - t0
                ms = dt / args.iters * 1e3
                print(f"{hw}x{hw} c={c}: {name} {ms:7.3f} ms/block  "
                      f"{flops / dt / 1e12:6.1f} TOPS")
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"{hw}x{hw} c={c}: {name} FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
