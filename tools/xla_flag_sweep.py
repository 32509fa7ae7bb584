#!/usr/bin/env python
"""Bounded XLA:TPU / libtpu compiler-flag sweep over bench.py (VERDICT r3 item 6).

Rounds 1-3 established 2,800 img/s as the inference ceiling under XLA's
DEFAULT compiler settings (per-call-site Pallas, whole-block fusion, and
a whole-model layout flip all measured negative or neutral — PERF.md).
Exactly one compiler knob was ever A/B'd (xla_tpu_scoped_vmem_limit_kib,
+2%, baked into bench.py). This script closes the remaining lever: a
scripted sweep of documented/discoverable `xla_tpu_*` knobs, each run as
a fresh `python bench.py` subprocess with the combo in LIBTPU_INIT_ARGS.

Methodology:
  * the flag universe was enumerated from the installed libtpu.so
    (`strings` → 864 xla_tpu_* names); the swept subset is the
    single-chip-inference-relevant slice (VMEM budget, fusion cost
    models, schedulers, layout/vectorizer toggles) — collective/SPMD/
    sparse-core knobs are irrelevant to the 1-chip bench;
  * the persistent compile cache is DISABLED per run (its key does not
    include LIBTPU_INIT_ARGS, so cached executables would alias combos);
  * a deliberately-starved control (vmem=16384) must HURT throughput —
    proving the flags actually reach the compiler through the tunnel
    stack; if it doesn't, the whole sweep is recorded as non-probative;
  * an unknown/rejected flag exits non-zero and is recorded as
    "unsupported", not silently skipped.

Writes output/xla_flag_sweep.json; each row {combo, img_per_sec, delta}.

Usage (real TPU chip, ~2 min/combo):
  python tools/xla_flag_sweep.py [--quantize int8] [--only vmem]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE_VMEM = "--xla_tpu_scoped_vmem_limit_kib=65536"

# name -> list of libtpu flags (BASE_VMEM is implied unless the combo
# overrides it; bench.py only appends its default when absent)
COMBOS = {
    "default(vmem64k)": [],
    # --- VMEM budget curve (only knob ever swept before; widen it) ---
    "vmem32k": ["--xla_tpu_scoped_vmem_limit_kib=32768"],
    "vmem48k": ["--xla_tpu_scoped_vmem_limit_kib=49152"],
    "vmem96k": ["--xla_tpu_scoped_vmem_limit_kib=98304"],
    "vmem128k": ["--xla_tpu_scoped_vmem_limit_kib=131072"],
    # control: starving scoped VMEM must hurt, or flags aren't landing
    "control_vmem16k": ["--xla_tpu_scoped_vmem_limit_kib=16384"],
    # --- fusion cost models / emitters ---
    "exp_fusion_cost_model": ["--xla_tpu_enable_experimental_fusion_cost_model=true"],
    "aggressive_loop_fusion_layout": ["--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"],
    "conv_input_fusion_downcast": ["--xla_tpu_allow_conv_input_fusion_with_downcast_convert=true"],
    "input_fusion_reduce_ops": ["--xla_tpu_allow_input_fusion_in_certain_reduce_ops=true"],
    "copy_fusion_off": ["--xla_tpu_enable_copy_fusion=false"],
    "dot_dot_fusion": ["--xla_tpu_dot_dot_fusion=true"],
    "pincer_short_emitter": ["--xla_tpu_enable_pincer_short_emitter=true"],
    "sublane_bitcast_fusion": ["--xla_tpu_enable_sublane_major_scaling_bitcast_fusion=true"],
    # --- schedulers ---
    "latency_hiding_sched": ["--xla_tpu_enable_latency_hiding_scheduler=true"],
    "all_experimental_sched": ["--xla_tpu_enable_all_experimental_scheduler_features=true"],
    "pipelined_loop_unrolling": ["--xla_tpu_enable_pipelined_loop_unrolling=true"],
    # --- vectorizer / math / layout ---
    "bf16_slp_vectorizer": ["--xla_tpu_enable_bf16_slp_vectorizer=true"],
    "packed_bf16_math": ["--xla_tpu_impure_enable_packed_bf16_math_ops=true"],
    "fast_exp": ["--xla_tpu_accurate_exp=false"],
    "dot_strength_reduction_off": ["--xla_tpu_enable_dot_strength_reduction=false"],
    "vmem_to_vmem_dmas": ["--xla_tpu_enable_vmem_to_vmem_dmas=true"],
    "indexing_opts": ["--xla_tpu_enable_indexing_optimizations=true"],
    "layout_negotiation": ["--xla_tpu_allow_layout_negotiation=true"],
    "autotune_fusions": ["--xla_tpu_autotune_fusions=true"],
}


def run_bench(flags, quantize, timeout):
    env = dict(os.environ)
    env.pop("YOLOV3_TPU_COMPILE_CACHE", None)  # cache key excludes libtpu args
    args = list(flags)
    if not any("scoped_vmem_limit" in f for f in args):
        args.append(BASE_VMEM)
    env["LIBTPU_INIT_ARGS"] = " ".join(args)
    env["BENCH_QUANTIZE"] = quantize
    t0 = time.time()
    try:
        proc = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                              capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "wall_s": round(time.time() - t0, 1)}
    wall = round(time.time() - t0, 1)
    for line in proc.stdout.splitlines():
        try:
            d = json.loads(line)
            if "value" in d:
                return {"status": "ok", "img_per_sec": d["value"], "wall_s": wall}
        except ValueError:
            continue
    return {"status": "unsupported" if proc.returncode else "no_output",
            "wall_s": wall,
            "stderr_tail": (proc.stderr or proc.stdout)[-400:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantize", default="int8",
                    help="bench serving tier (headline default int8)")
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("--only", default=None,
                    help="comma-separated substring filters over combo "
                         "names (a combo runs if ANY token matches)")
    ap.add_argument("--out", default="output/xla_flag_sweep.json")
    args = ap.parse_args()

    rows = {}
    for name, flags in COMBOS.items():
        if args.only and not any(tok and tok in name
                                 for tok in args.only.split(",")):
            continue
        rows[name] = dict(run_bench(flags, args.quantize, args.timeout),
                          flags=flags or [BASE_VMEM])
        print(json.dumps({"combo": name, **{k: v for k, v in rows[name].items()
                                            if k != "flags"}}), flush=True)

    base = rows.get("default(vmem64k)", {}).get("img_per_sec")
    if base:
        for name, r in rows.items():
            if r.get("img_per_sec"):
                r["delta_pct"] = round(100 * (r["img_per_sec"] / base - 1), 2)
        control = rows.get("control_vmem16k", {})
        rows["_probative"] = bool(control.get("img_per_sec") is None
                                  or control.get("delta_pct", 0) < -1.0)
    out = {"quantize": args.quantize, "rows": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    ranked = sorted((r for r in rows.values() if isinstance(r, dict)
                     and r.get("img_per_sec")),
                    key=lambda r: -r["img_per_sec"])
    print(json.dumps({"best": ranked[0] if ranked else None,
                      "probative": rows.get("_probative")}))


if __name__ == "__main__":
    main()
