#!/usr/bin/env python
"""Profile the production guided step on-device and print a per-op budget.

Runs a short respaced guided chain (the exact bench.py workload) under
``jax.profiler.trace`` — which works through the axon PJRT relay — then
parses the TensorBoard trace (plugins/profile/ trace.json.gz, perfetto
JSON, stdlib-parseable) and aggregates device-lane event durations into op
categories (conv fwd/bwd, big elementwise fusions, reductions, copies, dots).

This is the measurement loop behind PERF.md's per-step budget tables:

    python tools/profile_guided.py --steps 10 [--out /tmp/osmosis_trace]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


V5E_PEAK_TFLOPS = 197.0  # bf16
V5E_HBM_GBS = 819.0


def short_tf_op(tf_op: str) -> str:
    """jit(_run)/while/body/.../jvp(UNetModel)/in_1_0/in_conv/conv_... →
    a compact fwd|bwd + layer label."""
    if not tf_op:
        return ""
    parts = tf_op.split("/")
    direction = "bwd" if any("transpose" in p for p in parts) else "fwd"
    keep = [p for p in parts
            if re.match(r"(in|mid|out)_\d+(_\d+)?$", p)
            or p in ("in_conv", "out_conv", "skip", "qkv", "proj",
                     "in_norm", "out_norm", "time_dense0", "time_dense1")]
    return f"{direction} " + "/".join(keep) if keep else direction


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1,
                    help="image batch for the guided step (batch>1 profiles "
                         "the single-chip fleet pathology, PERF.md)")
    ap.add_argument("--out", default="/tmp/osmosis_trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--parse-only", action="store_true",
                    help="skip the run; parse an existing --out dir")
    args = ap.parse_args()

    if not args.parse_only:
        import jax
        import numpy as np

        import bench
        from osmosis_tpu.utils.compilation_cache import enable as _enable

        _enable()
        bench.BENCH_STEPS = args.steps
        run, params, x, y = bench.build_guided_run(batch=args.batch)
        key = jax.random.key(3)
        # warm up (compile) outside the trace
        out = run(params, x, y, key)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        with jax.profiler.trace(args.out):
            out = run(params, x, y, jax.random.fold_in(key, 1))
            np.asarray(jax.tree_util.tree_leaves(out)[0])

    traces = sorted(glob.glob(
        os.path.join(args.out, "plugins", "profile", "*", "*.trace.json.gz")
    ))
    if not traces:
        print("no trace.json.gz found under", args.out, file=sys.stderr)
        sys.exit(1)
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # leaf XLA ops carry hlo_category / model_flops / bytes_accessed args;
    # aggregate spans (hlo_category 'while', the jit_ program span, step
    # markers) are excluded so nothing double-counts
    agg = {}  # name -> [dur_us, flops, bytes, category, tf_op]
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        a = e.get("args") or {}
        cat = a.get("hlo_category")
        if cat is None or cat in ("while", "call"):
            continue
        name = e.get("name", "?")
        if name.startswith("jit_"):
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        total += dur
        row = agg.setdefault(name, [0.0, 0.0, 0.0, cat, a.get("tf_op", "")])
        row[0] += dur
        row[1] += float(a.get("model_flops", 0) or 0)
        row[2] += float(a.get("raw_bytes_accessed", 0) or 0)

    steps = args.steps
    print(f"device total: {total / 1e3:.2f} ms over {steps} steps "
          f"-> {total / 1e3 / steps:.2f} ms/step")

    by_cat = collections.Counter()
    for dur, fl, by, cat, _ in agg.values():
        by_cat[cat] += dur
    print("\nby hlo_category (ms/step):")
    for cat, us in by_cat.most_common():
        print(f"  {cat:24s} {us / 1e3 / steps:8.3f}  ({us / total:5.1%})")

    print(f"\ntop {args.top} ops (ms/step | achieved TFLOP/s | GB/s | "
          f"category | layer):")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[: args.top]
    for name, (dur, fl, by, cat, tf_op) in rows:
        tflops = fl / (dur * 1e6) if dur else 0.0  # flops/us = Mflop/s
        gbs = by / (dur * 1e3) if dur else 0.0     # bytes/us = MB/s → GB/s
        lbl = short_tf_op(tf_op)
        print(f"  {dur / 1e3 / steps:7.3f}  {tflops:6.1f}TF {gbs:6.0f}GB/s  "
              f"{cat:20s} {lbl[:48]}")
    mxu = sum(r[1][1] for r in agg.items()) / (total * 1e6) if total else 0
    hbm = sum(r[1][2] for r in agg.items()) / (total * 1e3) if total else 0
    print(f"\nwhole-program average: {mxu:.1f} TFLOP/s "
          f"({mxu / V5E_PEAK_TFLOPS:.0%} of v5e bf16 peak), "
          f"{hbm:.0f} GB/s ({hbm / V5E_HBM_GBS:.0%} of HBM roofline)")


if __name__ == "__main__":
    main()
