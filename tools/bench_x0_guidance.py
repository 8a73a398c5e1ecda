#!/usr/bin/env python
"""Measure the x0-gradient guidance mode's throughput (gradient_x_prev=False).

The reference exposes `gradient_x_prev` (condition_methods.py:75; every
shipped preset sets True = full UNet backward per step). With False the
guidance gradient is taken w.r.t. x0-hat — the UNet pullback disappears from
the step entirely, leaving 1 forward + physics-only phi gradients. Same
bench methodology as bench.py (200-step scans, min of 3, host fetch).

Run on the chip: python tools/bench_x0_guidance.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from osmosis_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import bench


def measure(gradient_x_prev, x_prev_every=1, sampler="ddpm"):
    run, params, x, y = bench.build_guided_run(
        gradient_x_prev=gradient_x_prev, x_prev_every=x_prev_every,
        sampler=sampler)
    key = jax.random.key(3)
    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(run(params, x, y, key))[0])
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(
            run(params, x, y, jax.random.fold_in(key, i)))[0])
        times.append(time.perf_counter() - t0)
    return bench.BENCH_STEPS / min(times)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--hybrid", type=int, nargs="*", default=[2, 4],
                    help="x_prev_every periods to also measure (the hybrid "
                         "gradient schedule; [] to skip)")
    ap.add_argument("--skip-pure", action="store_true",
                    help="measure only the --hybrid periods")
    ap.add_argument("--ltsp", type=int, nargs="*", default=None,
                    help="also measure the ltsp splitting sampler at these "
                         "x_prev_every periods (1 = pure ltsp); e.g. "
                         "--ltsp 1 4")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    sps_full = None
    if not args.skip_pure:
        sps_x0 = measure(False)
        print(f"x0-grad guided (gradient_x_prev=False): {sps_x0:.2f} steps/s "
              f"({1000/sps_x0:.1f} s per 1000-step image)", flush=True)
        sps_full = measure(True)
        print(f"full guided   (gradient_x_prev=True):  {sps_full:.2f} steps/s "
              f"({1000/sps_full:.1f} s per 1000-step image)", flush=True)
        print(f"speedup: {sps_x0/sps_full:.2f}x", flush=True)
    for k in args.hybrid:
        sps_k = measure(True, x_prev_every=k)
        extra = f" ({sps_k/sps_full:.2f}x full)" if sps_full else ""
        print(f"hybrid x_prev_every={k}: {sps_k:.2f} steps/s "
              f"({1000/sps_k:.1f} s per 1000-step image){extra}", flush=True)
    for k in (args.ltsp or []):
        sps_k = measure(True, x_prev_every=k, sampler="ltsp")
        label = "ltsp" if k == 1 else f"ltsp hybrid x_prev_every={k}"
        print(f"{label}: {sps_k:.2f} steps/s "
              f"({1000/sps_k:.1f} s per 1000-step image)", flush=True)


if __name__ == "__main__":
    main()
