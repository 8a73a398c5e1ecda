#!/usr/bin/env python
"""AOT compilation experiment for the guided scan (FUTURE.md #5 / VERDICT #9).

Measures, for a given chain length:
  1. cold trace+lower time (host)
  2. compile time (jit .compile(), which on this relay runs remotely)
  3. serialized executable size (compiled.serialize()) and whether the
     persistent compilation cache already amortizes it
  4. effect of donating the scan inputs on executable size/compile time

    python tools/aot_compile.py --steps 40 [--donate]

The practical recommendation lands in PERF.md: AOT at install time is only
worth shipping if serialize/deserialize round-trips beat the existing
persistent-cache path.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--donate", action="store_true")
    ap.add_argument("--no-cache", action="store_true",
                    help="skip enabling the persistent compilation cache")
    args = ap.parse_args()

    if not args.no_cache:
        from osmosis_tpu.utils.compilation_cache import enable as _enable

        _enable()

    import bench

    # the chain length the builder compiles is the module-global
    # bench.BENCH_STEPS — pin it to --steps (same pattern as
    # profile_guided.py) so the reported "steps" matches the executable
    bench.BENCH_STEPS = args.steps
    run, params, x, y = bench.build_guided_run()
    # rebuild with explicit donation if requested
    if args.donate:
        inner = run.__wrapped__
        run = jax.jit(inner, donate_argnums=(1,))  # donate x_init

    key = jax.random.key(3)

    t0 = time.perf_counter()
    lowered = run.lower(params, x, y, key)
    t_lower = time.perf_counter() - t0
    log(f"trace+lower: {t_lower:.1f}s")

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    log(f"compile: {t_compile:.1f}s")

    ser_size = None
    t_ser = t_deser = None
    try:
        from jax.experimental.serialize_executable import deserialize_and_load, serialize

        t0 = time.perf_counter()
        payload, in_tree, out_tree = serialize(compiled)
        t_ser = time.perf_counter() - t0
        ser_size = len(payload)
        t0 = time.perf_counter()
        deserialize_and_load(payload, in_tree, out_tree)
        t_deser = time.perf_counter() - t0
        log(f"serialize: {t_ser:.1f}s ({ser_size / 1e6:.1f} MB), "
            f"deserialize+load: {t_deser:.1f}s")
    except Exception as e:
        log(f"executable serialization unavailable: {e}")

    mem = compiled.memory_analysis()
    log(f"memory: {mem}")

    print(json.dumps({
        "steps": args.steps,
        "donate": args.donate,
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "serialized_mb": round(ser_size / 1e6, 1) if ser_size else None,
        "serialize_s": round(t_ser, 1) if t_ser else None,
        "deserialize_s": round(t_deser, 1) if t_deser else None,
    }))


if __name__ == "__main__":
    main()
