#!/usr/bin/env python
"""Probe: int8 vs bf16 conv/dot throughput at the UNet's dominant shapes.

The v5e MXU peaks at ~394 TOPS int8 vs ~197 TFLOP/s bf16. The guided step is
conv-bound (PERF.md round 3: 24.9 ms/step of convs at ~92% of bf16 peak), so
IF XLA lowers int8 convolutions onto the int8 MXU path at our shapes, a
W8A8-quantized inference mode could approach 2x. This probe measures the raw
kernel question before any quantization work.

Method per PERF.md gotchas: scan N iterations inside one executable, force a
host fetch; min of 3. Shapes: the strip-form level-0/1 convs plus the deep
1024-channel convs (weight-load-bound — int8 also HALVES their weight bytes).

Run on the chip: python tools/probe_int8_conv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from osmosis_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

# (label, input NHWC, kernel HWIO, iters) — iters sized so each variant's
# device time is >=~400 ms, far above the ~40-100 ms relay dispatch floor
# (the first probe run used 60-300 iters and its deep-shape numbers were
# dispatch-dominated; CLAUDE.md timing rule: scan thousands of iterations)
SHAPES = [
    ("L0 strip  [16,18,258,256]x256", (16, 18, 258, 256), (3, 3, 256, 256), 300),
    ("L2 strip  [16,6,66,512]x512", (16, 6, 66, 512), (3, 3, 512, 512), 1200),
    ("L4 deep   [1,16,16,1024]x1024", (1, 16, 16, 1024), (3, 3, 1024, 1024), 2500),
    ("L5 deep   [1,8,8,1024]x1024", (1, 8, 8, 1024), (3, 3, 1024, 1024), 4000),
]


def conv_fn(dtype, pref, dequant=False):
    def body(x, k):
        def step(c, _):
            kk = k
            if dequant:
                # int8 weight STORAGE with bf16 compute: dequantize inside
                # the loop body — measures whether XLA keeps the weight
                # traffic int8 (a win) or hoists/materializes a bf16 copy
                # (storage-only quantization gains nothing)
                kk = k.astype(jnp.bfloat16) * jnp.bfloat16(0.02)
            y = jax.lax.conv_general_dilated(
                c, kk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pref,
            )
            # keep the chain dependent without changing dtype/shape
            return (y[..., : c.shape[-1]]).astype(dtype), ()

        out, _ = jax.lax.scan(step, x, None, length=ITERS)
        return out

    return body


def timeit(f, *args):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    global ITERS
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    key = jax.random.key(0)
    for label, xs, ks, iters in SHAPES:
        ITERS = iters
        macs = (
            np.prod(xs) * ks[0] * ks[1] * ks[3]
        )  # NHWC 'same': out pixels * kh*kw*cin*cout / cin... careful:
        macs = xs[0] * xs[1] * xs[2] * ks[0] * ks[1] * ks[2] * ks[3]
        rows = []
        for name, dt, pref, dequant in [
            ("bf16 ", jnp.bfloat16, jnp.float32, False),
            ("int8 ", jnp.int8, jnp.int32, False),
            ("w8deq", jnp.bfloat16, jnp.float32, True),
        ]:
            if dt == jnp.int8 or dequant:
                k = jax.random.randint(key, ks, -127, 127, jnp.int8)
            else:
                k = jax.random.normal(key, ks, dt)
            if dt == jnp.int8:
                x = jax.random.randint(key, xs, -127, 127, jnp.int8)
            else:
                x = jax.random.normal(key, xs, dt)
            f = jax.jit(conv_fn(dt, pref, dequant))
            try:
                dtm = timeit(f, x, k) / iters
                tops = 2 * macs / dtm / 1e12
                unit = "TOP" if name.strip() == "int8" else "TFLOP"
                rows.append(
                    f"{name}: {dtm*1e6:9.1f} us  {tops:6.1f} {unit}/s"
                    f"  (total {dtm*iters:6.2f} s/run)"
                )
            except Exception as e:  # noqa: BLE001
                rows.append(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")
        print(f"{label}\n    " + "\n    ".join(rows), flush=True)


if __name__ == "__main__":
    main()
