#!/usr/bin/env python
"""Probe: can hand strip-batching beat XLA's space-to-batch at level 0?

The round-3 profile (tools/profile_guided.py) shows ~8 ms/step of layout
copies at space-to-batch boundaries around the 256² convs. XLA S2Bs each
batch-1 conv to [256,8,33,C] tiles and pays layout transposes between
neighboring ops' differing S2B layouts. This probe times ONE level-0
resblock core (GN+SiLU+conv3x3+FiLM+GN+SiLU+conv3x3+skip, forward + x-vjp,
scanned) in two exactly-equivalent formulations:

  flat  : [1, 256, 256, C] — what the model does today (XLA S2Bs it)
  strips: [S, 256/S, 256, C] — batch-S row strips with explicit 1-row halo
          exchange per conv and cross-strip GroupNorm statistics; batch-S
          convs are above XLA's S2B heuristic so no boundary copies

If strips win meaningfully the UNet's big levels get a strip mode; if not,
this file is the negative-result record.

    python tools/probe_strip_conv.py --iters 40 --strips 32
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def make_weights(key, c):
    k1, k2, k3 = jax.random.split(key, 3)
    w1 = jax.random.normal(k1, (3, 3, c, c), jnp.float32) * 0.02
    w2 = jax.random.normal(k2, (3, 3, c, c), jnp.float32) * 0.02
    film = jax.random.normal(k3, (1, 1, 1, c), jnp.float32) * 0.1
    return dict(w1=w1.astype(jnp.bfloat16), w2=w2.astype(jnp.bfloat16),
                film=film.astype(jnp.bfloat16))


def gn_flat(x, groups=32):
    x32 = x.astype(jnp.float32)
    b, h, w, c = x.shape
    s1 = jnp.sum(x32, axis=(1, 2))
    s2 = jnp.sum(x32 * x32, axis=(1, 2))
    n = h * w * (c // groups)
    gs1 = s1.reshape(b, groups, -1).sum(-1)
    gs2 = s2.reshape(b, groups, -1).sum(-1)
    mean = gs1 / n
    inv = jax.lax.rsqrt(gs2 / n - mean * mean + 1e-5)
    mean_c = jnp.repeat(mean, c // groups, 1).reshape(b, 1, 1, c)
    inv_c = jnp.repeat(inv, c // groups, 1).reshape(b, 1, 1, c)
    return ((x32 - mean_c) * inv_c).astype(x.dtype)


def gn_strips(x, groups=32):
    """Same statistics as gn_flat on the un-stripped tensor: the strip axis
    is NOT a batch axis — stats pool over (strips, rows, cols)."""
    x32 = x.astype(jnp.float32)
    s, h, w, c = x.shape
    s1 = jnp.sum(x32, axis=(0, 1, 2))
    s2 = jnp.sum(x32 * x32, axis=(0, 1, 2))
    n = s * h * w * (c // groups)
    gs1 = s1.reshape(groups, -1).sum(-1)
    gs2 = s2.reshape(groups, -1).sum(-1)
    mean = gs1 / n
    inv = jax.lax.rsqrt(gs2 / n - mean * mean + 1e-5)
    mean_c = jnp.repeat(mean, c // groups, 0).reshape(1, 1, 1, c)
    inv_c = jnp.repeat(inv, c // groups, 0).reshape(1, 1, 1, c)
    return ((x32 - mean_c) * inv_c).astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def conv_flat(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def halo(x):
    """[S, h, W, C] → [S, h+2, W, C]: row halos from neighboring strips."""
    top = jnp.concatenate([jnp.zeros_like(x[:1, -1:]), x[:-1, -1:]], axis=0)
    bot = jnp.concatenate([x[1:, :1], jnp.zeros_like(x[-1:, :1])], axis=0)
    return jnp.concatenate([top, x, bot], axis=1)


def conv_strips(x, w):
    return jax.lax.conv_general_dilated(
        halo(x), w, (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_strips_inline(strips):
    """Flat-tensor conv that strip-batches INTERNALLY: free contiguous
    reshapes at the boundaries, halo'd batch-S conv inside. This is the
    integration-shaped variant — everything else stays flat."""

    def conv(x, w):
        b, H, W, C = x.shape
        xs = x.reshape(strips, H // strips, W, C)
        y = jax.lax.conv_general_dilated(
            halo(xs), w, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y.reshape(b, H, W, C)

    return conv


def block(x, wts, gn, conv):
    h = conv(silu(gn(x)), wts["w1"])
    h = silu(gn(h) * (1 + wts["film"]))
    h = conv(h, wts["w2"])
    return x + h


def bench(fn, x, wts, iters, label):
    def scan_body(carry, _):
        y, g = jax.value_and_grad(
            lambda xx: jnp.sum(fn(xx, wts).astype(jnp.float32) ** 2)
        )(carry)
        return g.astype(carry.dtype) * 1e-6 + carry, y

    run = jax.jit(lambda x0: jax.lax.scan(scan_body, x0, None, length=iters))
    out = run(x)
    np.asarray(out[1])  # compile + warm
    # CLAUDE.md timing rule: never trust single-call or low-N timings on
    # the relay (~40-100 ms dispatch) — long scan inside ONE executable,
    # min of 3 timed calls
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x)
        np.asarray(out[1])
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / iters * 1e3
    print(f"{label:8s} {dt:7.3f} ms/iter (fwd+bwd resblock core, "
          f"min of 3 x {iters}-iter scans)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--strips", type=int, default=32)
    args = ap.parse_args()

    from osmosis_tpu.utils.compilation_cache import enable as _enable

    _enable()
    c, hw, S = args.channels, args.size, args.strips
    wts = make_weights(jax.random.key(0), c)
    x_flat = (jax.random.normal(jax.random.key(1), (1, hw, hw, c)) * 0.5
              ).astype(jnp.bfloat16)
    x_str = x_flat.reshape(S, hw // S, hw, c)

    # exactness: strip formulation == flat formulation
    y_flat = block(x_flat, wts, gn_flat, conv_flat)
    y_str = block(x_str, wts, gn_strips, conv_strips)
    err = float(jnp.max(jnp.abs(
        y_flat.astype(jnp.float32)
        - y_str.reshape(1, hw, hw, c).astype(jnp.float32)
    )))
    print(f"max |flat - strips| = {err:.2e}")
    assert err < 0.05, "strip formulation diverged"

    y_inl = block(x_flat, wts, gn_flat, conv_strips_inline(S))
    err2 = float(jnp.max(jnp.abs(
        y_flat.astype(jnp.float32) - y_inl.astype(jnp.float32))))
    print(f"max |flat - conv-inline-strips| = {err2:.2e}")

    t_flat = bench(lambda x, w: block(x, w, gn_flat, conv_flat),
                   x_flat, wts, args.iters, "flat")
    t_str = bench(lambda x, w: block(x, w, gn_strips, conv_strips),
                  x_str, wts, args.iters, f"strips{S}")
    t_inl = bench(lambda x, w: block(x, w, gn_flat, conv_strips_inline(S)),
                  x_flat, wts, args.iters, f"inline{S}")
    print(f"strips/flat = {t_str / t_flat:.3f}  "
          f"inline/flat = {t_inl / t_flat:.3f}")


if __name__ == "__main__":
    main()
