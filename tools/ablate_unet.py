#!/usr/bin/env python
"""Ablation timing to isolate the UNet forward bottleneck on TPU.

Variants monkeypatch single components (ablation only — semantics change!)
to attribute time: attention, GroupNorm stats, SiLU, resolution, batch.
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


def timeit(fn, *args, iters=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_variant(name, patch=None, image_size=256, batch=1, attn=(8, 16, 32)):
    from osmosis_tpu.models import UNetConfig, UNetModel
    from osmosis_tpu.models import nn as onn

    from flax import linen as _nn

    def _epilogue(h, film, act, dtype):
        # match GroupNorm32's fused FiLM/SiLU epilogue so the ablation
        # isolates ONLY the norm-statistics cost (GroupNorm32.__call__
        # takes film=/act= since the fused-norm refactor)
        if film is not None:
            s, t = film
            h = h * (1.0 + s) + t
        if act == "silu":
            h = h * jax.nn.sigmoid(h)
        return h.astype(dtype)

    class IdentityGN(_nn.Module):
        num_groups: int = 32
        epsilon: float = 1e-5
        num_channels: int = None

        @_nn.compact
        def __call__(self, x, channel_offset: int = 0, film=None,
                     act: str = None):
            c_total = self.num_channels or x.shape[-1]
            c = x.shape[-1]
            scale = self.param("scale", _nn.initializers.ones, (c_total,), jnp.float32)
            bias = self.param("bias", _nn.initializers.zeros, (c_total,), jnp.float32)
            sl = slice(channel_offset, channel_offset + c)
            h = x.astype(jnp.float32) * scale[sl] + bias[sl]
            return _epilogue(h, film, act, x.dtype)

    class Bf16GN(_nn.Module):
        num_groups: int = 32
        epsilon: float = 1e-5
        num_channels: int = None

        @_nn.compact
        def __call__(self, x, channel_offset: int = 0, film=None,
                     act: str = None):
            c = x.shape[-1]
            assert channel_offset == 0 and (self.num_channels or c) == c, (
                "bf16_gn ablation does not support the concat-free slicing")
            scale = self.param("scale", _nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", _nn.initializers.zeros, (c,), jnp.float32)
            g = 32
            spatial = x.shape[1:-1]
            xg = x.reshape(x.shape[0], -1, g, c // g)
            mean = xg.mean(axis=(1, 3), keepdims=True)
            var = xg.var(axis=(1, 3), keepdims=True)
            xg = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
            x2 = xg.reshape((x.shape[0],) + spatial + (c,))
            return _epilogue(x2 * scale + bias, film, act, x.dtype)

    orig_gn = onn.GroupNorm32
    orig_silu = onn.silu
    orig_silu_raw = onn._silu_raw
    try:
        if patch == "identity_gn":
            onn.GroupNorm32 = IdentityGN
        elif patch == "bf16_gn":
            onn.GroupNorm32 = Bf16GN
        elif patch == "no_silu":
            # the spatial SiLUs run through _silu_raw inside GroupNorm32's
            # fused path — patch it too or only the two embedding-MLP
            # SiLUs are removed and the row misattributes SiLU cost
            onn.silu = lambda x: x
            onn._silu_raw = lambda x: x

        cfg = UNetConfig(
            image_size=image_size, in_channels=4, out_channels=8,
            model_channels=256, num_res_blocks=2, attention_resolutions=attn,
            channel_mult=(1, 1, 2, 2, 4, 4), num_head_channels=64,
            use_scale_shift_norm=True, resblock_updown=True, dtype=jnp.bfloat16,
        )
        model = UNetModel(cfg)
        x = jax.random.normal(jax.random.key(1), (batch, image_size, image_size, 4))
        t = jnp.full((batch,), 500.0)
        params = jax.jit(model.init)(jax.random.key(0), x, t)
        params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

        # scan N forwards inside ONE executable — amortizes the ~100ms
        # per-call dispatch overhead of the axon relay, giving true
        # in-graph per-step cost
        N = 16

        def scanned(pp, x0, tt):
            def step(carry, _):
                out = model.apply(pp, carry, tt)
                return out[..., :4].astype(carry.dtype), ()

            final, _ = jax.lax.scan(step, x0, None, length=N)
            return final

        fwd = jax.jit(scanned)
        dt = timeit(fwd, params, x, t) / N
        print(f"{name:32s}: {dt*1e3:8.2f} ms/fwd  ({dt*1e3/batch:.2f} ms/img)",
              flush=True)
    except Exception as e:
        print(f"{name:32s}: FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        onn.GroupNorm32 = orig_gn
        onn.silu = orig_silu
        onn._silu_raw = orig_silu_raw


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    runs = {
        "baseline-bf16": dict(),
        "no-attention": dict(attn=()),
        "identity-groupnorm": dict(patch="identity_gn"),
        "bf16-groupnorm": dict(patch="bf16_gn"),
        "no-silu": dict(patch="no_silu"),
        "res128": dict(image_size=128),
        "batch4": dict(batch=4),
        "batch8": dict(batch=8),
    }
    for name, kw in runs.items():
        if which != "all" and which != name:
            continue
        bench_variant(name, **kw)


if __name__ == "__main__":
    main()
