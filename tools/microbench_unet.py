#!/usr/bin/env python
"""Micro-benchmark: production UNet fwd / fwd+bwd under different settings.

Explores: param dtype (fp32 vs bf16 storage), remat on/off, Pallas attention.
Run on the real chip: python tools/microbench_unet.py
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


def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force full sync
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from osmosis_tpu.models import UNetConfig, UNetModel

    base = dict(
        image_size=256, in_channels=4, out_channels=8, model_channels=256,
        num_res_blocks=2, attention_resolutions=(8, 16, 32),
        channel_mult=(1, 1, 2, 2, 4, 4), num_head_channels=64,
        use_scale_shift_norm=True, resblock_updown=True,
    )
    x = jax.random.normal(jax.random.key(1), (1, 256, 256, 4))
    t = jnp.array([500.0])

    cfg0 = UNetConfig(**base)
    model0 = UNetModel(cfg0)
    params = jax.jit(model0.init)(jax.random.key(0), x, t)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M", flush=True)

    params_bf16 = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    variants = [
        ("fp32", UNetConfig(**base), params),
        ("bf16-compute fp32-store", UNetConfig(**base, dtype=jnp.bfloat16), params),
        ("bf16-compute bf16-store", UNetConfig(**base, dtype=jnp.bfloat16), params_bf16),
    ]

    for name, cfg, p in variants:
        model = UNetModel(cfg)
        fwd = jax.jit(lambda pp, xx, tt: model.apply(pp, xx, tt))
        try:
            dt = timeit(fwd, p, x, t)
            print(f"fwd  {name:28s}: {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"fwd  {name:28s}: FAILED {type(e).__name__}: {e}", flush=True)

    for name, cfg, p in [
        ("bf16 store, remat", UNetConfig(**base, dtype=jnp.bfloat16, remat=True),
         params_bf16),
        ("bf16 store, no-remat", UNetConfig(**base, dtype=jnp.bfloat16), params_bf16),
    ]:
        model = UNetModel(cfg)

        def loss(pp, xx, tt):
            return jnp.sum(model.apply(pp, xx, tt).astype(jnp.float32) ** 2)

        grad = jax.jit(jax.grad(loss, argnums=1))
        try:
            dt = timeit(grad, p, x, t)
            print(f"f+b  {name:28s}: {dt*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"f+b  {name:28s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
