"""Nearest-neighbor 2x spatial upsample as Pallas TPU kernels (fwd + bwd).

XLA lowers the broadcast-reshape formulation to a kLoop fusion that runs
~3x off the HBM roofline at the UNet's level-0/1 maps (measured 320us for
[1,128,128,256] -> [1,256,256,256] vs the ~102us read+write floor — the
interleaved-W write pattern fights the T(8,128) tile layout). The Pallas
version builds each doubled row-block in VMEM and issues one contiguous
store; the backward (2x2 box sum) is the mirror kernel.

Used by models/nn.upsample_nearest_2x for jit-traced shapes on TPU;
falls back to the broadcast formulation elsewhere (CPU tests, odd shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _up_kernel(x_ref, o_ref):
    x = x_ref[0]  # [Hb, W, C]
    hb, w, c = x.shape
    y = jnp.broadcast_to(x[:, None, :, None, :], (hb, 2, w, 2, c))
    o_ref[0] = y.reshape(2 * hb, 2 * w, c)


def _down_kernel(g_ref, o_ref):
    g = g_ref[0]  # [2*Hb, 2*W, C]
    hb2, w2, c = g.shape
    s = g.reshape(hb2 // 2, 2, w2 // 2, 2, c)
    o_ref[0] = s.sum(axis=(1, 3))


def _pick_hb(h: int, w: int, c: int) -> int:
    # keep in+out blocks comfortably under VMEM: bytes ~ Hb*W*C*2 * 5
    hb = h
    while hb > 1 and hb * w * c * 2 * 5 > 8 * 1024 * 1024:
        hb //= 2
    return max(hb, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def upsample_nearest_2x_pallas(x: jax.Array) -> jax.Array:
    return _up_fwd_impl(x)


def _up_fwd_impl(x):
    b, h, w, c = x.shape
    hb = _pick_hb(h, w, c)
    grid = (b, h // hb)
    return pl.pallas_call(
        _up_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, hb, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2 * hb, 2 * w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, c), x.dtype),
    )(x)


def _up_fwd(x):
    return _up_fwd_impl(x), None


def _up_bwd(_, g):
    # XLA reshape-sum backward: the pallas down-kernel's (smaller) output
    # is exactly the <=16MB size class XLA promotes into scoped vmem, which
    # OOMs the stack — the reshape-sum is roofline-bound anyway
    b, h2, w2, c = g.shape
    dx = g.reshape(b, h2 // 2, 2, w2 // 2, 2, c).sum(axis=(2, 4))
    return (dx,)


upsample_nearest_2x_pallas.defvjp(_up_fwd, _up_bwd)
