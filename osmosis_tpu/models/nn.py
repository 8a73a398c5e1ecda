"""Flax NN primitives for the ADM UNet.

Behavioral contracts from the reference:
  * GroupNorm32 — 32 groups, fp32 compute, cast back (guided_diffusion/nn.py:17-19,93-100)
  * sinusoidal timestep embedding, cos-first (nn.py:103-121)
  * zero-initialized output convs (nn.py:68-74)

TPU design notes: everything is NHWC; GroupNorm statistics and attention
softmax stay in fp32 even when the torso runs bf16 (the reference's
fp16-stability islands, nn.py:17).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal embeddings, [N] → [N, dim]; cos first (nn.py:103-121)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def _gn_group_stats(x32, num_groups, eps):
    """Lane-aligned group statistics: per-CHANNEL sums first (the channel
    axis is the 128-lane minor dim, so these reductions never cross lanes),
    then collapse the tiny [B, C] vectors to [B, G]. Returns (mean_c, inv_c)
    broadcast back to per-channel [B, C]."""
    b, c = x32.shape[0], x32.shape[-1]
    g = num_groups
    cpg = c // g
    spatial_axes = tuple(range(1, x32.ndim - 1))
    n_spatial = 1
    for a in spatial_axes:
        n_spatial *= x32.shape[a]
    n = n_spatial * cpg

    s1 = jnp.sum(x32, axis=spatial_axes)          # [B, C]
    s2 = jnp.sum(x32 * x32, axis=spatial_axes)    # [B, C]
    gs1 = s1.reshape(b, g, cpg).sum(-1)           # [B, G]
    gs2 = s2.reshape(b, g, cpg).sum(-1)
    mean = gs1 / n
    var = gs2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cpg, axis=1)        # [B, C]
    inv_c = jnp.repeat(inv, cpg, axis=1)
    return mean_c, inv_c, n


def _gn_reshape(v, x):
    """[B, C] → [B, 1, ..., 1, C] for broadcasting against x."""
    return v.reshape((x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],))


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm(x, scale, bias, num_groups, eps):
    """GroupNorm with fp32 statistics and a hand-written TPU backward.

    The forward reduces per-channel first (lane-aligned — see
    _gn_group_stats). Autodiff of that forward re-derives WORSE reductions
    for the backward (it differentiates through the reshape/collapse chain),
    so the VJP is written by hand with the same per-channel-first structure:
    because dL/dγ and dL/dβ need Σḡ·x̂ and Σḡ anyway, and the per-channel
    affine makes Σh = γ·Σḡ / Σh·x̂ = γ·Σḡ·x̂, the entire backward costs TWO
    lane-aligned per-channel reduction passes + one fused elementwise pass:

        dx = inv · γ · (ḡ − mean_g(ḡγ)/γ... )   [expanded below]
        dx = inv_c·h − inv_c·mean_g(h) − x̂·inv_c·mean_g(h·x̂),  h = ḡ·γ
    """
    out, _ = _gn_fwd(x, scale, bias, num_groups, eps)
    return out


def _gn_fwd(x, scale, bias, num_groups, eps):
    x32 = x.astype(jnp.float32)
    mean_c, inv_c, _ = _gn_group_stats(x32, num_groups, eps)
    out = (x32 - _gn_reshape(mean_c, x)) * (_gn_reshape(inv_c, x) * scale) + bias
    return out.astype(x.dtype), (x, scale, mean_c, inv_c)


def _gn_bwd(num_groups, eps, res, gbar):
    x, scale, mean_c, inv_c = res
    b, c = x.shape[0], x.shape[-1]
    g = num_groups
    cpg = c // g
    spatial_axes = tuple(range(1, x.ndim - 1))
    n_spatial = 1
    for a in spatial_axes:
        n_spatial *= x.shape[a]
    n = n_spatial * cpg

    g32 = gbar.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    xhat = (x32 - _gn_reshape(mean_c, x)) * _gn_reshape(inv_c, x)

    # the ONLY large reductions — per-channel, lane-aligned, one fused pass
    r1 = jnp.sum(g32, axis=spatial_axes)          # [B, C] = Σ ḡ
    r2 = jnp.sum(g32 * xhat, axis=spatial_axes)   # [B, C] = Σ ḡ·x̂

    dbias = r1.sum(0)                             # [C]
    dscale = r2.sum(0)                            # [C]

    # group means of h = ḡ·γ and h·x̂ via the per-channel sums (γ constant
    # within a channel): collapse [B, C] → [B, G], broadcast back
    h1 = (r1 * scale).reshape(b, g, cpg).sum(-1) / n   # [B, G] mean_g(h)
    h2 = (r2 * scale).reshape(b, g, cpg).sum(-1) / n   # [B, G] mean_g(h·x̂)
    h1_c = _gn_reshape(jnp.repeat(h1, cpg, axis=1), x)
    h2_c = _gn_reshape(jnp.repeat(h2, cpg, axis=1), x)

    inv_b = _gn_reshape(inv_c, x)
    dx = inv_b * (g32 * scale - h1_c - xhat * h2_c)
    return dx.astype(x.dtype), dscale, dbias


group_norm.defvjp(_gn_fwd, _gn_bwd)


class GroupNorm32(nn.Module):
    """GroupNorm(32, C) with fp32 statistics, result cast to input dtype.

    torch nn.GroupNorm defaults: eps=1e-5, affine=True (nn.py:17-19,100).

    TPU layout note: naively reducing over (spatial, channels-within-group)
    crosses VPU lanes (the group stride of C/32 channels sits inside the
    128-lane minor dimension) and costs ~38% of the whole UNet forward.
    Both the forward and the hand-written backward (group_norm's custom_vjp)
    reduce per-CHANNEL first and collapse the tiny [B, C] stats to groups.
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, self.num_groups, self.epsilon)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def conv3x3(features: int, name: str, zero_init: bool = False, dtype: Any = jnp.float32):
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        padding=((1, 1), (1, 1)),
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def conv1x1(features: int, name: str, zero_init: bool = False, dtype: Any = jnp.float32):
    return nn.Conv(
        features,
        kernel_size=(1, 1),
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def dense(features: int, name: str, zero_init: bool = False, dtype: Any = jnp.float32):
    return nn.Dense(
        features,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample, NHWC (unet.py:179-189)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2 average pool, stride 2, NHWC (unet.py:215)."""
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))
