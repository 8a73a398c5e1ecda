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


class GroupNorm32(nn.Module):
    """GroupNorm(32, C) computed in fp32, result cast to input dtype.

    torch nn.GroupNorm defaults: eps=1e-5, affine=True (nn.py:17-19,100).
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        g = self.num_groups
        spatial = x.shape[1:-1]
        xg = x.reshape(x.shape[0], -1, g, c // g)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        x = xg.reshape((x.shape[0],) + spatial + (c,))
        x = x * scale + bias
        return x.astype(orig_dtype)


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
