"""Fused QKV self-attention as a Pallas TPU kernel.

The UNet attends over at most 32x32 = 1024 spatial tokens with 64-dim heads
(SURVEY.md section 5), so a whole head's attention — q/k/v tiles, the TxT
fp32 logits and the output — fits comfortably in VMEM. The kernel runs one
(batch, head) pair per grid step and keeps everything on-chip: logits matmul
on the MXU, fp32 softmax on the VPU, weighted sum back on the MXU, with no
HBM round-trip for the TxT intermediate.

Semantics match the reference QKV attention (guided_diffusion/unet.py:
416-433): q and k are each pre-scaled by 1/sqrt(sqrt(head_dim)) and the
softmax runs in fp32.

Differentiation: the guided sampler back-propagates through attention, so the
op carries a custom VJP whose backward recomputes via the plain XLA einsum
implementation (cheap at these sizes, and keeps the Pallas kernel
forward-only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_ref(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Plain XLA implementation, [B, T, H, hc] layout."""
    hc = q.shape[-1]
    scale = (1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(hc, jnp.float32)))).astype(q.dtype)
    logits = jnp.einsum(
        "bthc,bshc->bhts", q * scale, k * scale, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshc->bthc", weights, v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int):
    # blocks are [1, T, H, hc] — ALL heads of one batch element live in
    # VMEM; the per-head matmuls are unrolled so one grid program keeps the
    # MXU pipeline busy instead of paying grid overhead per (batch, head)
    for h in range(heads):
        q = q_ref[0, :, h, :].astype(jnp.float32) * scale
        k = k_ref[0, :, h, :].astype(jnp.float32) * scale
        v = v_ref[0, :, h, :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            w.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h, :] = o.astype(o_ref.dtype)


def _pallas_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    b, t, h, hc = q.shape
    scale = float(1.0 / (hc ** 0.25))
    spec = pl.BlockSpec(
        (1, t, h, hc), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, heads=h),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h, hc), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * t * t * hc,
            bytes_accessed=4 * b * h * t * hc * 4,
            transcendentals=b * h * t * t,
        ),
    )(q, k, v)


@jax.custom_vjp
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """[B, T, H, hc] fused attention (Pallas forward, XLA backward)."""
    return _pallas_attention(q, k, v)


def _fwd(q, k, v):
    return _pallas_attention(q, k, v), (q, k, v)


def _bwd(residuals, g):
    q, k, v = residuals
    _, pullback = jax.vjp(_attention_ref, q, k, v)
    return pullback(g)


fused_attention.defvjp(_fwd, _bwd)
