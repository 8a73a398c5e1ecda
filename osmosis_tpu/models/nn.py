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


# ---------------------------------------------------------------------------
# Fused norm→(FiLM)→SiLU with residual-minimal custom VJPs
# ---------------------------------------------------------------------------
# Autodiff of silu(gn(x)) / silu(gn(x)·(1+s)+t) saves the pre-SiLU tensor AND
# sigmoid(pre-SiLU) as residuals — at 256², two extra [B,H,W,C] HBM
# writes (forward) + reads (backward) per norm site that XLA must emit as
# extra fusion outputs. These fused ops save ONLY the norm input x (which the
# GroupNorm backward needs regardless and which is already materialized as
# the previous conv's output) plus the tiny [B,C] statistics, and recompute
# the elementwise chain inside the backward fusion. Forward math and dtype
# sequence are IDENTICAL to the unfused composition; parameter/FiLM
# cotangents are exact (used by the toy trainer; DCE'd in the x-only guided
# pullback).


def _silu_raw(x):
    return x * jax.nn.sigmoid(x)


@jax.custom_vjp
def silu(x: jax.Array) -> jax.Array:
    return _silu_raw(x)


def _silu_fwd(x):
    return _silu_raw(x), x


def _silu_bwd(x, g):
    s = jax.nn.sigmoid(x)  # recomputed in the backward fusion, never stored
    return (g * (s * (1 + x * (1 - s))),)


silu.defvjp(_silu_fwd, _silu_bwd)


def _film_grad_axes(fs, x):
    """Axes to sum a full-shape cotangent down to fs's broadcast shape."""
    return tuple(
        i for i in range(x.ndim) if fs.shape[i] == 1 and x.shape[i] != 1
    )


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def norm_silu(x, scale, bias, num_groups, eps):
    """silu(group_norm(x)) with only (x, stats) as large residuals."""
    out, _ = _ns_fwd(x, scale, bias, num_groups, eps)
    return out


def _ns_fwd(x, scale, bias, num_groups, eps):
    gn_out, (x_, scale_, mean_c, inv_c) = _gn_fwd(x, scale, bias, num_groups, eps)
    return _silu_raw(gn_out), (x, scale, bias, mean_c, inv_c)


def _ns_bwd(num_groups, eps, res, g):
    x, scale, bias, mean_c, inv_c = res
    x32 = x.astype(jnp.float32)
    gn_out = (
        (x32 - _gn_reshape(mean_c, x)) * (_gn_reshape(inv_c, x) * scale) + bias
    ).astype(x.dtype)
    s = jax.nn.sigmoid(gn_out)
    dgn = g * (s * (1 + gn_out * (1 - s)))
    dx, dscale, dbias = _gn_bwd(num_groups, eps, (x, scale, mean_c, inv_c), dgn)
    return dx, dscale, dbias


norm_silu.defvjp(_ns_fwd, _ns_bwd)


@_partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def norm_film_silu(x, scale, bias, film_scale, film_shift, num_groups, eps):
    """silu(group_norm(x)·(1+film_scale)+film_shift) — the ResBlock
    scale-shift epilogue (unet.py:327-331) as one residual-minimal op.
    film_scale/film_shift must be broadcast-shaped [B,1,...,1,C] in x.dtype."""
    out, _ = _nfs_fwd(x, scale, bias, film_scale, film_shift, num_groups, eps)
    return out


def _nfs_fwd(x, scale, bias, film_scale, film_shift, num_groups, eps):
    gn_out, (_, _, mean_c, inv_c) = _gn_fwd(x, scale, bias, num_groups, eps)
    film = gn_out * (1 + film_scale) + film_shift
    return _silu_raw(film), (x, scale, bias, film_scale, film_shift, mean_c, inv_c)


def _nfs_bwd(num_groups, eps, res, g):
    x, scale, bias, film_scale, film_shift, mean_c, inv_c = res
    x32 = x.astype(jnp.float32)
    gn_out = (
        (x32 - _gn_reshape(mean_c, x)) * (_gn_reshape(inv_c, x) * scale) + bias
    ).astype(x.dtype)
    film = gn_out * (1 + film_scale) + film_shift
    s = jax.nn.sigmoid(film)
    dfilm = g * (s * (1 + film * (1 - s)))
    dfs = jnp.sum(
        (dfilm * gn_out), axis=_film_grad_axes(film_scale, x), keepdims=True
    ).astype(film_scale.dtype)
    dft = jnp.sum(
        dfilm, axis=_film_grad_axes(film_shift, x), keepdims=True
    ).astype(film_shift.dtype)
    dgn = dfilm * (1 + film_scale)
    dx, dscale, dbias = _gn_bwd(num_groups, eps, (x, scale, mean_c, inv_c), dgn)
    return dx, dscale, dbias, dfs, dft


norm_film_silu.defvjp(_nfs_fwd, _nfs_bwd)


class GroupNorm32(nn.Module):
    """GroupNorm(32, C) with fp32 statistics, result cast to input dtype.

    torch nn.GroupNorm defaults: eps=1e-5, affine=True (nn.py:17-19,100).

    TPU layout note: naively reducing over (spatial, channels-within-group)
    crosses VPU lanes (the group stride of C/32 channels sits inside the
    128-lane minor dimension) and costs ~38% of the whole UNet forward.
    Both the forward and the hand-written backward (group_norm's custom_vjp)
    reduce per-CHANNEL first and collapse the tiny [B, C] stats to groups.

    ``num_channels``/``channel_offset`` support the concat-free skip path:
    the affine parameters cover the full virtual concat width while each
    call normalizes one group-aligned slice of it (group statistics never
    mix channels across a group boundary, so per-part evaluation is exact).
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    num_channels: int = None

    @nn.compact
    def __call__(self, x: jax.Array, channel_offset: int = 0,
                 film=None, act: str = None) -> jax.Array:
        """``film=(scale, shift)`` applies the FiLM epilogue h·(1+s)+t and
        ``act='silu'`` the SiLU — both fused into the norm's custom VJP so the
        backward stores no pre-activation residuals (see norm_film_silu)."""
        c_total = self.num_channels or x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c_total,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c_total,), jnp.float32)
        # fp32 islands regardless of the STORED dtype: the gn_affine_bf16
        # perf knob keeps these leaves bf16 in the checkpoint tree (see
        # convert.cast_params_half) — upcast here so the math is unchanged
        scale = jnp.asarray(scale, jnp.float32)
        bias = jnp.asarray(bias, jnp.float32)
        c = x.shape[-1]
        groups = self.num_groups
        if not (c == c_total and channel_offset == 0):
            gw = c_total // self.num_groups
            assert channel_offset % gw == 0 and c % gw == 0, (
                "GroupNorm slice must align to group boundaries"
            )
            scale = jax.lax.slice_in_dim(scale, channel_offset, channel_offset + c, axis=0)
            bias = jax.lax.slice_in_dim(bias, channel_offset, channel_offset + c, axis=0)
            groups = c // gw

        from .. import perf

        if not perf.get("fused_norm_silu"):
            # ablation fallback: unfused composition (identical math)
            h = group_norm(x, scale, bias, groups, self.epsilon)
            if film is not None:
                h = h * (1 + film[0]) + film[1]
            return _silu_raw(h) if act == "silu" else h

        if film is not None:
            assert act == "silu"
            fs = jnp.broadcast_to(film[0], (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)).astype(x.dtype)
            ft = jnp.broadcast_to(film[1], fs.shape).astype(x.dtype)
            return norm_film_silu(x, scale, bias, fs, ft, groups, self.epsilon)
        if act == "silu":
            return norm_silu(x, scale, bias, groups, self.epsilon)
        return group_norm(x, scale, bias, groups, self.epsilon)


class Conv3x3AsDot(nn.Module):
    """3x3 same-padding conv evaluated as im2col + one MXU dot.

    For small spatial maps (8x8 / 16x16 at the UNet's deep levels) XLA's TPU
    conv emitter runs at ~15% MXU efficiency (batch-1, tiny spatial — no
    space-to-batch rewrite; measured in the round-2 guided-step profile).
    Rewriting as [H*W, 9*C_in] x [9*C_in, C_out] gives the MXU a
    well-shaped matmul (3.5x faster at [1,8,8,1024]); the im2col gather is
    9 shifted pads of a tensor that is tiny at these levels. Parameter
    shape/name ('kernel' [3,3,I,O] + 'bias') is identical to nn.Conv, so
    checkpoints convert identically and either path can load either.
    """

    features: int
    zero_init: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        if xd.ndim == 5:  # stripped input below the dot threshold (only
            # reachable with a lowered STRIP_MIN_TOKENS, e.g. in tests)
            return strip_conv3x3_apply(xd, kd) + bias.astype(xd.dtype)
        b, h, w, _ = x.shape
        xp = jnp.pad(xd, ((0, 0), (1, 1), (1, 1), (0, 0)))
        # taps ordered to match kernel[dy, dx] layout
        cols = [
            xp[:, dy : dy + h, dx : dx + w, :]
            for dy in range(3)
            for dx in range(3)
        ]
        patches = jnp.concatenate(cols, axis=-1).reshape(b * h * w, 9 * cin)
        out = patches @ kd.reshape(9 * cin, self.features)
        out = out + bias.astype(out.dtype)
        return out.reshape(b, h, w, self.features)


# spatial sizes at or below this token count route 3x3 convs through the
# im2col+dot path (the deep UNet levels); larger maps use XLA's conv
# emitter, which space-to-batches them efficiently (measured near-peak at
# 32x32+; the standalone dot win at [1,8,8,1024] is 70us -> 40us)
CONV_DOT_MAX_TOKENS = 256


# ---------------------------------------------------------------------------
# Strip-batched level-0 representation
# ---------------------------------------------------------------------------
# XLA space-to-batches every batch-1 256² conv independently and pays layout
# transposes between neighboring ops' differing S2B layouts — ~8 ms/step of
# 'data formatting'+'copy' in the round-3 guided-step profile
# (tools/profile_guided.py). Instead the UNet keeps its largest level in an
# explicit strip-batched form [1, S, H/S, W, C]: convs run as batch-S with a
# one-row halo exchange (exactly conv-'same' semantics, zero rows at the
# image boundary), everything elementwise stays in the strip layout, and
# GroupNorm statistics are pooled over (strip, h, w) — which the group_norm
# custom VJPs already do for ANY rank (they reduce all axes between batch
# and channel). Measured on the probe (tools/probe_strip_conv.py): 17%
# faster fwd+bwd on the level-0 resblock core, bitwise-exact; the win
# requires the layout to PERSIST across the segment (strip-batching convs
# alone recovers only 5%).

# Measured defaults (PERF.md round-3 ladder) live in osmosis_tpu.perf:
#   strip_min_tokens=1024 — production 256px model strips at 32²..256²,
#   incl. through the attention blocks' flat-view round trips (ladder with
#   the rotated-kernel backward: 65536-only 24.2 → 16384 27.8 → 4096 28.3
#   → 1024 29.0 guided steps/s); strip_count=16 — best at 256² (vs
#   32/64/128). NOTE trace-time semantics: see osmosis_tpu/perf.py — knobs
#   are read while tracing; flipping them after a jitted apply has been
#   traced (or served from the persistent compilation cache) has no effect
#   on that executable.


def strips_enabled() -> bool:
    from .. import perf

    return bool(perf.get("strip_conv"))


def strip_count() -> int:
    from .. import perf

    return int(perf.get("strip_count"))


def strip_min_tokens() -> int:
    from .. import perf

    return int(perf.get("strip_min_tokens"))


def spatial_tokens(x: jax.Array) -> int:
    n = 1
    for d in x.shape[1:-1]:
        n *= d
    return n


def to_strips(x: jax.Array, s: int = None) -> jax.Array:
    """[B, H, W, C] → [B, S, H/S, W, C] — a contiguous (free) reshape."""
    s = s or strip_count()
    b, h, w, c = x.shape
    assert h % s == 0, (h, s)
    return x.reshape(b, s, h // s, w, c)


def from_strips(x: jax.Array) -> jax.Array:
    b, s, h, w, c = x.shape
    return x.reshape(b, s * h, w, c)


def _halo_rows(x: jax.Array) -> jax.Array:
    """[S, h, W, C] → [S, h+2, W, C]: one halo row from each neighboring
    strip; zeros at the image boundary (== conv 'same' zero padding)."""
    top = jnp.concatenate([jnp.zeros_like(x[:1, -1:]), x[:-1, -1:]], axis=0)
    bot = jnp.concatenate([x[1:, :1], jnp.zeros_like(x[-1:, :1])], axis=0)
    return jnp.concatenate([top, x, bot], axis=1)


def _strip_conv3x3_raw(x5: jax.Array, kernel: jax.Array) -> jax.Array:
    """3x3 'same' conv on the strip representation, batch ONLY over axis 1
    (axis 0 is the true batch; vmap-safe because it is never reshaped).

    The per-image Python loop is deliberate. Folding the true batch into
    the strip axis (one batch-(B*S) conv via 5-D halo concats + reshape)
    was implemented and measured WORSE on both paths in round 4:
    batch-1 31.0 → 29.1 guided steps/s, direct batch-4 154 → 175 ms/step
    (+16 ms/step of data-formatting layout transposes around the reshape
    — tools/profile_guided.py --batch 4). The vmapped fleet path never
    sees this loop anyway: vmap lifts the image axis straight into the
    conv's batch dimension."""
    b = x5.shape[0]
    outs = []
    for i in range(b):  # b == 1 in every latency path
        xs = x5[i]
        y = jax.lax.conv_general_dilated(
            _halo_rows(xs), kernel, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        outs.append(y)
    return jnp.stack(outs, axis=0)


def _flat_conv3x3(x: jax.Array, kernel: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def _strip_conv3x3_flatbwd(x5, kernel):
    """Strip-batched forward, FLAT backward: the autodiffed backward of the
    halo'd batch-S conv runs its dgrad at ~75% MXU peak ([S,h+2,W,C] tiles
    emit worse than space-to-batch) — but strip fwd ≡ flat fwd exactly, so
    the backward may legally use the flat conv's VJP (whose S2B dgrad runs
    at ~95% peak). Experiment flag: OSMOSIS_TPU_STRIP_BWD_FLAT=1."""
    return _strip_conv3x3_raw(x5, kernel)


def _scf_fwd(x5, kernel):
    return _strip_conv3x3_raw(x5, kernel), (x5, kernel)


def _scf_bwd(res, dy5):
    x5, kernel = res
    dy = from_strips(dy5)
    _, pull = jax.vjp(_flat_conv3x3, from_strips(x5), kernel)
    dxf, dk = pull(dy)
    return to_strips(dxf, x5.shape[1]), dk


_strip_conv3x3_flatbwd.defvjp(_scf_fwd, _scf_bwd)


@jax.custom_vjp
def _strip_conv3x3_rotbwd(x5, kernel):
    """Strip conv whose backward is ANOTHER forward-geometry strip conv.

    Autodiff of the halo'd conv derives a dgrad with [S,h+2,W,C] output
    shape that the TPU conv emitter runs at only 74-80% of MXU peak, while
    the forward-geometry strip conv runs at ~97% (round-3 profile). For a
    stride-1 3x3 'same' conv, dx = conv_same(dy, rot180(k) with I/O
    swapped) — exactly the same strip conv, so the backward reuses it. The
    kernel gradient (training only) comes from the raw VJP; its unused slow
    dgrad is dead code XLA eliminates."""
    return _strip_conv3x3_raw(x5, kernel)


def _scr_fwd(x5, kernel):
    return _strip_conv3x3_raw(x5, kernel), (x5, kernel)


def _scr_bwd(res, dy5):
    x5, kernel = res
    k_rot = jnp.flip(kernel, axis=(0, 1)).swapaxes(2, 3)
    dx = _strip_conv3x3_raw(dy5, k_rot)
    _, pull = jax.vjp(_strip_conv3x3_raw, x5, kernel)
    _, dk = pull(dy5)  # dx from this pullback is discarded (DCE'd)
    return dx, dk


_strip_conv3x3_rotbwd.defvjp(_scr_fwd, _scr_bwd)


def strip_conv3x3_apply(x5: jax.Array, kernel: jax.Array) -> jax.Array:
    from .. import perf

    mode = perf.get("strip_bwd")
    if mode == "flat":
        return _strip_conv3x3_flatbwd(x5, kernel)  # measured 18% worse; record
    if mode == "raw":
        return _strip_conv3x3_raw(x5, kernel)  # autodiff bwd (slow dgrad)
    return _strip_conv3x3_rotbwd(x5, kernel)


def strip_conv1x1_apply(x5: jax.Array, kernel: jax.Array) -> jax.Array:
    b, s, h, w, cin = x5.shape
    cout = kernel.shape[-1]
    y = x5.reshape(b * s * h * w, cin) @ kernel.reshape(cin, cout)
    return y.reshape(b, s, h, w, cout)


class ConvMulti(nn.Module):
    """Conv over a VIRTUAL channel concatenation: one kernel parameter of
    the full input width (identical tree/init to nn.Conv), applied as one
    sliced conv per part and summed — conv is linear over input channels,
    so this equals conv(concat(parts)) exactly while never materializing
    the concat (a 2x67MB round-trip per level-0 output block).

    Parts may be 5-D strip tensors ([B, S, h, W, C] — see to_strips): the
    conv then runs batch-S with halo rows instead of letting XLA
    space-to-batch it."""

    features: int
    ksize: int = 3
    zero_init: bool = False
    dtype: Any = jnp.float32
    use_dot: bool = False

    @nn.compact
    def __call__(self, parts) -> jax.Array:
        if not isinstance(parts, (list, tuple)):
            parts = [parts]
        in_total = sum(p.shape[-1] for p in parts)
        k = self.ksize
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal(),
            (k, k, in_total, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        kd = kernel.astype(self.dtype)
        out, off = None, 0
        for p in parts:
            cin = p.shape[-1]
            kp = jax.lax.slice_in_dim(kd, off, off + cin, axis=2)
            pd = p.astype(self.dtype)
            if pd.ndim == 5:
                if k == 1:
                    y = strip_conv1x1_apply(pd, kp)
                else:
                    y = strip_conv3x3_apply(pd, kp)
            elif self.use_dot:
                b, h, w, _ = pd.shape
                if k == 1:
                    y = pd.reshape(b * h * w, cin) @ kp.reshape(cin, self.features)
                else:
                    xp = jnp.pad(pd, ((0, 0), (1, 1), (1, 1), (0, 0)))
                    cols = [
                        xp[:, dy : dy + h, dx : dx + w, :]
                        for dy in range(3) for dx in range(3)
                    ]
                    patches = jnp.concatenate(cols, axis=-1).reshape(b * h * w, 9 * cin)
                    y = patches @ kp.reshape(9 * cin, self.features)
                y = y.reshape(b, h, w, self.features)
            else:
                pad = (k - 1) // 2
                y = jax.lax.conv_general_dilated(
                    pd, kp, (1, 1), ((pad, pad), (pad, pad)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            out = y if out is None else out + y
            off += cin
        return out + bias.astype(out.dtype)


def conv3x3_multi(features: int, name: str, zero_init: bool = False,
                  dtype: Any = jnp.float32, n_tokens: int = None):
    return ConvMulti(
        features, ksize=3, zero_init=zero_init, dtype=dtype, name=name,
        use_dot=n_tokens is not None and n_tokens <= CONV_DOT_MAX_TOKENS,
    )


def conv1x1_multi(features: int, name: str, zero_init: bool = False,
                  dtype: Any = jnp.float32, n_tokens: int = None):
    return ConvMulti(
        features, ksize=1, zero_init=zero_init, dtype=dtype, name=name,
        use_dot=n_tokens is not None and n_tokens <= CONV_DOT_MAX_TOKENS,
    )


class Conv3x3Flex(nn.Module):
    """3x3 'same' conv with call-time dispatch: 5-D strip tensors run the
    halo'd batch-S path; 4-D runs XLA's conv emitter. Parameter tree
    ('kernel' [3,3,I,O] + 'bias') is identical to nn.Conv."""

    features: int
    zero_init: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        if xd.ndim == 5:
            out = strip_conv3x3_apply(xd, kd)
        else:
            out = jax.lax.conv_general_dilated(
                xd, kd, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return out + bias.astype(out.dtype)


def conv3x3(features: int, name: str, zero_init: bool = False, dtype: Any = jnp.float32,
            n_tokens: int = None):
    if n_tokens is not None and n_tokens <= CONV_DOT_MAX_TOKENS:
        return Conv3x3AsDot(features, zero_init=zero_init, dtype=dtype, name=name)
    return Conv3x3Flex(features, zero_init=zero_init, dtype=dtype, name=name)


class Conv1x1AsDot(nn.Module):
    """1x1 conv as an explicit [B*T, Cin] x [Cin, Cout] dot (same param
    shape/name as nn.Conv with (1,1) kernel) — same rationale as
    Conv3x3AsDot for the small deep-level maps."""

    features: int
    zero_init: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal(),
            (1, 1, cin, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        lead = x.shape[:-1]
        n = 1
        for d in lead:
            n *= d
        out = x.astype(self.dtype).reshape(n, cin) @ (
            kernel.astype(self.dtype).reshape(cin, self.features)
        )
        out = out + bias.astype(out.dtype)
        return out.reshape(*lead, self.features)


def conv1x1(features: int, name: str, zero_init: bool = False, dtype: Any = jnp.float32,
            n_tokens: int = None):
    if n_tokens is not None and n_tokens <= CONV_DOT_MAX_TOKENS:
        return Conv1x1AsDot(features, zero_init=zero_init, dtype=dtype, name=name)
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
    """Nearest-neighbor 2x upsample, NHWC (unet.py:179-189).

    Default path is XLA's broadcast fusion (measured at/near roofline); the
    Pallas kernel in ops/upsample.py is an opt-in negative-result record —
    see the comment below."""
    if x.ndim == 5:  # strip representation: upsample within strips (rows
        # never cross strip boundaries under nearest-2x)
        b, s, h, w, c = x.shape
        out = jnp.broadcast_to(
            x[:, :, :, None, :, None, :], (b, s, h, 2, w, 2, c)
        )
        return out.reshape(b, s, h * 2, w * 2, c)
    b, h, w, c = x.shape
    # OPT-IN ONLY (perf knob pallas_upsample), kept for documentation:
    # measured 24% WORSE end-to-end when enabled at the >16MB sites (Mosaic
    # lowers the in-kernel broadcast+reshape far below roofline: prior
    # sampling 19 -> 32 ms/step), and at <=16MB outputs XLA's scoped-vmem
    # promotion OOMs the stack. XLA's broadcast fusion wins; see PERF.md.
    out_bytes = 4 * h * w * c * x.dtype.itemsize
    from .. import perf as _perf

    if (
        jax.default_backend() == "tpu"
        and _perf.get("pallas_upsample")
        and out_bytes > 17 * 1024 * 1024
        and c % 128 == 0
        and h % 2 == 0 and w % 2 == 0
    ):
        from ..ops.upsample import upsample_nearest_2x_pallas

        return upsample_nearest_2x_pallas(x)
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2 average pool, stride 2, NHWC (unet.py:215).

    Written as reshape+mean rather than reduce_window: identical math, but
    the autodiffed backward is a broadcast instead of a select-and-scatter
    style pattern, and both directions fuse into neighboring elementwise
    ops."""
    if x.ndim == 5:  # strip representation: 2x2 windows never straddle a
        # strip boundary (strip height is even)
        b, s, h, w, c = x.shape
        return x.reshape(b, s, h // 2, 2, w // 2, 2, c).mean(axis=(3, 5))
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
