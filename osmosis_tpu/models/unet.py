"""ADM UNet (guided-diffusion architecture) as an NHWC Flax model.

Feature-for-feature rebuild of the reference UNetModel
(guided_diffusion/unet.py:475-742) with the osmosis channel surgery baked in
(4-in / 8-out RGBD head, osmosis_utils/utils.py:265-288):

  * sinusoidal t-embedding → 2-layer MLP (unet.py:549-554)
  * ResBlocks with scale-shift (FiLM) GroupNorm (unet.py:327-331), optional
    in-block up/downsampling (resblock_updown, unet.py:267-276)
  * attention at configured downsample rates with num_head_channels head
    sizing (unet.py:580-589), legacy QKV head layout (unet.py:416-433)
  * zero-initialized out-projections everywhere (nn.py:68-74)
  * fp32 GroupNorm islands + fp32 softmax, bf16-able torso (nn.py:17-19)

TPU design: NHWC layout (XLA-native conv layout), one static architecture
plan shared with the torch→flax checkpoint converter, and optional jax remat
on blocks (replaces the reference's CheckpointFunction, nn.py:124-170).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import nn as onn
from ..config import parse_attention_resolutions, parse_channel_mult


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    image_size: int = 256
    in_channels: int = 4
    model_channels: int = 256
    out_channels: int = 8
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (8, 16, 32)
    dropout: float = 0.0  # inference-only pipeline: accepted, never applied
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    conv_resample: bool = True
    num_heads: int = 4
    num_head_channels: int = 64
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = False
    dtype: Any = jnp.float32
    remat: bool = False

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4

    def heads_for(self, ch: int, upsample: bool = False) -> int:
        if self.num_head_channels != -1:
            assert ch % self.num_head_channels == 0
            return ch // self.num_head_channels
        if upsample and self.num_heads_upsample != -1:
            return self.num_heads_upsample
        return self.num_heads


def unet_config_from_yaml(unet_model: Dict[str, Any], **overrides) -> UNetConfig:
    """Reference `unet_model` config dict → UNetConfig.

    Applies create_model's channel-mult/attention parsing (unet.py:47-68) and
    the osmosis channel surgery (unet.py:91-92): pretrain_model == 'osmosis'
    forces 4-in/8-out regardless of learn_sigma's 3/6 default (unet.py:74).
    """
    image_size = unet_model["image_size"]
    learn_sigma = unet_model.get("learn_sigma", False)
    if unet_model.get("pretrain_model", "") == "osmosis":
        in_ch, out_ch = 4, 8
    else:
        in_ch, out_ch = 3, (6 if learn_sigma else 3)
    cfg = dict(
        image_size=image_size,
        in_channels=in_ch,
        out_channels=out_ch,
        model_channels=unet_model.get("num_channels", 256),
        num_res_blocks=unet_model.get("num_res_blocks", 2),
        attention_resolutions=parse_attention_resolutions(
            unet_model.get("attention_resolutions", "16"), image_size
        ),
        dropout=unet_model.get("dropout", 0.0),
        channel_mult=parse_channel_mult(unet_model.get("channel_mult", ""), image_size),
        num_heads=unet_model.get("num_heads", 1),
        num_head_channels=unet_model.get("num_head_channels", -1),
        num_heads_upsample=unet_model.get("num_heads_upsample", -1),
        use_scale_shift_norm=unet_model.get("use_scale_shift_norm", False),
        resblock_updown=unet_model.get("resblock_updown", False),
        use_new_attention_order=unet_model.get("use_new_attention_order", False),
    )
    cfg.update(overrides)
    return UNetConfig(**cfg)


# ---------------------------------------------------------------------------
# Architecture plan — shared by the Flax module and the checkpoint converter
# ---------------------------------------------------------------------------

def build_plan(cfg: UNetConfig):
    """Replay of UNetModel.__init__'s block construction (unet.py:556-695).

    Returns (input_blocks, middle_block, output_blocks); each block is a list
    of layer descriptors. Descriptor kinds: conv_in, res, attn, res_down,
    down, res_up, up. The (block, layer) indices match the torch module tree
    (input_blocks.{i}.{j} etc.) one-for-one, which the converter relies on.
    """
    chm = cfg.channel_mult
    ch = int(chm[0] * cfg.model_channels)
    input_blocks: List[List[dict]] = [[dict(kind="conv_in", out_ch=ch)]]
    input_chans = [ch]
    ds = 1
    for level, mult in enumerate(chm):
        for _ in range(cfg.num_res_blocks):
            out_ch = int(mult * cfg.model_channels)
            layers = [dict(kind="res", in_ch=ch, out_ch=out_ch)]
            ch = out_ch
            if ds in cfg.attention_resolutions:
                layers.append(dict(kind="attn", ch=ch, heads=cfg.heads_for(ch)))
            input_blocks.append(layers)
            input_chans.append(ch)
        if level != len(chm) - 1:
            if cfg.resblock_updown:
                input_blocks.append([dict(kind="res_down", in_ch=ch, out_ch=ch)])
            else:
                input_blocks.append([dict(kind="down", ch=ch)])
            input_chans.append(ch)
            ds *= 2

    middle_block = [
        dict(kind="res", in_ch=ch, out_ch=ch),
        dict(kind="attn", ch=ch, heads=cfg.heads_for(ch)),
        dict(kind="res", in_ch=ch, out_ch=ch),
    ]

    output_blocks: List[List[dict]] = []
    for level, mult in list(enumerate(chm))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = input_chans.pop()
            out_ch = int(cfg.model_channels * mult)
            layers = [dict(kind="res", in_ch=ch + ich, out_ch=out_ch)]
            ch = out_ch
            if ds in cfg.attention_resolutions:
                layers.append(
                    dict(kind="attn", ch=ch, heads=cfg.heads_for(ch, upsample=True))
                )
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    layers.append(dict(kind="res_up", in_ch=ch, out_ch=ch))
                else:
                    layers.append(dict(kind="up", ch=ch))
                ds //= 2
            output_blocks.append(layers)

    return input_blocks, middle_block, output_blocks


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _strip_repr(ts):
    """Normalize a list of tensors to the representation their size calls
    for: >= STRIP_MIN_TOKENS spatial tokens → 5-D strips, below → 4-D flat
    (both directions are contiguous reshapes; see nn.py strip section)."""
    t0 = ts[0]
    tok = onn.spatial_tokens(t0)
    if (t0.ndim == 4 and onn.strips_enabled()
            and tok >= onn.strip_min_tokens()
            and t0.shape[1] % onn.strip_count() == 0
            # strips need an EVEN row count >= 2 so an in-strip avg_pool_2x
            # (nn.py) stays legal on res_down paths (e.g. H=48, S=16 would
            # make 3-row strips whose reshape(b,s,h//2,2,...) fails)
            and t0.shape[1] // onn.strip_count() >= 2
            and (t0.shape[1] // onn.strip_count()) % 2 == 0):
        return [onn.to_strips(t) for t in ts]
    if t0.ndim == 5 and tok < onn.strip_min_tokens():
        return [onn.from_strips(t) for t in ts]
    return ts


class ResBlock(nn.Module):
    """ResBlock with FiLM scale-shift norm and in-block resampling
    (unet.py:222-335).

    ``x`` may be a TUPLE (h, skip) representing the skip concatenation
    WITHOUT materializing it: GroupNorm's 32 groups never straddle the two
    halves (both halves are multiples of the group width), so
    GN(concat(a,b)) == concat(GN(a; affine[:Ca]), GN(b; affine[Ca:])) exactly,
    and the convs split along their input-channel axis
    (conv(concat, W) == conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:])).
    This removes the 2x67MB concat write+read per level-0 output block and
    the matching split/pad traffic in the backward — pure HBM savings, the
    parameter tree and math are IDENTICAL to the concatenated form.
    """

    out_channels: int
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb: jax.Array) -> jax.Array:
        parts = list(x) if isinstance(x, tuple) else [x]
        in_ch = sum(p.shape[-1] for p in parts)
        gw = in_ch // 32  # GroupNorm group width over the virtual concat
        aligned = all(
            sum(p.shape[-1] for p in parts[: i + 1]) % gw == 0
            for i in range(len(parts) - 1)
        )
        if len(parts) > 1 and (not aligned or self.out_channels == in_ch):
            # a group straddles the part boundary (e.g. 512+256=768ch at
            # level transitions) — materialize the concat, exact old path
            parts = [jnp.concatenate(parts, axis=-1)]

        # in_norm over the (virtual) concat: per-part GN with sliced affine;
        # SiLU fused into the norm's custom VJP (no pre-activation residuals)
        gn = onn.GroupNorm32(name="in_norm", num_channels=in_ch)
        c_parts = [p.shape[-1] for p in parts]
        offs = [sum(c_parts[:i]) for i in range(len(c_parts))]
        hs = [
            gn(p, channel_offset=o, act="silu")
            for p, o in zip(parts, offs)
        ]
        xs = parts
        if self.up:
            hs = [onn.upsample_nearest_2x(h) for h in hs]
            xs = [onn.upsample_nearest_2x(p) for p in xs]
        elif self.down:
            hs = [onn.avg_pool_2x(h) for h in hs]
            xs = [onn.avg_pool_2x(p) for p in xs]
        # representation normalization: big maps live as [B,S,h,W,C] strips
        # (halo'd batch-S convs instead of XLA space-to-batch — nn.py), so
        # after in-block resampling the tensors may cross the threshold in
        # either direction
        hs = _strip_repr(hs)
        xs = _strip_repr(xs)
        h = onn.conv3x3_multi(self.out_channels, "in_conv", dtype=self.dtype,
                              n_tokens=onn.spatial_tokens(hs[0]))(hs)

        emb_width = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = onn.dense(emb_width, "emb_proj", dtype=self.dtype)(onn.silu(emb))
        emb_out = emb_out.reshape(
            (emb_out.shape[0],) + (1,) * (h.ndim - 2) + (emb_width,)
        ).astype(h.dtype)

        if self.use_scale_shift_norm:
            scale = emb_out[..., : self.out_channels]
            shift = emb_out[..., self.out_channels:]
            h = onn.GroupNorm32(name="out_norm")(h, film=(scale, shift), act="silu")
        else:
            h = h + emb_out
            h = onn.GroupNorm32(name="out_norm")(h, act="silu")
        h = onn.conv3x3(self.out_channels, "out_conv", zero_init=True, dtype=self.dtype,
                        n_tokens=onn.spatial_tokens(h))(h)

        if self.out_channels == in_ch:
            skip = xs[0]
        elif self.use_conv_skip:
            skip = onn.conv3x3_multi(self.out_channels, "skip", dtype=self.dtype,
                                     n_tokens=onn.spatial_tokens(xs[0]))(xs)
        else:
            skip = onn.conv1x1_multi(self.out_channels, "skip", dtype=self.dtype,
                                     n_tokens=onn.spatial_tokens(xs[0]))(xs)
        return skip + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened HW tokens (unet.py:338-433).

    q/k are each scaled by 1/sqrt(sqrt(head_dim)) before the logits matmul and
    the softmax runs in fp32 (unet.py:427-431). Internal layout is part-major
    [B, T, 3, heads, hc]; the converter permutes torch's legacy head-major
    interleave into this layout.
    """

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        t = hh * ww
        hc = c // self.num_heads
        xt = x.reshape(b, t, c)
        nrm = onn.GroupNorm32(name="norm")(xt)
        qkv = onn.dense(3 * c, "qkv", dtype=self.dtype)(nrm)
        qkv = qkv.reshape(b, t, 3, self.num_heads, hc)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, T, H, hc]

        # XLA's fused path is HBM-roofline-bound at these sizes; a Pallas
        # attention kernel was built, measured slower, and deleted (PERF.md
        # round 2: attention is ~0.6 ms of the 43 ms guided step)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(hc, jnp.float32))).astype(q.dtype)
        logits = jnp.einsum(
            "bthc,bshc->bhts", q * scale, k * scale,
            preferred_element_type=jnp.float32,
        )
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        a = jnp.einsum("bhts,bshc->bthc", weights, v)

        a = a.reshape(b, t, c)
        proj = onn.dense(c, "proj", zero_init=True, dtype=self.dtype)(a)
        return x + proj.reshape(b, hh, ww, c)


class Downsample(nn.Module):
    """Stride-2 conv (or avg-pool) downsampling (unet.py:192-219)."""

    out_channels: int
    use_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_conv:
            return nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                dtype=self.dtype, param_dtype=jnp.float32, name="op",
            )(x)
        return onn.avg_pool_2x(x)


class Upsample(nn.Module):
    """Nearest 2x + optional conv (unet.py:160-189)."""

    out_channels: int
    use_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = onn.upsample_nearest_2x(x)
        if self.use_conv:
            x = onn.conv3x3(self.out_channels, "conv", dtype=self.dtype,
                            n_tokens=x.shape[1] * x.shape[2])(x)
        return x


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

class UNetModel(nn.Module):
    """The full UNet; forward mirrors unet.py:713-742 (NHWC)."""

    cfg: UNetConfig

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array) -> jax.Array:
        cfg = self.cfg
        input_blocks, middle_block, output_blocks = build_plan(cfg)

        res_cls, attn_cls = ResBlock, AttentionBlock
        if cfg.remat:
            res_cls = nn.remat(ResBlock)
            attn_cls = nn.remat(AttentionBlock)

        def apply_layer(h, emb, lay, name):
            if lay["kind"] == "conv_in":
                return onn.conv3x3(lay["out_ch"], name, dtype=cfg.dtype)(h)
            if lay["kind"] in ("res", "res_down", "res_up"):
                return res_cls(
                    out_channels=lay["out_ch"],
                    use_scale_shift_norm=cfg.use_scale_shift_norm,
                    up=lay["kind"] == "res_up",
                    down=lay["kind"] == "res_down",
                    dtype=cfg.dtype,
                    name=name,
                )(h, emb)
            if lay["kind"] == "attn":
                # attention flattens HW tokens — run it on the 4-D view
                # (free reshapes in and out of the strip representation)
                strip = h.ndim == 5
                s_in = h.shape[1] if strip else None  # restore the INCOMING
                # strip count, not the global default (they agree today, but
                # a caller using to_strips(x, s) must round-trip losslessly)
                out = attn_cls(
                    num_heads=lay["heads"], dtype=cfg.dtype,
                    name=name,
                )(onn.from_strips(h) if strip else h)
                return onn.to_strips(out, s_in) if strip else out
            if lay["kind"] == "down":
                if h.ndim == 5:
                    h = onn.from_strips(h)
                return _strip_repr([Downsample(
                    lay["ch"], use_conv=cfg.conv_resample, dtype=cfg.dtype, name=name
                )(h)])[0]
            if lay["kind"] == "up":
                if h.ndim == 5:
                    h = onn.from_strips(h)
                return _strip_repr([Upsample(
                    lay["ch"], use_conv=cfg.conv_resample, dtype=cfg.dtype, name=name
                )(h)])[0]
            raise ValueError(lay["kind"])

        # timestep embedding MLP (unet.py:549-554,727)
        emb = onn.timestep_embedding(timesteps, cfg.model_channels)
        emb = onn.dense(cfg.time_embed_dim, "time_dense0", dtype=cfg.dtype)(emb)
        emb = onn.silu(emb)
        emb = onn.dense(cfg.time_embed_dim, "time_dense1", dtype=cfg.dtype)(emb)

        h = _strip_repr([x.astype(cfg.dtype)])[0]
        hs = []
        for i, block in enumerate(input_blocks):
            for j, lay in enumerate(block):
                h = apply_layer(h, emb, lay, f"in_{i}_{j}")
            hs.append(h)
        for j, lay in enumerate(middle_block):
            h = apply_layer(h, emb, lay, f"mid_{j}")
        for i, block in enumerate(output_blocks):
            # virtual concat: the first layer of every output block is a
            # ResBlock, which consumes the (h, skip) pair without
            # materializing the channel concatenation (see ResBlock)
            h = (h, hs.pop())
            for j, lay in enumerate(block):
                h = apply_layer(h, emb, lay, f"out_{i}_{j}")

        h = h.astype(jnp.float32)  # unet.py:741 h.type(x.dtype)
        h = onn.GroupNorm32(name="out_norm")(h, act="silu")
        h = onn.conv3x3(cfg.out_channels, "out_conv", zero_init=True)(h)
        return onn.from_strips(h) if h.ndim == 5 else h


def res_layer_names(cfg: UNetConfig):
    """Names of every ResBlock module, in plan order."""
    input_blocks, middle_block, output_blocks = build_plan(cfg)
    names, widths = [], []

    def visit(lay, name):
        if lay["kind"] in ("res", "res_down", "res_up"):
            names.append(name)
            widths.append(
                2 * lay["out_ch"] if cfg.use_scale_shift_norm else lay["out_ch"]
            )

    for i, block in enumerate(input_blocks):
        for j, lay in enumerate(block):
            visit(lay, f"in_{i}_{j}")
    for j, lay in enumerate(middle_block):
        visit(lay, f"mid_{j}")
    for i, block in enumerate(output_blocks):
        for j, lay in enumerate(block):
            visit(lay, f"out_{i}_{j}")
    return names, widths
