"""Flax ADM UNet: shapes, zero-init heads, plan construction, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osmosis_tpu.models import UNetConfig, UNetModel, build_plan, unet_config_from_yaml

TINY = UNetConfig(
    image_size=32,
    in_channels=4,
    out_channels=8,
    model_channels=32,
    num_res_blocks=1,
    attention_resolutions=(4,),
    channel_mult=(1, 2),
    num_head_channels=16,
    use_scale_shift_norm=True,
    resblock_updown=True,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = UNetModel(TINY)
    x = jnp.zeros((1, 32, 32, 4))
    t = jnp.zeros((1,))
    params = model.init(jax.random.key(0), x, t)
    return model, params


def test_plan_matches_reference_construction():
    """Plan for the production config mirrors unet.py:556-695 with
    mult (1,1,2,2,4,4), 2 res blocks, attn at ds 8/16/32 (config at
    configs/osmosis_sample_config.yaml:47-63)."""
    cfg = unet_config_from_yaml(
        dict(
            image_size=256, num_channels=256, num_res_blocks=2, channel_mult="",
            learn_sigma=True, attention_resolutions="32, 16, 8", num_heads=4,
            num_head_channels=64, num_heads_upsample=-1, use_scale_shift_norm=True,
            resblock_updown=True, pretrain_model="osmosis",
        )
    )
    assert cfg.in_channels == 4 and cfg.out_channels == 8
    assert cfg.attention_resolutions == (8, 16, 32)
    assert cfg.channel_mult == (1, 1, 2, 2, 4, 4)
    inb, mid, outb = build_plan(cfg)
    # 1 conv_in + 6 levels * 2 res + 5 downsamples = 18 input blocks
    assert len(inb) == 18
    # first attention appears at ds=8 → level 3 (0-indexed), i.e. after
    # 1 + 2 + 1 + 2 + 1 + 2 + 1 = block 10
    attn_blocks = [i for i, b in enumerate(inb) if any(l["kind"] == "attn" for l in b)]
    assert attn_blocks == [10, 11, 13, 14, 16, 17]
    # attention head counts: ch/64
    heads = [l["heads"] for b in inb for l in b if l["kind"] == "attn"]
    assert heads == [8, 8, 16, 16, 16, 16]
    assert [l["kind"] for l in mid] == ["res", "attn", "res"]
    # 6 levels * 3 output blocks
    assert len(outb) == 18
    # last output block ends at ch 256
    assert outb[-1][0]["out_ch"] == 256
    # skip-connection input channels pop in reverse
    assert outb[0][0]["in_ch"] == 1024 + 1024


def test_forward_shape_and_zero_init(tiny_model):
    model, params = tiny_model
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 4))
    t = jnp.array([5.0, 900.0])
    y = model.apply(params, x, t)
    assert y.shape == (2, 32, 32, 8)
    # out_conv is zero-initialized (nn.py:68-74) → fresh model outputs 0
    np.testing.assert_allclose(np.asarray(y), 0.0)


def test_resblock_zero_init_is_identity_skip(tiny_model):
    """Zero-init out convs make every fresh ResBlock's residual branch 0;
    with equal channels the block is the identity."""
    from osmosis_tpu.models.unet import ResBlock

    block = ResBlock(out_channels=32)
    x = jax.random.normal(jax.random.key(2), (1, 8, 8, 32))
    emb = jax.random.normal(jax.random.key(3), (1, 64))
    p = block.init(jax.random.key(4), x, emb)
    y = block.apply(p, x, emb)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6)


def test_attention_block_math():
    """Attention output matches a naive per-head reference computation
    (unet.py:416-433 semantics: 1/sqrt(sqrt(hc)) scaling on q and k,
    fp32 softmax)."""
    from osmosis_tpu.models.unet import AttentionBlock
    from osmosis_tpu.models.nn import GroupNorm32

    b, hh, ww, c, heads = 1, 4, 4, 64, 2
    hc = c // heads
    blk = AttentionBlock(num_heads=heads)
    x = jax.random.normal(jax.random.key(5), (b, hh, ww, c))
    p = blk.init(jax.random.key(6), x)
    p["params"]["proj"]["kernel"] = jnp.eye(c)  # make proj transparent
    y = np.asarray(blk.apply(p, x))

    # manual reference computation
    t = hh * ww
    xt = np.asarray(x).reshape(b, t, c)
    gn = GroupNorm32()
    nrm = np.asarray(gn.apply({"params": p["params"]["norm"]}, xt))
    kern = np.asarray(p["params"]["qkv"]["kernel"])  # [c, 3c]
    bias = np.asarray(p["params"]["qkv"]["bias"])
    qkv = nrm @ kern + bias  # [b, t, 3c]
    qkv = qkv.reshape(b, t, 3, heads, hc)
    scale = 1.0 / np.sqrt(np.sqrt(hc))
    out = np.zeros((b, t, heads, hc))
    for h in range(heads):
        q, k, v = qkv[:, :, 0, h], qkv[:, :, 1, h], qkv[:, :, 2, h]
        logits = (q * scale) @ (k * scale).transpose(0, 2, 1)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        out[:, :, h] = w @ v
    expected = xt + out.reshape(b, t, c)
    np.testing.assert_allclose(y.reshape(b, t, c), expected, rtol=2e-4, atol=2e-5)


def test_timestep_embedding_values():
    from osmosis_tpu.models.nn import timestep_embedding

    emb = np.asarray(timestep_embedding(jnp.array([0.0]), 8))
    # t=0 → cos(0)=1 for first half, sin(0)=0 for second
    np.testing.assert_allclose(emb[0, :4], 1.0)
    np.testing.assert_allclose(emb[0, 4:], 0.0)
    # matches the reference formula for arbitrary t (nn.py:113-118)
    t, dim = 17.0, 8
    half = dim // 2
    freqs = np.exp(-np.log(10000) * np.arange(half) / half)
    args = t * freqs
    expected = np.concatenate([np.cos(args), np.sin(args)])
    np.testing.assert_allclose(
        np.asarray(timestep_embedding(jnp.array([t]), dim))[0], expected, rtol=1e-5
    )


def test_jit_and_determinism(tiny_model):
    model, params = tiny_model
    x = jax.random.normal(jax.random.key(7), (1, 32, 32, 4))
    t = jnp.array([100.0])
    f = jax.jit(model.apply)
    y1 = f(params, x, t)
    y2 = f(params, x, t)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


