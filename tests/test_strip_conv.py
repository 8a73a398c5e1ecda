"""Strip-batched level-0 representation (models/nn.py strip section) must be
EXACT: halo'd batch-S convs + strip-layout GroupNorm/SiLU equal the flat
formulation bitwise in forward and to fp32 tolerance in gradients.

The production trigger is >= 65536 spatial tokens (256² maps); tests lower
perf strip_min_tokens so tiny models exercise the path, including the in-block
resampling transitions (res_down leaves strips, res_up enters them) and the
attention flat-view round-trip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osmosis_tpu import perf
from osmosis_tpu.models import nn as onn
from osmosis_tpu.models.unet import UNetConfig, UNetModel


def flat_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("hw,strips", [(32, 16), (32, 4), (64, 16)])
def test_strip_conv3x3_exact(hw, strips):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, hw, hw, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32)) * 0.1
    ref = flat_conv(x, w)
    x5 = onn.to_strips(x, strips)
    out = onn.from_strips(onn.strip_conv3x3_apply(x5, w))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_strip_conv_grad_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32)) * 0.1

    g_flat = jax.grad(lambda v: jnp.sum(flat_conv(v, w) ** 2))(x)
    g_strip = jax.grad(lambda v: jnp.sum(
        onn.strip_conv3x3_apply(onn.to_strips(v, 8), w) ** 2))(x)
    np.testing.assert_allclose(
        np.asarray(g_strip), np.asarray(g_flat), rtol=1e-6, atol=1e-6
    )


def test_strip_conv_flatbwd_exact(monkeypatch):
    """OSMOSIS_TPU_STRIP_BWD_FLAT=1 (flat-VJP backward): forward bitwise,
    dx and dkernel equal the plain strip path."""
    monkeypatch.setenv("OSMOSIS_TPU_STRIP_BWD_FLAT", "1")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32)) * 0.1

    out = onn.from_strips(onn.strip_conv3x3_apply(onn.to_strips(x, 8), w))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(flat_conv(x, w)))

    gx, gw = jax.grad(
        lambda v, k: jnp.sum(onn.strip_conv3x3_apply(onn.to_strips(v, 8), k) ** 2),
        argnums=(0, 1),
    )(x, w)
    rx, rw = jax.grad(
        lambda v, k: jnp.sum(flat_conv(v, k) ** 2), argnums=(0, 1)
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-5, atol=1e-5)


def test_strip_conv_rotbwd_exact(monkeypatch):
    """Default backward (rotated-kernel forward-geometry strip conv): dx and
    dkernel equal the autodiff of the raw strip conv."""
    monkeypatch.setenv("OSMOSIS_TPU_STRIP_BWD", "rot")
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32)) * 0.1

    out = onn.from_strips(onn.strip_conv3x3_apply(onn.to_strips(x, 8), w))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(flat_conv(x, w)))

    gx, gw = jax.grad(
        lambda v, k: jnp.sum(onn.strip_conv3x3_apply(onn.to_strips(v, 8), k) ** 2),
        argnums=(0, 1),
    )(x, w)
    rx, rw = jax.grad(
        lambda v, k: jnp.sum(flat_conv(v, k) ** 2), argnums=(0, 1)
    )(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-6, atol=1e-6)
    # dkernel accumulates in a different contraction order — fp32 noise only
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-4)


def test_groupnorm_strips_pool_over_strips():
    """[B,S,h,W,C] GroupNorm statistics must pool over (S,h,W) — identical
    to the flat tensor's stats (the custom VJP reduces all mid axes)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 32)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 32).astype(np.float32))
    bias = jnp.zeros(32)
    ref = onn.group_norm(x, scale, bias, 32, 1e-5)
    out = onn.from_strips(
        onn.group_norm(onn.to_strips(x, 4), scale, bias, 32, 1e-5)
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.fixture()
def tiny_cfg():
    return UNetConfig(
        image_size=32, in_channels=4, model_channels=32, out_channels=8,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16,
    )


def test_unet_strips_equal_flat(tiny_cfg, monkeypatch):
    """Full tiny UNet: strip mode (threshold lowered so the 32² AND 16²
    levels strip — covering res_down/res_up transitions, virtual-concat
    skips, attention's flat view) equals the flat path."""
    model = UNetModel(tiny_cfg)
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 4))
    t = jnp.asarray([5])
    monkeypatch.setenv("OSMOSIS_TPU_STRIP_CONV", "0")
    params = model.init(jax.random.key(0), x, t)
    out_flat = model.apply(params, x, t)
    g_flat = jax.grad(lambda v: jnp.sum(model.apply(params, v, t) ** 2))(x)

    monkeypatch.setenv("OSMOSIS_TPU_STRIP_CONV", "1")
    monkeypatch.setattr(perf._CONFIG, "strip_min_tokens", 256)
    monkeypatch.setattr(perf._CONFIG, "strip_count", 8)
    out_strip = model.apply(params, x, t)
    g_strip = jax.grad(lambda v: jnp.sum(model.apply(params, v, t) ** 2))(x)

    assert out_strip.shape == out_flat.shape
    np.testing.assert_allclose(
        np.asarray(out_strip), np.asarray(out_flat), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_strip), np.asarray(g_flat), rtol=2e-4, atol=2e-5
    )


def test_unet_strips_tiny_threshold_degrades_gracefully(tiny_cfg, monkeypatch):
    """A threshold so low that 1-row strips would arise (e.g. 16 rows /
    16 strips) must fall back to flat at those levels, not crash in the
    in-strip avg_pool."""
    model = UNetModel(tiny_cfg)
    x = jax.random.normal(jax.random.key(3), (1, 32, 32, 4))
    t = jnp.asarray([5])
    params = model.init(jax.random.key(0), x, t)
    ref = model.apply(params, x, t)
    monkeypatch.setattr(perf._CONFIG, "strip_min_tokens", 1)
    monkeypatch.setattr(perf._CONFIG, "strip_count", 16)
    out = model.apply(params, x, t)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_unet_strips_odd_rows_fall_back_to_flat(monkeypatch):
    """H divisible by strip_count but with an ODD row count per strip
    (48 rows / 16 strips = 3) must fall back to flat at that level — the
    in-strip avg_pool_2x reshape would fail at trace time on res_down
    paths otherwise (advisor finding r1)."""
    cfg = UNetConfig(
        image_size=48, in_channels=4, model_channels=32, out_channels=8,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16, resblock_updown=True,
    )
    model = UNetModel(cfg)
    x = jax.random.normal(jax.random.key(7), (1, 48, 48, 4))
    t = jnp.asarray([5])
    params = model.init(jax.random.key(0), x, t)
    ref = model.apply(params, x, t)
    monkeypatch.setattr(perf._CONFIG, "strip_min_tokens", 1)
    monkeypatch.setattr(perf._CONFIG, "strip_count", 16)
    out = model.apply(params, x, t)  # would raise without the even-rows guard
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_unet_strips_vmap(tiny_cfg, monkeypatch):
    """The fleet runner vmaps the model over images — the strip path must
    batch correctly."""
    model = UNetModel(tiny_cfg)
    xs = jax.random.normal(jax.random.key(2), (3, 1, 32, 32, 4))
    t = jnp.asarray([5])
    params = model.init(jax.random.key(0), xs[0], t)
    monkeypatch.setattr(perf._CONFIG, "strip_min_tokens", 256)
    monkeypatch.setattr(perf._CONFIG, "strip_count", 8)
    batched = jax.vmap(lambda x: model.apply(params, x, t))(xs)
    for i in range(3):
        single = model.apply(params, xs[i], t)
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), rtol=1e-5, atol=1e-6
        )
