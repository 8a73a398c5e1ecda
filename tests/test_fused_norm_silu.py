"""norm_silu / norm_film_silu fused custom VJPs ≡ autodiff of the unfused
composition (value + dx + affine/FiLM grads, fp32 and bf16, under vmap).

These ops exist purely to shrink the backward's residual set (models/nn.py);
the math must be bit-identical in forward and autodiff-equivalent in reverse.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osmosis_tpu.models.nn import (
    _silu_raw,
    group_norm,
    norm_film_silu,
    norm_silu,
    silu,
)


def unfused_ns(x, scale, bias, groups, eps):
    return _silu_raw(group_norm(x, scale, bias, groups, eps))


def unfused_nfs(x, scale, bias, fs, ft, groups, eps):
    h = group_norm(x, scale, bias, groups, eps)
    return _silu_raw(h * (1 + fs) + ft)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 64), 32), ((1, 4, 4, 96), 32)])
def test_norm_silu_matches_unfused(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 1.7 - 0.2
    scale = jnp.asarray(rng.uniform(0.5, 1.5, shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, shape[-1]).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    out = norm_silu(x, scale, bias, groups, 1e-5)
    ref = unfused_ns(x, scale, bias, groups, 1e-5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    gf = jax.grad(
        lambda *a: jnp.sum(norm_silu(*a, groups, 1e-5) * cot), argnums=(0, 1, 2)
    )(x, scale, bias)
    gr = jax.grad(
        lambda *a: jnp.sum(unfused_ns(*a, groups, 1e-5) * cot), argnums=(0, 1, 2)
    )(x, scale, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_norm_film_silu_matches_unfused():
    rng = np.random.default_rng(1)
    shape, groups = (2, 8, 8, 64), 32
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 64).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, 64).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((2, 1, 1, 64)).astype(np.float32)) * 0.3
    ft = jnp.asarray(rng.standard_normal((2, 1, 1, 64)).astype(np.float32)) * 0.3
    cot = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    out = norm_film_silu(x, scale, bias, fs, ft, groups, 1e-5)
    ref = unfused_nfs(x, scale, bias, fs, ft, groups, 1e-5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    gf = jax.grad(
        lambda *a: jnp.sum(norm_film_silu(*a, groups, 1e-5) * cot),
        argnums=(0, 1, 2, 3, 4),
    )(x, scale, bias, fs, ft)
    gr = jax.grad(
        lambda *a: jnp.sum(unfused_nfs(*a, groups, 1e-5) * cot),
        argnums=(0, 1, 2, 3, 4),
    )(x, scale, bias, fs, ft)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_silu_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64,)).astype(np.float32)) * 3
    np.testing.assert_array_equal(np.asarray(silu(x)), np.asarray(_silu_raw(x)))
    gf = jax.grad(lambda v: jnp.sum(silu(v) ** 2))(x)
    gr = jax.grad(lambda v: jnp.sum(_silu_raw(v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-6, atol=1e-7)


def test_bf16_io():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)).astype(np.float32), jnp.bfloat16)
    fs = jnp.asarray(rng.standard_normal((1, 1, 1, 64)).astype(np.float32), jnp.bfloat16) * 0.3
    ft = jnp.zeros((1, 1, 1, 64), jnp.bfloat16)
    out = norm_film_silu(x, jnp.ones(64), jnp.zeros(64), fs, ft, 32, 1e-5)
    ref = unfused_nfs(x, jnp.ones(64), jnp.zeros(64), fs, ft, 32, 1e-5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(ref, np.float32)
    )
    g = jax.grad(
        lambda v: jnp.sum(norm_film_silu(v, jnp.ones(64), jnp.zeros(64), fs, ft, 32, 1e-5).astype(jnp.float32) ** 2)
    )(x)
    gr = jax.grad(
        lambda v: jnp.sum(unfused_nfs(v, jnp.ones(64), jnp.zeros(64), fs, ft, 32, 1e-5).astype(jnp.float32) ** 2)
    )(x)
    assert g.dtype == jnp.bfloat16
    # fused and unfused are algebraically identical but round differently in
    # bf16 (silu backward: g·s + (g·x)·(s−s²) vs g·s·(1+x·(1−s))); near-zero
    # gradient elements show large RELATIVE error — bound the absolute error
    # at the bf16 quantization scale of this gradient (|g| ≲ 4)
    np.testing.assert_allclose(
        np.asarray(g, np.float32), np.asarray(gr, np.float32), rtol=0.05, atol=0.1
    )


def test_vmap_grad_matches_per_example():
    """The fleet runner vmaps the guided loop — fused VJPs must batch."""
    rng = np.random.default_rng(4)
    xs = jnp.asarray(rng.standard_normal((3, 1, 4, 4, 32)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 32).astype(np.float32))
    bias = jnp.zeros(32)

    def loss(x):
        return jnp.sum(norm_silu(x, scale, bias, 32, 1e-5) ** 2)

    batched = jax.vmap(jax.grad(loss))(xs)
    for i in range(3):
        single = jax.grad(loss)(xs[i])
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), rtol=1e-5, atol=1e-6
        )


def test_unet_forward_and_xgrad_unchanged(monkeypatch):
    """A tiny UNet must produce the same forward AND x-gradient with the
    fused path on vs off (OSMOSIS_TPU_FUSED_NORM_SILU=0)."""
    from osmosis_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(
        image_size=16, in_channels=4, model_channels=32, out_channels=8,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16,
    )
    model = UNetModel(cfg)
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
    t = jnp.asarray([7])
    params = model.init(key, x, t)

    def run(x_):
        return model.apply(params, x_, t)

    def xloss(x_):
        return jnp.sum(run(x_) ** 2)

    out_fused = run(x)
    g_fused = jax.grad(xloss)(x)
    monkeypatch.setenv("OSMOSIS_TPU_FUSED_NORM_SILU", "0")
    out_ref = run(x)
    g_ref = jax.grad(xloss)(x)
    np.testing.assert_array_equal(np.asarray(out_fused), np.asarray(out_ref))
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=2e-5, atol=1e-6
    )
