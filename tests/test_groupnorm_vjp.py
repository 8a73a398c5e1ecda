"""group_norm custom_vjp ≡ autodiff of the naive definition (value + grads).

The hand-written TPU backward (lane-aligned per-channel reductions,
models/nn.py group_norm) must be numerically identical to differentiating
the textbook GroupNorm — checked for dx, dscale, dbias, under vmap, and for
bf16 inputs (fp32 islands contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osmosis_tpu.models.nn import group_norm


def naive_group_norm(x, scale, bias, num_groups, eps):
    b, h, w, c = x.shape
    g = num_groups
    x32 = x.astype(jnp.float32)
    xg = x32.reshape(b, h, w, g, c // g)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    xhat = ((xg - mean) / jnp.sqrt(var + eps)).reshape(b, h, w, c)
    return (xhat * scale + bias).astype(x.dtype)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 64), 32), ((1, 4, 4, 96), 32),
                                          ((3, 5, 7, 36), 6)])
def test_value_and_grads_match_naive(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 2.0 + 0.3
    scale = jnp.asarray(rng.uniform(0.5, 1.5, shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, shape[-1]).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    out = group_norm(x, scale, bias, groups, 1e-5)
    ref = naive_group_norm(x, scale, bias, groups, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def loss_custom(x_, s_, b_):
        return jnp.sum(group_norm(x_, s_, b_, groups, 1e-5) * cot)

    def loss_naive(x_, s_, b_):
        return jnp.sum(naive_group_norm(x_, s_, b_, groups, 1e-5) * cot)

    gx, gs, gb = jax.grad(loss_custom, argnums=(0, 1, 2))(x, scale, bias)
    rx, rs, rb = jax.grad(loss_naive, argnums=(0, 1, 2))(x, scale, bias)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4, atol=1e-4)


def test_vmap_grad_matches_per_example():
    """The fleet runner vmaps the guided loop over images — the custom VJP
    must batch correctly."""
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.standard_normal((3, 1, 4, 4, 32)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 32).astype(np.float32))
    bias = jnp.zeros(32)

    def loss(x):
        return jnp.sum(group_norm(x, scale, bias, 32, 1e-5) ** 2)

    batched = jax.vmap(jax.grad(loss))(xs)
    for i in range(3):
        single = jax.grad(loss)(xs[i])
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), rtol=1e-5, atol=1e-6
        )


def test_bf16_io_fp32_stats():
    rng = np.random.default_rng(2)
    x32 = rng.standard_normal((1, 8, 8, 64)).astype(np.float32)
    x16 = jnp.asarray(x32, jnp.bfloat16)
    out = group_norm(x16, jnp.ones(64), jnp.zeros(64), 32, 1e-5)
    assert out.dtype == jnp.bfloat16
    ref = naive_group_norm(jnp.asarray(x32), jnp.ones(64), jnp.zeros(64), 32, 1e-5)
    # bf16 quantization of the INPUT dominates the error budget
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.1, rtol=0.05
    )
    g = jax.grad(lambda x_: jnp.sum(group_norm(x_, jnp.ones(64), jnp.zeros(64), 32, 1e-5) ** 2))(x16)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()
