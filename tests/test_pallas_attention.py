"""Pallas fused attention vs the XLA reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osmosis_tpu.ops import attention as A


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("t,h,hc", [(64, 2, 64), (256, 4, 64)])
def test_fused_attention_matches_reference(t, h, hc):
    b = 1
    key = jax.random.key(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b, t, h, hc)) for i in range(3)
    )
    ref = np.asarray(A._attention_ref(q, k, v))
    out = np.asarray(A.fused_attention(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_fused_attention_grad_matches_reference():
    b, t, h, hc = 1, 64, 2, 64
    key = jax.random.key(1)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (b, t, h, hc)) for i in range(3)
    )

    def loss_fused(q, k, v):
        return jnp.sum(A.fused_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(A._attention_ref(q, k, v) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5)


def test_unet_with_pallas_attention_matches_xla():
    """Whole tiny UNet: use_pallas_attention=True ≡ False (interpreted)."""
    from osmosis_tpu.models import UNetConfig, UNetModel

    kw = dict(
        image_size=16, in_channels=4, out_channels=8, model_channels=32,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
    )
    m1 = UNetModel(UNetConfig(**kw))
    m2 = UNetModel(UNetConfig(**kw, use_pallas_attention=True))
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 4))
    t = jnp.array([10.0])
    params = m1.init(jax.random.key(3), x, t)
    y1 = np.asarray(m1.apply(params, x, t))
    y2 = np.asarray(m2.apply(params, x, t))
    np.testing.assert_allclose(y2, y1, rtol=2e-4, atol=2e-5)
