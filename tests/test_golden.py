"""Golden-output regression: fixed seeds + fixed fake model → numerically
pinned sampler outputs (CPU, fp32, highest matmul precision). Catches
accidental math drift during refactors. Regenerate values with
tools in the commit history if a change is intentional."""

import jax
import jax.numpy as jnp
import numpy as np

from osmosis_tpu.diffusion import make_schedule
from osmosis_tpu.diffusion.guided import GuidanceConfig, guided_sample_loop
from osmosis_tpu.diffusion.sampler import SamplerConfig, sample_loop
from osmosis_tpu.guidance.operators import get_operator


def _fake_model(x, t):
    tb = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
    return jnp.concatenate([0.3 * x + 0.001 * tb, 0.1 * x], axis=-1)


def test_prior_loop_golden():
    sch = make_schedule("cosine", 12)
    x0 = jax.random.normal(jax.random.key(11), (1, 8, 8, 4))
    xf, _ = sample_loop(
        _fake_model, sch, x0, jax.random.key(12),
        SamplerConfig(model_var_type="fixed_small"),
    )
    out = np.asarray(xf)
    np.testing.assert_allclose(
        out[0, :2, 0, 0], [-44.514301, -1.741625], rtol=1e-4
    )
    np.testing.assert_allclose(out.sum(), -382.99445, rtol=1e-4)


def test_guided_loop_golden():
    sch = make_schedule("cosine", 12)
    x0 = jax.random.normal(jax.random.key(11), (1, 8, 8, 4))
    y = jax.random.uniform(jax.random.key(13), (1, 8, 8, 3), minval=-1.0)
    op = get_operator(
        "underwater_physical_revised", batch_size=1, optimizer="sgd",
        depth_type="gamma", value="1.4,1.4,1",
        phi_a="1.1,0.95,0.95", phi_b="0.95,0.8,0.8", phi_inf="0.14,0.29,0.49",
        phi_a_eta=1e-4, phi_b_eta=1e-4, phi_inf_eta=1e-4,
    )
    pattern = dict(
        pattern="pcgs", update_start=0.7, update_end=0, global_N=1,
        local_M=1, s_start=1, s_end=0, n_iter=3, start_guidance=1, stop_guidance=0,
    )
    gcfg = GuidanceConfig.from_config(
        "osmosis",
        dict(loss_function="norm", loss_weight="depth",
             weight_function="gamma,1.4,1.4,1", scale="7,7,7,0.9",
             gradient_x_prev=True, gradient_clip="True,0.005"),
        pattern,
        {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    res = guided_sample_loop(
        _fake_model, sch, x0, y, jax.random.key(14), op, gcfg,
        SamplerConfig(clip_denoised=True), sample_pattern=pattern,
    )
    np.testing.assert_allclose(
        np.asarray(res.pred_xstart).sum(), 2.6699185, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.phi["phi_a"])[0],
        [1.0971521, 0.9481073, 0.9508179], rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res.sep_loss)[-1, 0], 23.642508, rtol=1e-4
    )
