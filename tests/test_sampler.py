"""Sampler math vs the reference implementation.

Uses a deterministic fake model implemented identically in torch and jax so
p_mean_variance / DDIM steps can be compared exactly (the PRNG streams are
framework-specific, so full ancestral loops are checked against a numpy
mirror that replays our noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from osmosis_tpu.diffusion import make_schedule
from osmosis_tpu.diffusion import sampler as S
from tests.ref_utils import import_reference


def _import_reference():
    import_reference()
    from guided_diffusion.gaussian_diffusion import create_sampler

    return create_sampler



def _fake_model_torch(x, t):
    import torch

    tb = t.float().reshape(-1, 1, 1, 1)
    return torch.cat([0.3 * x + 0.001 * tb, 0.1 * x], dim=1)


def _fake_model_jax(x, t):
    tb = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
    return jnp.concatenate([0.3 * x + 0.001 * tb, 0.1 * x], axis=-1)


@pytest.mark.parametrize("respacing", [50, 10])
@pytest.mark.parametrize("var_type", ["learned_range", "fixed_small", "fixed_large"])
def test_p_mean_variance_parity(respacing, var_type):
    import torch

    create_sampler = _import_reference()
    ref = create_sampler(
        sampler="ddpm", steps=50, noise_schedule="linear",
        model_mean_type="epsilon", model_var_type=var_type,
        dynamic_threshold=False, clip_denoised=False,
        rescale_timesteps=False, timestep_respacing=respacing,
    )
    sch = make_schedule("linear", 50, timestep_respacing=respacing)
    consts = {k: jnp.asarray(v) for k, v in sch.device_constants().items()}
    cfg = S.SamplerConfig(model_var_type=var_type)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)

    for t in [0, respacing // 2, respacing - 1]:
        tt = torch.tensor([t, t])
        out_ref = ref.p_mean_variance(model=_fake_model_torch, x=torch.from_numpy(x), t=tt)
        out = S.p_mean_variance(
            _fake_model_jax,
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.array([t, t]),
            consts,
            cfg,
        )
        np.testing.assert_allclose(
            np.asarray(out["mean"]).transpose(0, 3, 1, 2),
            out_ref["mean"].numpy(), rtol=2e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["pred_xstart"]).transpose(0, 3, 1, 2),
            out_ref["pred_xstart"].numpy(), rtol=2e-5, atol=1e-5,
        )
        lv_ref = out_ref["log_variance"].numpy()
        lv = np.asarray(out["log_variance"])
        if var_type == "fixed_small" and t == 0:
            assert np.isneginf(lv).all() or lv.min() < -20  # unclipped at t=0
        else:
            np.testing.assert_allclose(
                lv.transpose(0, 3, 1, 2) if lv.ndim == 4 else lv,
                lv_ref, rtol=2e-5, atol=1e-5,
            )


def test_clip_denoised_parity():
    import torch

    create_sampler = _import_reference()
    ref = create_sampler(
        sampler="ddpm", steps=50, noise_schedule="linear",
        model_mean_type="epsilon", model_var_type="learned_range",
        dynamic_threshold=False, clip_denoised=True,
        rescale_timesteps=False, timestep_respacing=50,
    )
    sch = make_schedule("linear", 50)
    consts = {k: jnp.asarray(v) for k, v in sch.device_constants().items()}
    cfg = S.SamplerConfig(clip_denoised=True)
    x = np.random.default_rng(1).standard_normal((1, 4, 8, 8)).astype(np.float32) * 3
    t = 40
    out_ref = ref.p_mean_variance(
        model=_fake_model_torch, x=torch.from_numpy(x), t=torch.tensor([t])
    )
    out = S.p_mean_variance(
        _fake_model_jax, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.array([t]), consts, cfg
    )
    assert np.abs(np.asarray(out["pred_xstart"])).max() <= 1.0
    np.testing.assert_allclose(
        np.asarray(out["mean"]).transpose(0, 3, 1, 2),
        out_ref["mean"].numpy(), rtol=2e-5, atol=1e-5,
    )


def test_ddim_step_parity_eta0():
    import torch

    create_sampler = _import_reference()
    ref = create_sampler(
        sampler="ddim", steps=50, noise_schedule="linear",
        model_mean_type="epsilon", model_var_type="learned_range",
        dynamic_threshold=False, clip_denoised=False,
        rescale_timesteps=False, timestep_respacing="ddim10",
    )
    sch = make_schedule("linear", 50, timestep_respacing="ddim10")
    consts = {k: jnp.asarray(v) for k, v in sch.device_constants().items()}
    cfg = S.SamplerConfig(sampler="ddim", ddim_eta=0.0)

    x = np.random.default_rng(2).standard_normal((1, 4, 8, 8)).astype(np.float32)
    for t in [3, 9]:
        out_ref = ref.p_sample(model=_fake_model_torch, x=torch.from_numpy(x), t=torch.tensor([t]))
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))
        tb = jnp.array([t])
        out = S.p_mean_variance(_fake_model_jax, xj, tb, consts, cfg)
        nxt = S.ddim_step(xj, out, tb, jax.random.key(0), consts, eta=0.0)
        np.testing.assert_allclose(
            np.asarray(nxt).transpose(0, 3, 1, 2),
            out_ref["sample"].numpy(), rtol=2e-5, atol=1e-5,
        )


def test_sample_loop_numpy_mirror():
    """Full DDPM loop replayed in numpy with identical noise draws."""
    T = 20
    sch = make_schedule("cosine", T)
    cfg = S.SamplerConfig(model_var_type="fixed_small")
    key = jax.random.key(42)
    x0 = jax.random.normal(jax.random.key(7), (1, 8, 8, 4))

    x_out, snaps = S.sample_loop(
        _fake_model_jax, sch, x0, key, cfg, record_every=8
    )

    # numpy mirror
    c = sch.device_constants()
    x = np.asarray(x0)
    for t in range(T - 1, -1, -1):
        mo = np.concatenate([0.3 * x + 0.001 * c["model_timesteps"][t], 0.1 * x], -1)
        eps = mo[..., :4]
        xhat = c["sqrt_recip_alphas_cumprod"][t] * x - c["sqrt_recipm1_alphas_cumprod"][t] * eps
        mean = c["posterior_mean_coef1"][t] * xhat + c["posterior_mean_coef2"][t] * x
        z = np.asarray(jax.random.normal(jax.random.fold_in(key, t), x.shape))
        if t > 0:
            x = mean + np.sqrt(c["posterior_variance"][t]) * z
        else:
            x = mean
    np.testing.assert_allclose(np.asarray(x_out), x, rtol=2e-4, atol=2e-4)

    # snapshot steps: every 8 + 0 + T-1, descending
    assert snaps["steps"] == (19, 16, 8, 0)
    assert snaps["x_t"].shape[0] == 4
    # last snapshot (t=0) x_t equals the pre-step x at t=0
    assert np.isfinite(np.asarray(snaps["x0_hat"])).all()


def test_prior_offset_and_window():
    """timestep_offset=+1 and last-N-steps semantics
    (osmosis_utils/diffusion.py:74-96)."""
    T = 10
    sch = make_schedule("cosine", T)
    seen = []

    def spy_model(x, t):
        seen.append(np.asarray(t)[0])
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)

    x0 = jnp.zeros((1, 4, 4, 4))
    # last-N-steps window: runs t_idx = 7,6,5 (fed t_idx+1 to the model)
    x_out, _ = S.sample_loop(
        lambda x, t: jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1),
        sch, x0, jax.random.key(0),
        S.SamplerConfig(model_var_type="fixed_small"),
        timestep_offset=1.0, start_t=8, num_steps=3,
    )
    assert x_out.shape == x0.shape and np.isfinite(np.asarray(x_out)).all()
    # eager offset check
    consts = {k: jnp.asarray(v) for k, v in sch.device_constants().items()}
    out = S.p_mean_variance(
        spy_model, x0, jnp.array([7]), consts,
        S.SamplerConfig(model_var_type="fixed_small"), timestep_offset=1.0,
    )
    assert seen[0] == 8.0


def test_previous_x_and_dynamic_threshold_parity():
    """previous_x mean processor (posterior_mean_variance.py:53-72) and
    dynamic thresholding (util/img_utils.py:9-15) vs the reference."""
    import torch

    create_sampler = _import_reference()
    x = np.random.default_rng(4).standard_normal((1, 4, 8, 8)).astype(np.float32)

    for mean_type, dyn in [("previous_x", False), ("epsilon", True)]:
        ref = create_sampler(
            sampler="ddpm", steps=50, noise_schedule="linear",
            model_mean_type=mean_type, model_var_type="learned_range",
            dynamic_threshold=dyn, clip_denoised=False,
            rescale_timesteps=False, timestep_respacing=50,
        )
        sch = make_schedule("linear", 50)
        consts = {k: jnp.asarray(v) for k, v in sch.device_constants().items()}
        cfg = S.SamplerConfig(model_mean_type=mean_type, dynamic_threshold=dyn)
        t = 25
        out_ref = ref.p_mean_variance(
            model=_fake_model_torch, x=torch.from_numpy(x), t=torch.tensor([t])
        )
        out = S.p_mean_variance(
            _fake_model_jax, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.array([t]), consts, cfg,
        )
        np.testing.assert_allclose(
            np.asarray(out["pred_xstart"]).transpose(0, 3, 1, 2),
            out_ref["pred_xstart"].numpy(), rtol=2e-5, atol=1e-5,
            err_msg=f"{mean_type} dyn={dyn}",
        )
        np.testing.assert_allclose(
            np.asarray(out["mean"]).transpose(0, 3, 1, 2),
            out_ref["mean"].numpy(), rtol=2e-5, atol=1e-5,
        )
