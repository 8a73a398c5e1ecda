"""LTSP splitting sampler (arXiv 2301.11558): Lie-Trotter split with a
PLMS4 diffusion substep inside the guided loop.

Pinned properties: the first reverse step is EXACTLY a deterministic
DDIM(eta=0) update plus the first-order guidance displacement (AB1 warmup),
the chain is finite/deterministic, and on the oracle-denoiser recovery
problem a SHORT ltsp chain matches or beats the plain DDPM chain of the
same length (the paper's few-steps claim, measurable here exactly)."""

import jax
import jax.numpy as jnp
import numpy as np

from osmosis_tpu.diffusion import make_schedule
from osmosis_tpu.diffusion.guided import GuidanceConfig, guided_sample_loop
from osmosis_tpu.diffusion.sampler import SamplerConfig
from osmosis_tpu.guidance.operators import get_operator

HW = 12

PATTERN = dict(
    pattern="pcgs", update_start=1.0, update_end=0, global_N=1, local_M=1,
    s_start=1, s_end=0, n_iter=4, start_guidance=1, stop_guidance=0,
)
OP_KW = dict(
    optimizer="sgd", depth_type="original", value="1.4,1.4,1",
    phi_a="1.1,0.95,0.95", phi_a_eta=2e-4,
    phi_b="0.95,0.8,0.8", phi_b_eta=2e-4,
    phi_inf="0.14,0.29,0.49", phi_inf_eta=2e-4,
)


def _model(x, t):
    tb = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
    return jnp.concatenate([0.25 * x + 0.002 * tb, 0.1 * x], axis=-1)


def _gcfg(scale="1,1,1,0.3"):
    return GuidanceConfig.from_config(
        "osmosis",
        dict(loss_function="norm", loss_weight="none",
             weight_function="gamma,1.4,1.4,1", scale=scale,
             gradient_x_prev=True, gradient_clip="True,0.01"),
        PATTERN, None,
    )


def test_ltsp_two_step_chain_matches_manual_replication():
    """Exact pin of the split update: a T=2 ltsp chain (AB1 then AB2
    warmup) must equal an independent re-implementation of
    DDIM(eta=0)-on-eps_eff plus the first-order guidance displacement,
    including the in-scan phi SGD."""
    T = 2
    sch = make_schedule("cosine", T)
    consts = {k: jnp.asarray(v) for k, v in sch.device_constants().items()}
    op = get_operator("underwater_physical_revised", batch_size=1, **OP_KW)
    gcfg = _gcfg()
    rng = np.random.default_rng(0)
    x_start = jnp.asarray(rng.standard_normal((1, HW, HW, 4)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32))

    res = guided_sample_loop(
        _model, sch, x_start, y, jax.random.key(1), op, gcfg,
        SamplerConfig(sampler="ltsp", clip_denoised=True),
        sample_pattern=PATTERN,
    )

    # ---- manual replication -------------------------------------------
    from osmosis_tpu.diffusion.sampler import (
        predict_xstart, process_xstart, split_model_output,
    )
    from osmosis_tpu.guidance.phi_optim import make_phi_optimizer

    scfg = SamplerConfig(sampler="ltsp", clip_denoised=True)
    scale = jnp.asarray([1, 1, 1, 0.3], jnp.float32).reshape(1, 1, 1, 4)
    phi = {k: jnp.asarray(v) for k, v in op.phi_init().items()}
    opt = make_phi_optimizer(op.optimizer, op.etas())
    st = opt.init(phi)

    def loss_f(x0_, p):
        degraded = 2.0 * op.forward(p, x0_) - 1.0
        return jnp.sqrt(jnp.sum((y - degraded) ** 2))

    def gat(name, tb):
        return consts[name][tb].reshape(-1, 1, 1, 1)

    x = x_start
    hist = []
    coeffs = {0: [1.0], 1: [1.5, -0.5]}
    for j, t in enumerate([T - 1, 0]):
        tb = jnp.full((1,), t, jnp.int32)

        def x0_and_v(xp):
            mo = _model(xp, consts["model_timesteps"][tb])
            eps, v = split_model_output(mo, xp.shape[-1])
            return process_xstart(
                predict_xstart(xp, tb, eps, consts, scfg), scfg
            ), v

        (x0h, v), vjp_fn = jax.vjp(x0_and_v, x)
        x0c = jax.lax.stop_gradient(x0h)
        for _ in range(gcfg.n_iter - 1):
            g = jax.grad(lambda p: loss_f(x0c, p))(phi)
            phi, st = opt.update(phi, g, st)
        g_x0 = jax.grad(loss_f, argnums=0)(x0h, phi)
        phi, st = opt.update(phi, jax.grad(loss_f, argnums=1)(x0h, phi), st)
        g_x = vjp_fn((g_x0, jnp.zeros_like(v)))[0]
        guidance = scale * jnp.clip(g_x, -0.01, 0.01)

        eps_t = (
            gat("sqrt_recip_alphas_cumprod", tb) * x - x0h
        ) / gat("sqrt_recipm1_alphas_cumprod", tb)
        hist.insert(0, eps_t)
        cs = coeffs[j]
        eps_eff = sum(c * e for c, e in zip(cs, hist))
        x0_eff = (
            gat("sqrt_recip_alphas_cumprod", tb) * x
            - gat("sqrt_recipm1_alphas_cumprod", tb) * eps_eff
        )
        ab_prev = gat("alphas_cumprod_prev", tb)
        x = (
            jnp.sqrt(ab_prev) * x0_eff + jnp.sqrt(1 - ab_prev) * eps_eff
            - guidance
        )

    np.testing.assert_allclose(
        np.asarray(res.sample), np.asarray(x), rtol=1e-5, atol=1e-5
    )
    for k in phi:
        np.testing.assert_allclose(
            np.asarray(res.phi[k]), np.asarray(phi[k]), rtol=1e-6, atol=1e-7
        )

    # determinism: same inputs -> bit-identical chain
    res2 = guided_sample_loop(
        _model, sch, x_start, y, jax.random.key(1), op, gcfg,
        SamplerConfig(sampler="ltsp", clip_denoised=True),
        sample_pattern=PATTERN,
    )
    np.testing.assert_array_equal(np.asarray(res.sample), np.asarray(res2.sample))


def test_ltsp_oracle_beats_or_matches_ddpm_at_few_steps():
    """Oracle-denoiser phi/x0 recovery at a SHORT respaced chain: the
    splitting sampler must reach at least the plain chain's quality."""
    T_orig, T_kept = 240, 24

    def smooth(key, shape):
        small = jax.random.uniform(key, (4, 4, shape[-1]), minval=-0.8, maxval=0.8)
        return jax.image.resize(small, shape, method="bilinear")

    x0_true = smooth(jax.random.key(0), (HW, HW, 4))[None]
    phi_true = {
        "phi_a": jnp.array([[0.9, 0.7, 0.6]]),
        "phi_b": jnp.array([[0.7, 0.6, 0.5]]),
        "phi_inf": jnp.array([[0.2, 0.35, 0.5]]),
    }
    op = get_operator("underwater_physical_revised", batch_size=1, **OP_KW)
    y = 2.0 * op.forward(phi_true, x0_true) - 1.0

    sch = make_schedule("linear", T_orig, timestep_respacing=f"ddim{T_kept}")
    consts = sch.device_constants()
    sa = jnp.asarray(consts["sqrt_alphas_cumprod"])
    s1m = jnp.asarray(consts["sqrt_one_minus_alphas_cumprod"])
    tmap = jnp.asarray(consts["model_timesteps"])

    def oracle(x, t_float):
        idx = jnp.clip(jnp.searchsorted(tmap, t_float[0]), 0, T_kept - 1)
        eps = (x - sa[idx] * x0_true) / s1m[idx]
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    gcfg = _gcfg(scale="0.5,0.5,0.5,0.5")
    x_init = jax.random.normal(jax.random.key(1), (1, HW, HW, 4))

    def err(res):
        return float(jnp.sqrt(jnp.mean(
            (res.pred_xstart - x0_true) ** 2
        )))

    res_plain = guided_sample_loop(
        oracle, sch, x_init, y, jax.random.key(2), op, gcfg,
        SamplerConfig(clip_denoised=True), sample_pattern=PATTERN,
        deterministic=True,
    )
    res_ltsp = guided_sample_loop(
        oracle, sch, x_init, y, jax.random.key(2), op, gcfg,
        SamplerConfig(sampler="ltsp", clip_denoised=True),
        sample_pattern=PATTERN,
    )
    e_plain, e_ltsp = err(res_plain), err(res_ltsp)
    assert np.isfinite(np.asarray(res_ltsp.sample)).all()
    assert e_ltsp <= e_plain * 1.05, (
        f"ltsp {e_ltsp:.5f} worse than plain {e_plain:.5f} at {T_kept} steps"
    )
    # and the guidance loss still collapses
    sep = np.asarray(res_ltsp.sep_loss)[:, 0]
    assert sep[-1] < 0.5 * sep.max()
