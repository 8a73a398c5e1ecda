"""Schedule math vs float64 oracles (reference gaussian_diffusion.py:76-113,
373-426, 542-586; osmosis_utils/diffusion.py:31-42)."""

import numpy as np
import pytest

from osmosis_tpu.diffusion import schedules as S


def test_linear_betas_endpoints():
    b = S.linear_betas(1000)
    assert b.dtype == np.float64
    assert b[0] == pytest.approx(1e-4)
    assert b[-1] == pytest.approx(2e-2)
    # scaled variant for T=500
    b500 = S.linear_betas(500)
    assert b500[0] == pytest.approx(2e-4)
    assert b500[-1] == pytest.approx(4e-2)


def test_cosine_betas_bounds():
    b = S.cosine_betas(1000)
    assert (b > 0).all() and (b <= 0.999).all()
    # alpha_bar implied by cosine formula at t=0 is ~1
    ac = np.cumprod(1 - b)
    assert ac[0] > 0.99


def test_schedule_arrays_oracle():
    sch = S.make_schedule("linear", 100)
    betas = S.linear_betas(100)
    alphas = 1 - betas
    ac = np.cumprod(alphas)
    acp = np.append(1.0, ac[:-1])
    np.testing.assert_allclose(sch.alphas_cumprod, ac, rtol=0, atol=0)
    np.testing.assert_allclose(sch.sqrt_recip_alphas_cumprod, np.sqrt(1 / ac))
    np.testing.assert_allclose(sch.sqrt_recipm1_alphas_cumprod, np.sqrt(1 / ac - 1))
    pv = betas * (1 - acp) / (1 - ac)
    np.testing.assert_allclose(sch.posterior_variance, pv)
    np.testing.assert_allclose(
        sch.posterior_log_variance_clipped, np.log(np.append(pv[1], pv[1:]))
    )
    np.testing.assert_allclose(
        sch.posterior_mean_coef1, betas * np.sqrt(acp) / (1 - ac)
    )
    np.testing.assert_allclose(
        sch.posterior_mean_coef2, (1 - acp) * np.sqrt(alphas) / (1 - ac)
    )
    # variance-processor constants
    np.testing.assert_allclose(sch.log_betas, np.log(betas))
    np.testing.assert_allclose(
        sch.fixed_large_log_variance, np.log(np.append(pv[1], betas[1:]))
    )
    # clipped log variance: first two entries equal
    assert sch.posterior_log_variance_clipped[0] == sch.posterior_log_variance_clipped[1]


def test_space_timesteps_ddim():
    # 1000 steps, ddim25 → stride 40
    steps = S.space_timesteps(1000, "ddim25")
    assert steps == set(range(0, 1000, 40))
    with pytest.raises(ValueError):
        S.space_timesteps(1000, "ddim999")


def test_space_timesteps_sections():
    # single int section = evenly strided over whole range, keeping endpoints
    steps = sorted(S.space_timesteps(1000, 250))
    assert len(steps) == 250
    assert steps[0] == 0 and steps[-1] == 999
    # multi-section string
    steps2 = sorted(S.space_timesteps(300, "10,15,20"))
    assert len(steps2) == 45
    assert steps2[0] == 0 and steps2[-1] == 299
    # identity respacing
    assert sorted(S.space_timesteps(100, 100)) == list(range(100))


def test_respace_betas_identity():
    betas = S.linear_betas(50)
    nb, tmap = S.respace_betas(betas, set(range(50)))
    np.testing.assert_allclose(nb, betas, rtol=1e-12)
    np.testing.assert_array_equal(tmap, np.arange(50))


def test_respace_betas_preserves_alphabar():
    """Respaced cumulative alpha at kept steps must equal the original's."""
    betas = S.linear_betas(1000)
    keep = S.space_timesteps(1000, "ddim50")
    nb, tmap = S.respace_betas(betas, keep)
    ac_orig = np.cumprod(1 - betas)
    ac_new = np.cumprod(1 - nb)
    np.testing.assert_allclose(ac_new, ac_orig[tmap], rtol=1e-12)


def test_rescale_timesteps():
    sch = S.make_schedule("linear", 1000, timestep_respacing=100, rescale_timesteps=True)
    ts = sch.model_timesteps()
    assert ts.shape == (100,)
    # rescaled into [0, 1000) range
    assert ts.max() <= 1000.0
    sch2 = S.make_schedule("linear", 1000, timestep_respacing=100)
    # unscaled: raw original indices
    assert sch2.model_timesteps().max() > 900


def test_minimal_prior_schedule_equivalence():
    """The minimal RGBD-prior sampler (osmosis_utils/diffusion.py:31-42) uses
    the same linear betas; its beta_tilde equals posterior_variance."""
    T = 100
    sch = S.make_schedule("linear", T)
    beta = np.linspace(1e-4, 2e-2, T)  # diffusion.py:32-34 (T=1000 constants)
    # reference betas differ for T != 1000 (diffusion.py hardcodes b0,bT);
    # for T=1000 they match make_schedule exactly:
    sch1000 = S.make_schedule("linear", 1000)
    np.testing.assert_allclose(sch1000.betas, np.linspace(1e-4, 2e-2, 1000))
    # beta_tilde[t] = beta[t] * (1-abar[t-1]) / (1-abar[t]) == posterior_variance
    abar = np.cumprod(1 - sch.betas)
    bt = sch.betas[1:] * (1 - abar[:-1]) / (1 - abar[1:])
    np.testing.assert_allclose(sch.posterior_variance[1:], bt)


def test_device_constants_fp32():
    sch = S.make_schedule("cosine", 10)
    consts = sch.device_constants()
    assert all(v.dtype == np.float32 for v in consts.values())
    assert "posterior_mean_coef1" in consts and "model_timesteps" in consts


def test_power_timesteps_basic():
    # gamma=1 reproduces the uniform fractional-stride placement of a
    # single-section count (both are round(linspace(0, T-1, N)))
    T, N = 1000, 100
    uniform = np.round(np.linspace(0.0, 1.0, N) * (T - 1)).astype(int)
    assert S.space_timesteps(T, f"pow{N}@1") == set(uniform.tolist())
    # gamma=2 default: endpoints retained, exactly N steps, denser at low t
    steps = sorted(S.space_timesteps(T, f"pow{N}"))
    assert len(steps) == N
    assert steps[0] == 0 and steps[-1] == T - 1
    gaps = np.diff(steps)
    assert gaps[0] < gaps[-1]  # density concentrated at low noise
    assert (gaps > 0).all()
    # explicit gamma parses
    assert sorted(S.space_timesteps(T, "pow50@3.0"))[-1] == T - 1


def test_power_timesteps_collision_repair():
    # heavy low-t concentration forces rounding collisions near 0; the
    # repair must still return exactly N distinct strictly-increasing steps
    for gamma in (2.0, 4.0, 8.0):
        steps = sorted(S.power_timesteps(100, 60, gamma))
        assert len(steps) == 60
        assert steps[0] >= 0 and steps[-1] == 99
    # gamma<1 concentrates at high t (collisions at the top)
    steps = sorted(S.power_timesteps(100, 60, 0.25))
    assert len(steps) == 60 and steps[-1] == 99 and steps[0] == 0
    # degenerate: take every step
    assert sorted(S.power_timesteps(50, 50, 5.0)) == list(range(50))
    # count=1
    assert S.power_timesteps(1000, 1, 2.0) == {0}


def test_power_timesteps_validation():
    with pytest.raises(ValueError):
        S.power_timesteps(100, 101, 2.0)
    with pytest.raises(ValueError):
        S.power_timesteps(100, 10, 0.0)
    with pytest.raises(ValueError):
        S.power_timesteps(100, 0, 2.0)


def test_power_respacing_end_to_end():
    # the pow DSL flows through make_schedule like any respacing string
    sch = S.make_schedule("linear", 1000, timestep_respacing="pow50@2")
    assert sch.betas.shape == (50,)
    assert sch.timestep_map[-1] == 999 and sch.timestep_map[0] == 0
