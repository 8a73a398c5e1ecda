"""End-to-end guided-loop parity vs the reference p_sample_loop.

Noise is zeroed on both sides (torch.randn_like patched / deterministic=True)
so the chains are exactly comparable: same fake denoiser, same physics
operator, same pcgs pattern, same phi optimization (inner n_iter loop + joint
backward + SGD step + clipped guidance update). This pins down the entire
condition_methods.py:61-231 + gaussian_diffusion.py:179-340 semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from osmosis_tpu.diffusion import make_schedule
from osmosis_tpu.diffusion.guided import GuidanceConfig, guided_sample_loop
from osmosis_tpu.diffusion.sampler import SamplerConfig
from osmosis_tpu.guidance.operators import get_operator
from tests.ref_utils import import_reference

T_STEPS = 50
HW = 8

PATTERN = dict(
    pattern="pcgs", update_start=0.7, update_end=0, global_N=1, local_M=1,
    s_start=1, s_end=0, n_iter=3, start_guidance=1, stop_guidance=0,
)

COND_PARAMS = dict(
    loss_function="norm",
    loss_weight="depth",
    weight_function="gamma,1.4,1.4,1",
    scale="7,7,7,0.9",
    gradient_x_prev=True,
    gradient_clip="True,0.005",
)

OP_KW = dict(
    optimizer="sgd",
    depth_type="gamma",
    value="1.4,1.4,1",
    phi_a="1.1,0.95,0.95", phi_a_eta=1e-4, phi_a_learn_flag=True,
    phi_b="0.95, 0.8, 0.8", phi_b_eta=1e-4, phi_b_learn_flag=True,
    phi_inf="0.14, 0.29, 0.49", phi_inf_eta=1e-4, phi_inf_learn_flag=True,
)


def _fake_model_torch(x, t):
    import torch

    tb = t.float().reshape(-1, 1, 1, 1)
    return torch.cat([0.3 * x + 0.001 * tb, 0.1 * x], dim=1)


def _fake_model_jax(x, t):
    tb = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
    return jnp.concatenate([0.3 * x + 0.001 * tb, 0.1 * x], axis=-1)


@pytest.fixture()
def no_torch_noise(monkeypatch):
    import torch

    monkeypatch.setattr(torch, "randn_like", lambda x, **k: torch.zeros_like(x))


def _run_reference_osmosis(x0, y):
    import torch
    from guided_diffusion.gaussian_diffusion import create_sampler
    from guided_diffusion.measurements import get_noise, get_operator as ref_get_op
    from guided_diffusion.condition_methods import get_conditioning_method

    sampler = create_sampler(
        sampler="ddpm", steps=T_STEPS, noise_schedule="linear",
        model_mean_type="epsilon", model_var_type="learned_range",
        dynamic_threshold=False, clip_denoised=True, rescale_timesteps=False,
        timestep_respacing="",
    )
    operator = ref_get_op(
        name="underwater_physical_revised", device=torch.device("cpu"),
        batch_size=1, **OP_KW,
    )
    noiser = get_noise(name="clean")
    cond = get_conditioning_method(
        "osmosis", operator, noiser, **COND_PARAMS, **PATTERN,
        aux_loss={"avrg_loss": 0.5, "val_loss": 20.0},
    )
    x_start = torch.from_numpy(x0.transpose(0, 3, 1, 2)).clone().requires_grad_()
    img, variable_dict, loss, pred_xstart = sampler.p_sample_loop(
        model=_fake_model_torch, x_start=x_start,
        measurement=torch.from_numpy(y.transpose(0, 3, 1, 2)),
        measurement_cond_fn=cond.conditioning,
        record=False, save_root=None, pretrain_model="osmosis",
        rgb_guidance=False, sample_pattern=PATTERN,
    )
    return (
        img.detach().numpy(), pred_xstart.numpy(),
        {k: v.numpy() for k, v in variable_dict.items()}, np.asarray(loss),
    )


def test_osmosis_guided_loop_parity(no_torch_noise):
    import_reference()
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, HW, HW, 4)).astype(np.float32)
    y = rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32)

    ref_img, ref_x0hat, ref_phi, ref_loss = _run_reference_osmosis(x0, y)

    sch = make_schedule("linear", T_STEPS)
    op = get_operator("underwater_physical_revised", batch_size=1, **OP_KW)
    gcfg = GuidanceConfig.from_config(
        "osmosis", COND_PARAMS, PATTERN,
        {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    res = guided_sample_loop(
        _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
        jax.random.key(0), op, gcfg, SamplerConfig(clip_denoised=True),
        sample_pattern=PATTERN, deterministic=True,
    )

    np.testing.assert_allclose(
        np.asarray(res.pred_xstart).transpose(0, 3, 1, 2), ref_x0hat,
        rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res.sample).transpose(0, 3, 1, 2), ref_img,
        rtol=1e-3, atol=2e-4,
    )
    for k in ("phi_a", "phi_b", "phi_inf"):
        np.testing.assert_allclose(
            np.asarray(res.phi[k]), ref_phi[k].reshape(1, 3), rtol=1e-4, atol=1e-5,
        )
    # final-step per-image loss
    np.testing.assert_allclose(
        np.asarray(res.sep_loss)[-1], ref_loss, rtol=1e-3, atol=1e-4
    )
    # phi actually moved from its init
    assert np.abs(np.asarray(res.phi["phi_a"]) - np.array([1.1, 0.95, 0.95])).max() > 1e-6


def test_ps_rgb_guidance_loop_parity(no_torch_noise):
    import_reference()
    import torch
    from guided_diffusion.gaussian_diffusion import create_sampler
    from guided_diffusion.measurements import get_noise, get_operator as ref_get_op
    from guided_diffusion.condition_methods import get_conditioning_method

    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((1, HW, HW, 4)).astype(np.float32)
    y = rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32)

    sampler = create_sampler(
        sampler="ddpm", steps=T_STEPS, noise_schedule="linear",
        model_mean_type="epsilon", model_var_type="learned_range",
        dynamic_threshold=False, clip_denoised=True, rescale_timesteps=False,
        timestep_respacing="",
    )
    operator = ref_get_op(name="rgb_guidance", device=torch.device("cpu"), batch_size=1)
    noiser = get_noise(name="gaussian", sigma=0)
    cond = get_conditioning_method("ps", operator, noiser, scale="3,3,3,0.1")
    x_start = torch.from_numpy(x0.transpose(0, 3, 1, 2)).clone().requires_grad_()
    ref_img = sampler.p_sample_loop(
        model=_fake_model_torch, x_start=x_start,
        measurement=torch.from_numpy(y.transpose(0, 3, 1, 2)),
        measurement_cond_fn=cond.conditioning,
        record=False, save_root=None, pretrain_model="osmosis",
        rgb_guidance=True, sample_pattern=PATTERN,
    ).detach().numpy()

    sch = make_schedule("linear", T_STEPS)
    op = get_operator("rgb_guidance", batch_size=1)
    gcfg = GuidanceConfig.from_config(
        "ps", dict(scale="3,3,3,0.1", gradient_x_prev=True), PATTERN, None
    )
    res = guided_sample_loop(
        _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
        jax.random.key(0), op, gcfg, SamplerConfig(clip_denoised=True),
        sample_pattern=PATTERN, deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(res.sample).transpose(0, 3, 1, 2), ref_img, rtol=1e-3, atol=2e-4
    )


def test_global_n_phi_persistence_parity(no_torch_noise):
    """global_N > 1 (GibbsDDRM restarts): phi and its optimizer state must
    warm-start each global iteration — the reference creates the operator
    outside the global loop (osmosis_sampling.py:146-163 vs :191), so the
    second p_sample_loop call continues from the optimized phi."""
    import_reference()
    import torch
    from guided_diffusion.gaussian_diffusion import create_sampler
    from guided_diffusion.measurements import get_noise, get_operator as ref_get_op
    from guided_diffusion.condition_methods import get_conditioning_method

    rng = np.random.default_rng(7)
    x0 = rng.standard_normal((1, HW, HW, 4)).astype(np.float32)
    y = rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32)

    sampler = create_sampler(
        sampler="ddpm", steps=T_STEPS, noise_schedule="linear",
        model_mean_type="epsilon", model_var_type="learned_range",
        dynamic_threshold=False, clip_denoised=True, rescale_timesteps=False,
        timestep_respacing="",
    )
    operator = ref_get_op(
        name="underwater_physical_revised", device=torch.device("cpu"),
        batch_size=1, **OP_KW,
    )
    noiser = get_noise(name="clean")
    cond = get_conditioning_method(
        "osmosis", operator, noiser, **COND_PARAMS, **PATTERN,
        aux_loss={"avrg_loss": 0.5, "val_loss": 20.0},
    )
    ref_phi_per_iter = []
    ref_img = None
    for global_ii in range(2):  # operator NOT re-created → phi persists
        x_start = torch.from_numpy(x0.transpose(0, 3, 1, 2)).clone().requires_grad_()
        ref_img, variable_dict, _, _ = sampler.p_sample_loop(
            model=_fake_model_torch, x_start=x_start,
            measurement=torch.from_numpy(y.transpose(0, 3, 1, 2)),
            measurement_cond_fn=cond.conditioning,
            record=False, save_root=None, pretrain_model="osmosis",
            rgb_guidance=False, sample_pattern=PATTERN,
            global_iteration=global_ii,
        )
        ref_phi_per_iter.append({k: v.numpy().copy() for k, v in variable_dict.items()})

    sch = make_schedule("linear", T_STEPS)
    op = get_operator("underwater_physical_revised", batch_size=1, **OP_KW)
    gcfg = GuidanceConfig.from_config(
        "osmosis", COND_PARAMS, PATTERN,
        {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    phi_carry, opt_carry = None, None
    phis = []
    res = None
    for global_ii in range(2):
        res = guided_sample_loop(
            _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
            jax.random.key(0), op, gcfg, SamplerConfig(clip_denoised=True),
            sample_pattern=PATTERN, deterministic=True,
            phi_init=phi_carry, opt_state_init=opt_carry,
        )
        phi_carry, opt_carry = res.phi, res.opt_state
        phis.append({k: np.asarray(v) for k, v in res.phi.items()})

    # warm start must actually change the trajectory
    assert np.abs(phis[1]["phi_a"] - phis[0]["phi_a"]).max() > 1e-7
    for it in range(2):
        for k in ("phi_a", "phi_b", "phi_inf"):
            np.testing.assert_allclose(
                phis[it][k], ref_phi_per_iter[it][k].reshape(1, 3),
                rtol=1e-4, atol=1e-5, err_msg=f"iter {it} {k}",
            )
    np.testing.assert_allclose(
        np.asarray(res.sample).transpose(0, 3, 1, 2), ref_img.detach().numpy(),
        rtol=1e-3, atol=2e-4,
    )


def test_ps_poisson_branch_parity(no_torch_noise):
    """'ps' with a poisson noiser uses loss = mean(‖y − A(x0)‖ / |y|) over the
    FULL x0 (condition_methods.py:43-48). Measurement is 4-channel here since
    the reference's poisson branch does not slice RGB."""
    import_reference()
    import torch
    from guided_diffusion.gaussian_diffusion import create_sampler
    from guided_diffusion.measurements import get_noise, get_operator as ref_get_op
    from guided_diffusion.condition_methods import get_conditioning_method

    rng = np.random.default_rng(11)
    x0 = rng.standard_normal((1, HW, HW, 4)).astype(np.float32)
    y = rng.uniform(0.2, 1, (1, HW, HW, 4)).astype(np.float32)  # nonzero |y|

    sampler = create_sampler(
        sampler="ddpm", steps=T_STEPS, noise_schedule="linear",
        model_mean_type="epsilon", model_var_type="learned_range",
        dynamic_threshold=False, clip_denoised=True, rescale_timesteps=False,
        timestep_respacing="",
    )
    operator = ref_get_op(name="rgb_guidance", device=torch.device("cpu"), batch_size=1)
    noiser = get_noise(name="poisson", rate=1.0)
    cond = get_conditioning_method("ps", operator, noiser, scale="0.3")
    x_start = torch.from_numpy(x0.transpose(0, 3, 1, 2)).clone().requires_grad_()
    ref_img = sampler.p_sample_loop(
        model=_fake_model_torch, x_start=x_start,
        measurement=torch.from_numpy(y.transpose(0, 3, 1, 2)),
        measurement_cond_fn=cond.conditioning,
        record=False, save_root=None, pretrain_model="osmosis",
        rgb_guidance=True, sample_pattern=PATTERN,
    ).detach().numpy()

    sch = make_schedule("linear", T_STEPS)
    op = get_operator("rgb_guidance", batch_size=1)
    gcfg = GuidanceConfig.from_config(
        "ps", dict(scale="0.3", gradient_x_prev=True), PATTERN, None,
        noiser_name="poisson",
    )
    res = guided_sample_loop(
        _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
        jax.random.key(0), op, gcfg, SamplerConfig(clip_denoised=True),
        sample_pattern=PATTERN, deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(res.sample).transpose(0, 3, 1, 2), ref_img, rtol=1e-3, atol=2e-4
    )


def test_guided_loop_stochastic_shapes_and_telemetry():
    """Non-deterministic run: shapes, finiteness, snapshot recording."""
    sch = make_schedule("linear", T_STEPS)
    op = get_operator("underwater_physical_revised", batch_size=2, **OP_KW)
    gcfg = GuidanceConfig.from_config(
        "osmosis", COND_PARAMS, PATTERN,
        {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    rng = np.random.default_rng(2)
    x0 = rng.standard_normal((2, HW, HW, 4)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, HW, HW, 3)).astype(np.float32)
    res = guided_sample_loop(
        _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
        jax.random.key(3), op, gcfg, SamplerConfig(clip_denoised=True),
        sample_pattern=PATTERN, record_every=20,
    )
    assert res.sample.shape == (2, HW, HW, 4)
    assert np.isfinite(np.asarray(res.sample)).all()
    assert res.sep_loss.shape == (T_STEPS, 2)
    assert res.phi_trace["phi_a"].shape == (T_STEPS, 2, 3)
    assert res.aux_trace["avrg_loss"].shape == (T_STEPS,)
    # snapshots: steps 40, 20, 0 plus T-1=49
    assert res.snapshots["steps"] == (49, 40, 20, 0)
    assert np.isfinite(np.asarray(res.snapshots["x0_hat"])).all()


def test_phi_warmup_burst():
    """phi_warmup_iters (extension, default off): a one-off burst of
    phi-only iterations at the unfreeze boundary. Off (or absent) must be
    bit-identical to the baseline graph; on must move phi further at the
    boundary step and leave every frozen step untouched."""
    sch = make_schedule("linear", T_STEPS)
    op = get_operator("underwater_physical_revised", batch_size=1, **OP_KW)
    rng = np.random.default_rng(7)
    x0 = rng.standard_normal((1, HW, HW, 4)).astype(np.float32)
    y = rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32)

    def run(pattern):
        gcfg = GuidanceConfig.from_config(
            "osmosis", COND_PARAMS, pattern,
            {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
        )
        return guided_sample_loop(
            _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
            jax.random.key(11), op, gcfg, SamplerConfig(clip_denoised=True),
            sample_pattern=pattern, deterministic=True,
        )

    base = run(PATTERN)
    zero = run({**PATTERN, "phi_warmup_iters": 0})
    warm = run({**PATTERN, "phi_warmup_iters": 40})

    # explicit 0 == absent, bitwise
    np.testing.assert_array_equal(np.asarray(base.sample), np.asarray(zero.sample))
    for k in base.phi:
        np.testing.assert_array_equal(np.asarray(base.phi[k]), np.asarray(zero.phi[k]))

    # the burst fires at the first unfrozen step: phi after that step must
    # differ from the baseline's, and the chains diverge from there on
    t_boundary = int(PATTERN["update_start"] * T_STEPS)  # frozen iff t > this
    row = T_STEPS - 1 - t_boundary
    pa_base = np.asarray(base.phi_trace["phi_a"])[:, 0, :]
    pa_warm = np.asarray(warm.phi_trace["phi_a"])[:, 0, :]
    np.testing.assert_array_equal(pa_base[:row], pa_warm[:row])  # frozen prefix
    assert np.abs(pa_warm[row] - pa_base[row]).max() > 1e-7
    # warmup descends the same physics loss -> finite, sane outputs
    assert np.isfinite(np.asarray(warm.sample)).all()
    for k in warm.phi:
        assert np.isfinite(np.asarray(warm.phi[k])).all()


def test_guidance_and_freeze_windows():
    """Pattern with start/stop guidance windows exercises the lax.cond
    plain/guided branches; phi must only move inside the update window."""
    pattern = dict(
        pattern="pcgs", update_start=0.5, update_end=0.2, global_N=1, local_M=1,
        s_start=1, s_end=0, n_iter=2, start_guidance=0.8, stop_guidance=0.1,
    )
    sch = make_schedule("linear", T_STEPS)
    op = get_operator("underwater_physical_revised", batch_size=1, **OP_KW)
    gcfg = GuidanceConfig.from_config(
        "osmosis", COND_PARAMS, pattern,
        {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    rng = np.random.default_rng(5)
    x0 = rng.standard_normal((1, HW, HW, 4)).astype(np.float32)
    y = rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32)
    res = guided_sample_loop(
        _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
        jax.random.key(6), op, gcfg, SamplerConfig(clip_denoised=True),
        sample_pattern=pattern,
    )
    # trace rows are emitted in scan order: row r corresponds to t = T-1-r
    phi_a = np.asarray(res.phi_trace["phi_a"])[:, 0, :]  # [T, 3]
    init = np.array([1.1, 0.95, 0.95], np.float32)
    t_of_row = lambda r: T_STEPS - 1 - r
    for r in range(T_STEPS):
        t = t_of_row(r)
        if t > 0.5 * T_STEPS or t < 0.2 * T_STEPS:
            prev = init if r == 0 else phi_a[r - 1]
            np.testing.assert_allclose(phi_a[r], prev, atol=0,
                                       err_msg=f"phi moved at frozen t={t}")
    # inside the update window it must have moved
    assert np.abs(phi_a[-1] - init).max() > 1e-7
    # unguided steps log zero loss
    sep = np.asarray(res.sep_loss)[:, 0]
    for r in range(T_STEPS):
        t = t_of_row(r)
        if t > 0.8 * T_STEPS or t < 0.1 * T_STEPS:
            assert sep[r] == 0.0, f"loss nonzero at unguided t={t}"
        else:
            assert sep[r] > 0.0, f"loss zero at guided t={t}"


# ---------------------------------------------------------------------------
# gradient_x_prev=False — the x0-gradient guidance mode
# ---------------------------------------------------------------------------

# scale 2 keeps the chain out of the chaotic regime: the x0-gradient mode
# never clips its gradient, and at the presets' scale 7 the synthetic chain
# amplifies a 1e-6 input perturbation to 5e-2 final diff IN PURE TORCH
# (measured), so endpoint comparisons there bound nothing. At scale 2 the
# torch chaos floor is 2e-4 and the cross-framework diff measures 3.5e-5.
X0_COND_PARAMS = dict(COND_PARAMS, gradient_x_prev=False, scale="2,2,2,0.5")


def test_reference_x0_grad_mode_is_broken(no_torch_noise):
    """The reference's gradient_x_prev=False branch CRASHES on every path:
    conditioning forces x_prev.requires_grad_(False)
    (condition_methods.py:156) and then every final backward passes x_prev
    as an input (condition_methods.py:185-191); torch's
    backward(inputs=...) retain_grad()s each input, which raises on a
    requires_grad=False tensor — and the x_0_hat.grad the update reads
    (condition_methods.py:229) is never populated on any path. Pinned here
    so the intended-semantics parity below is justified (there is no
    working reference chain to compare against)."""
    import_reference()
    import torch
    from guided_diffusion.measurements import get_noise, get_operator as ref_get_op
    from guided_diffusion.condition_methods import get_conditioning_method

    operator = ref_get_op(
        name="underwater_physical_revised", device=torch.device("cpu"),
        batch_size=1, **OP_KW,
    )
    cond = get_conditioning_method(
        "osmosis", operator, get_noise(name="clean"),
        **X0_COND_PARAMS, **PATTERN,
        aux_loss={"avrg_loss": 0.5, "val_loss": 20.0},
    )
    rng = np.random.default_rng(3)
    mk = lambda c: torch.from_numpy(
        rng.standard_normal((1, c, HW, HW)).astype(np.float32))
    for freeze in (False, True):
        with pytest.raises(RuntimeError):
            cond.conditioning(
                x_prev=mk(4), x_t=mk(4), x_0_hat=mk(4), measurement=mk(3),
                freeze_phi=freeze, time_index=0.5,
            )


def _run_reference_osmosis_x0grad_intended(x0, y):
    """The documented INTENT of gradient_x_prev=False ("the gradient of the
    forward degradation is according x_0_pred",
    configs/osmosis_sample_config.yaml:94) with the broken autograd plumbing
    fixed — reusing the reference's own loss / physics / phi-optimizer code
    verbatim, inside the reference's own p_sample_loop. The only changes vs
    condition_methods.py:146-231: gradients are accumulated into x_0_hat
    instead of the grad-disabled x_prev, and the update applies
    x_0_hat.grad (never clipped, matching :227-229)."""
    import torch
    from guided_diffusion.gaussian_diffusion import create_sampler
    from guided_diffusion.measurements import get_noise, get_operator as ref_get_op
    from guided_diffusion.condition_methods import (
        PosteriorSamplingOsmosis,
    )

    class FixedX0Grad(PosteriorSamplingOsmosis):
        def conditioning(self, x_prev, x_t, x_0_hat, measurement, **kwargs):
            freeze_phi = kwargs.get("freeze_phi", False)
            time_index = kwargs.get("time_index", None)
            x_0_hat = x_0_hat.detach().requires_grad_(True)
            self.operator.set_variable_gradients(value=not freeze_phi)
            inner = 1 if freeze_phi else self.n_iter
            aux_loss_dict = None
            for ii in range(inner):
                sep_loss, loss, _ = self.grad_and_value(
                    x_prev=x_prev, x_0_hat=x_0_hat, measurement=measurement,
                    time_index=time_index)
                if self.aux_loss is not None:
                    aux_total, aux_loss_dict = self.aux_loss.forward(x_0_hat)
                    total_loss = loss + aux_total
                else:
                    total_loss = loss
                if ii == inner - 1:
                    inputs = [x_0_hat]
                    if not freeze_phi:
                        inputs += self.operator.get_variable_list()
                    total_loss.backward(inputs=inputs)
                else:
                    total_loss.backward(inputs=self.operator.get_variable_list())
                variables_dict = self.operator.optimize(freeze_phi=freeze_phi)
            with torch.no_grad():
                guidance_scale = self.scale[None, ..., None, None]
                x_t -= guidance_scale * x_0_hat.grad
            return x_t, sep_loss, variables_dict, x_0_hat.grad.cpu(), aux_loss_dict

    sampler = create_sampler(
        sampler="ddpm", steps=T_STEPS, noise_schedule="linear",
        model_mean_type="epsilon", model_var_type="learned_range",
        dynamic_threshold=False, clip_denoised=True, rescale_timesteps=False,
        timestep_respacing="",
    )
    operator = ref_get_op(
        name="underwater_physical_revised", device=torch.device("cpu"),
        batch_size=1, **OP_KW,
    )
    cond = FixedX0Grad(
        operator, get_noise(name="clean"), **X0_COND_PARAMS, **PATTERN,
        aux_loss={"avrg_loss": 0.5, "val_loss": 20.0},
    )
    x_start = torch.from_numpy(x0.transpose(0, 3, 1, 2)).clone().requires_grad_()
    img, variable_dict, loss, pred_xstart = sampler.p_sample_loop(
        model=_fake_model_torch, x_start=x_start,
        measurement=torch.from_numpy(y.transpose(0, 3, 1, 2)),
        measurement_cond_fn=cond.conditioning,
        record=False, save_root=None, pretrain_model="osmosis",
        rgb_guidance=False, sample_pattern=PATTERN,
    )
    return (
        img.detach().numpy(), pred_xstart.numpy(),
        {k: v.numpy() for k, v in variable_dict.items()}, np.asarray(loss),
    )


def test_osmosis_x0_grad_loop_parity(no_torch_noise):
    """Full-chain exactness of the x0-gradient mode (guided.py:396-398:
    g_used = g_x0, unclipped) against the intended-semantics torch run."""
    import_reference()
    rng = np.random.default_rng(21)
    x0 = rng.standard_normal((1, HW, HW, 4)).astype(np.float32)
    y = rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32)

    ref_img, ref_x0hat, ref_phi, ref_loss = \
        _run_reference_osmosis_x0grad_intended(x0, y)

    sch = make_schedule("linear", T_STEPS)
    op = get_operator("underwater_physical_revised", batch_size=1, **OP_KW)
    gcfg = GuidanceConfig.from_config(
        "osmosis", X0_COND_PARAMS, PATTERN,
        {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    res = guided_sample_loop(
        _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
        jax.random.key(0), op, gcfg, SamplerConfig(clip_denoised=True),
        sample_pattern=PATTERN, deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(res.pred_xstart).transpose(0, 3, 1, 2), ref_x0hat,
        rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res.sample).transpose(0, 3, 1, 2), ref_img,
        rtol=1e-3, atol=2e-4,
    )
    for k in ("phi_a", "phi_b", "phi_inf"):
        np.testing.assert_allclose(
            np.asarray(res.phi[k]), ref_phi[k].reshape(1, 3),
            rtol=1e-4, atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(res.sep_loss)[-1], ref_loss, rtol=1e-3, atol=1e-4
    )
    # phi moved, and the guidance direction actually differs from the
    # x_prev-gradient mode (the two modes must not silently alias)
    assert np.abs(np.asarray(res.phi["phi_a"]) - np.array([1.1, 0.95, 0.95])).max() > 1e-6
    gcfg_full = GuidanceConfig.from_config(
        "osmosis", COND_PARAMS, PATTERN,
        {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    res_full = guided_sample_loop(
        _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
        jax.random.key(0), op, gcfg_full, SamplerConfig(clip_denoised=True),
        sample_pattern=PATTERN, deterministic=True,
    )
    assert np.abs(np.asarray(res.sample) - np.asarray(res_full.sample)).max() > 1e-6


# ---------------------------------------------------------------------------
# x_prev_every=k — the hybrid gradient schedule (framework extension)
# ---------------------------------------------------------------------------

def _run_reference_osmosis_hybrid_intended(x0, y, k, cond_params):
    """Intended semantics of the hybrid schedule expressed in the reference's
    own code: full x_prev-gradient conditioning (the stock, working
    PosteriorSamplingOsmosis path) on chain steps s % k == 0 and the fixed
    x0-gradient conditioning (see _run_reference_osmosis_x0grad_intended) on
    the rest. s is recovered exactly from the loop's
    time_index = idx / num_timesteps (gaussian_diffusion.py:259) with idx
    descending T-1..0 (gaussian_diffusion.py:210-215), so s = (T-1) - idx —
    the same phase the jax block scan uses (guided.py hybrid section)."""
    import torch
    from guided_diffusion.gaussian_diffusion import create_sampler
    from guided_diffusion.measurements import get_noise, get_operator as ref_get_op
    from guided_diffusion.condition_methods import PosteriorSamplingOsmosis

    class HybridGrad(PosteriorSamplingOsmosis):
        def conditioning(self, x_prev, x_t, x_0_hat, measurement, **kwargs):
            idx = int(round(kwargs["time_index"] * T_STEPS))
            s = (T_STEPS - 1) - idx
            if s % k == 0:
                return super().conditioning(
                    x_prev=x_prev, x_t=x_t, x_0_hat=x_0_hat,
                    measurement=measurement, **kwargs)
            # ---- x0-gradient substep (same plumbing as FixedX0Grad) ----
            freeze_phi = kwargs.get("freeze_phi", False)
            time_index = kwargs.get("time_index", None)
            x_0_hat = x_0_hat.detach().requires_grad_(True)
            self.operator.set_variable_gradients(value=not freeze_phi)
            inner = 1 if freeze_phi else self.n_iter
            aux_loss_dict = None
            for ii in range(inner):
                sep_loss, loss, _ = self.grad_and_value(
                    x_prev=x_prev, x_0_hat=x_0_hat, measurement=measurement,
                    time_index=time_index)
                if self.aux_loss is not None:
                    aux_total, aux_loss_dict = self.aux_loss.forward(x_0_hat)
                    total_loss = loss + aux_total
                else:
                    total_loss = loss
                if ii == inner - 1:
                    inputs = [x_0_hat]
                    if not freeze_phi:
                        inputs += self.operator.get_variable_list()
                    total_loss.backward(inputs=inputs)
                else:
                    total_loss.backward(inputs=self.operator.get_variable_list())
                variables_dict = self.operator.optimize(freeze_phi=freeze_phi)
            with torch.no_grad():
                guidance_scale = self.scale[None, ..., None, None]
                x_t -= guidance_scale * x_0_hat.grad
            return x_t, sep_loss, variables_dict, x_0_hat.grad.cpu(), aux_loss_dict

    sampler = create_sampler(
        sampler="ddpm", steps=T_STEPS, noise_schedule="linear",
        model_mean_type="epsilon", model_var_type="learned_range",
        dynamic_threshold=False, clip_denoised=True, rescale_timesteps=False,
        timestep_respacing="",
    )
    operator = ref_get_op(
        name="underwater_physical_revised", device=torch.device("cpu"),
        batch_size=1, **OP_KW,
    )
    cond = HybridGrad(
        operator, get_noise(name="clean"), **cond_params, **PATTERN,
        aux_loss={"avrg_loss": 0.5, "val_loss": 20.0},
    )
    x_start = torch.from_numpy(x0.transpose(0, 3, 1, 2)).clone().requires_grad_()
    img, variable_dict, loss, pred_xstart = sampler.p_sample_loop(
        model=_fake_model_torch, x_start=x_start,
        measurement=torch.from_numpy(y.transpose(0, 3, 1, 2)),
        measurement_cond_fn=cond.conditioning,
        record=False, save_root=None, pretrain_model="osmosis",
        rgb_guidance=False, sample_pattern=PATTERN,
    )
    return (
        img.detach().numpy(), pred_xstart.numpy(),
        {k_: v.numpy() for k_, v in variable_dict.items()}, np.asarray(loss),
    )


# k=2 divides T_STEPS=50 (pure block scan); k=3 leaves a remainder of 2,
# exercising the python-unrolled epilogue block
@pytest.mark.parametrize("k", [2, 3])
def test_osmosis_hybrid_grad_loop_parity(no_torch_noise, k):
    """Full-chain exactness of x_prev_every=k against an intended-semantics
    torch run that switches gradient mode per chain step inside the
    reference's own p_sample_loop. Scale kept small for the same chaos-floor
    reason as the x0 test (torch's unclipped x0 substeps amplify
    perturbations at preset-scale 7)."""
    import_reference()
    cond_params = dict(COND_PARAMS, scale="2,2,2,0.5", x_prev_every=k)
    rng = np.random.default_rng(17 + k)
    x0 = rng.standard_normal((1, HW, HW, 4)).astype(np.float32)
    y = rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32)

    ref_img, ref_x0hat, ref_phi, ref_loss = \
        _run_reference_osmosis_hybrid_intended(x0, y, k, cond_params)

    sch = make_schedule("linear", T_STEPS)
    op = get_operator("underwater_physical_revised", batch_size=1, **OP_KW)
    gcfg = GuidanceConfig.from_config(
        "osmosis", cond_params, PATTERN,
        {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    assert gcfg.x_prev_every == k
    res = guided_sample_loop(
        _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
        jax.random.key(0), op, gcfg, SamplerConfig(clip_denoised=True),
        sample_pattern=PATTERN, deterministic=True,
    )
    # trace outputs keep the flat [T, ...] contract across the block reshape
    assert np.asarray(res.sep_loss).shape == (T_STEPS, 1)
    np.testing.assert_allclose(
        np.asarray(res.pred_xstart).transpose(0, 3, 1, 2), ref_x0hat,
        rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res.sample).transpose(0, 3, 1, 2), ref_img,
        rtol=1e-3, atol=2e-4,
    )
    for key in ("phi_a", "phi_b", "phi_inf"):
        np.testing.assert_allclose(
            np.asarray(res.phi[key]), ref_phi[key].reshape(1, 3),
            rtol=1e-4, atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(res.sep_loss)[-1], ref_loss, rtol=1e-3, atol=1e-4
    )
    # the hybrid chain must not silently alias either pure mode
    for pure in (
        dict(cond_params, x_prev_every=1),
        dict(cond_params, x_prev_every=1, gradient_x_prev=False),
    ):
        gp = GuidanceConfig.from_config(
            "osmosis", pure, PATTERN,
            {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
        )
        rp = guided_sample_loop(
            _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
            jax.random.key(0), op, gp, SamplerConfig(clip_denoised=True),
            sample_pattern=PATTERN, deterministic=True,
        )
        assert np.abs(np.asarray(res.sample) - np.asarray(rp.sample)).max() > 1e-6


def test_hybrid_grad_misconfig_raises():
    sch = make_schedule("linear", T_STEPS)
    op = get_operator("underwater_physical_revised", batch_size=1, **OP_KW)
    x = jnp.zeros((1, HW, HW, 4))
    y = jnp.zeros((1, HW, HW, 3))

    def run(params):
        gcfg = GuidanceConfig.from_config("osmosis", params, PATTERN, None)
        return guided_sample_loop(
            _fake_model_jax, sch, x, y, jax.random.key(0), op, gcfg,
            SamplerConfig(), sample_pattern=PATTERN, deterministic=True,
        )

    # x0 mode + schedule is contradictory
    with pytest.raises(ValueError, match="gradient_x_prev"):
        run(dict(COND_PARAMS, gradient_x_prev=False, x_prev_every=2))
    # period >= chain length leaves no full-gradient cadence to schedule
    with pytest.raises(ValueError, match="chain length"):
        run(dict(COND_PARAMS, x_prev_every=T_STEPS))


def _run_reference_ps_hybrid_intended(x0, y, k, scale):
    """Intended semantics of x_prev_every=k on the 'ps' DPS path, expressed
    in the reference's own p_sample_loop: the stock PosteriorSampling update
    (grad wrt x_prev, condition_methods.py:40,246-251) on chain steps
    s % k == 0, and the x0-hat gradient variant the reference itself carries
    as a commented-out line (condition_methods.py:41) on the rest. The rgb
    branch passes no time_index (gaussian_diffusion.py:300-306), so the
    chain step is recovered with a per-call counter (local_M == 1 → exactly
    one conditioning call per step)."""
    import torch
    from guided_diffusion.gaussian_diffusion import create_sampler
    from guided_diffusion.measurements import get_noise, get_operator as ref_get_op
    from guided_diffusion.condition_methods import PosteriorSampling

    class HybridPS(PosteriorSampling):
        _s = 0

        def conditioning(self, x_prev, x_t, x_0_hat, measurement, **kwargs):
            s, HybridPS._s = HybridPS._s, HybridPS._s + 1
            if s % k == 0:
                return super().conditioning(
                    x_prev=x_prev, x_t=x_t, x_0_hat=x_0_hat,
                    measurement=measurement, **kwargs)
            difference = measurement - self.operator.forward(x_0_hat[:, 0:3])
            loss = torch.linalg.norm(difference)
            g = torch.autograd.grad(outputs=loss, inputs=x_0_hat)[0]
            x_t = x_t - g * self.scale[None, ..., None, None]
            return x_t, loss

    sampler = create_sampler(
        sampler="ddpm", steps=T_STEPS, noise_schedule="linear",
        model_mean_type="epsilon", model_var_type="learned_range",
        dynamic_threshold=False, clip_denoised=True, rescale_timesteps=False,
        timestep_respacing="",
    )
    operator = ref_get_op(
        name="rgb_guidance", device=torch.device("cpu"), batch_size=1)
    cond = HybridPS(operator, get_noise(name="gaussian", sigma=0), scale=scale)
    x_start = torch.from_numpy(x0.transpose(0, 3, 1, 2)).clone().requires_grad_()
    img = sampler.p_sample_loop(
        model=_fake_model_torch, x_start=x_start,
        measurement=torch.from_numpy(y.transpose(0, 3, 1, 2)),
        measurement_cond_fn=cond.conditioning,
        record=False, save_root=None, pretrain_model="osmosis",
        rgb_guidance=True, sample_pattern=PATTERN,
    ).detach().numpy()
    assert HybridPS._s == T_STEPS  # one conditioning call per chain step
    return img


# k=2 divides T_STEPS=50; k=3 exercises the epilogue remainder block
@pytest.mark.parametrize("k", [2, 3])
def test_ps_hybrid_grad_loop_parity(no_torch_noise, k):
    """x_prev_every=k on the 'ps' conditioner: full-chain exactness against
    an intended-semantics torch run, plus non-aliasing vs pure ps. No
    gradient_x_prev flag is required — ps always differentiates wrt x_prev
    in the reference, so the knob alone sets the hybrid cadence. Scale kept
    small for the same chaos-floor reason as the osmosis hybrid test: the
    unclipped x0 substeps amplify fp32 op-order perturbations (measured
    4.3e-2 max drift at scale 3 vs 1.4e-5 at scale 0.5 over this chain)."""
    import_reference()
    rng = np.random.default_rng(31 + k)
    x0 = rng.standard_normal((1, HW, HW, 4)).astype(np.float32)
    y = rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32)
    scale = "0.5,0.5,0.5,0.05"

    ref_img = _run_reference_ps_hybrid_intended(x0, y, k, scale)

    sch = make_schedule("linear", T_STEPS)
    op = get_operator("rgb_guidance", batch_size=1)
    gcfg = GuidanceConfig.from_config(
        "ps", dict(scale=scale, x_prev_every=k), PATTERN, None
    )
    assert gcfg.x_prev_every == k and gcfg.gradient_x_prev is False
    res = guided_sample_loop(
        _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
        jax.random.key(0), op, gcfg, SamplerConfig(clip_denoised=True),
        sample_pattern=PATTERN, deterministic=True,
    )
    assert np.asarray(res.sep_loss).shape == (T_STEPS, 1)
    np.testing.assert_allclose(
        np.asarray(res.sample).transpose(0, 3, 1, 2), ref_img,
        rtol=1e-3, atol=2e-4,
    )
    # must not silently alias the pure (k=1) ps chain
    gp = GuidanceConfig.from_config(
        "ps", dict(scale=scale, gradient_x_prev=True), PATTERN, None
    )
    rp = guided_sample_loop(
        _fake_model_jax, sch, jnp.asarray(x0), jnp.asarray(y),
        jax.random.key(0), op, gp, SamplerConfig(clip_denoised=True),
        sample_pattern=PATTERN, deterministic=True,
    )
    assert np.abs(np.asarray(res.sample) - np.asarray(rp.sample)).max() > 1e-6


# ---- segmented execution (ts= / x0_buf_init=) -------------------------------
# The relay-safe mid-chain progress mechanism (restore.py progress_segments):
# per-step noise is keyed on the timestep VALUE, so chaining segment calls
# must reproduce the single-scan chain BITWISE.

def _run_segmented(seg_lengths, gcfg, record_every=None, scfg=None):
    scfg = scfg or SamplerConfig()
    sch = make_schedule("linear", T_STEPS)
    op = get_operator("underwater_physical_revised", batch_size=2, **OP_KW)
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.standard_normal((2, HW, HW, 4)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (2, HW, HW, 3)).astype(np.float32))
    key = jax.random.key(11)
    kw = dict(sample_pattern=PATTERN, record_every=record_every)

    full = guided_sample_loop(
        _fake_model_jax, sch, x0, y, key, op, gcfg, scfg, **kw
    )

    full_ts = np.arange(T_STEPS - 1, -1, -1, dtype=np.int32)
    x_c, phi_c, opt_c, buf_c, eps_c, done = x0, None, None, None, None, 0
    pieces = []
    for L in seg_lengths:
        res = guided_sample_loop(
            _fake_model_jax, sch, x_c, y, key, op, gcfg, scfg,
            phi_init=phi_c, opt_state_init=opt_c,
            ts=jnp.asarray(full_ts[done:done + L]), x0_buf_init=buf_c,
            eps_hist_init=eps_c, **kw
        )
        x_c, phi_c, opt_c = res.sample, res.phi, res.opt_state
        buf_c, eps_c = res.x0_snapshots, res.eps_hist
        pieces.append(res)
        done += L
    return full, pieces


def _assert_segments_match(full, pieces):
    last = pieces[-1]
    np.testing.assert_array_equal(np.asarray(full.sample), np.asarray(last.sample))
    np.testing.assert_array_equal(
        np.asarray(full.pred_xstart), np.asarray(last.pred_xstart))
    for k in full.phi:
        np.testing.assert_array_equal(np.asarray(full.phi[k]), np.asarray(last.phi[k]))
        cat = np.concatenate([np.asarray(p.phi_trace[k]) for p in pieces])
        np.testing.assert_array_equal(np.asarray(full.phi_trace[k]), cat)
    np.testing.assert_array_equal(
        np.asarray(full.sep_loss),
        np.concatenate([np.asarray(p.sep_loss) for p in pieces]))
    np.testing.assert_array_equal(
        np.asarray(full.x0_std_trace),
        np.concatenate([np.asarray(p.x0_std_trace) for p in pieces]))


def test_segmented_chain_bitwise_equal():
    gcfg = GuidanceConfig.from_config(
        "osmosis", COND_PARAMS, PATTERN,
        {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    full, pieces = _run_segmented([20, 20, 10], gcfg, record_every=20)
    _assert_segments_match(full, pieces)
    # snapshot buffer carries across boundaries: identical recorded process
    assert full.snapshot_steps == pieces[-1].snapshot_steps
    np.testing.assert_array_equal(
        np.asarray(full.x0_snapshots), np.asarray(pieces[-1].x0_snapshots))


def test_segmented_hybrid_chain_bitwise_equal():
    """Segment boundaries aligned to the hybrid block width keep the global
    full:cheap gradient placement — results stay bitwise equal."""
    gcfg = GuidanceConfig.from_config(
        "osmosis", dict(COND_PARAMS, x_prev_every=2), PATTERN, None,
    )
    full, pieces = _run_segmented([20, 20, 10], gcfg)
    _assert_segments_match(full, pieces)


def test_ltsp_hybrid_equals_per_step_composition():
    """x_prev_every=k on the ltsp sampler: the hybrid chain must equal a
    manual composition of 1-step segments that alternate a full-gradient
    gcfg (substep 0 of each block) with an x0-gradient gcfg (substeps
    1..k-1) — the hybrid's only semantic content is WHICH gradient each
    step uses. Tolerance is the fp32 roundoff floor (measured 7e-7 max):
    the block body and the 1-step programs are different XLA executables,
    so fusion orders differ — bitwise equality only holds within one
    program structure (see the segmented tests)."""
    k = 2
    sch = make_schedule("linear", T_STEPS)
    op = get_operator("underwater_physical_revised", batch_size=1, **OP_KW)
    scfg = SamplerConfig(sampler="ltsp", clip_denoised=True)
    rng = np.random.default_rng(41)
    x0 = jnp.asarray(rng.standard_normal((1, HW, HW, 4)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (1, HW, HW, 3)).astype(np.float32))
    key = jax.random.key(5)

    gcfg_h = GuidanceConfig.from_config(
        "osmosis", dict(COND_PARAMS, x_prev_every=k), PATTERN, None)
    res_h = guided_sample_loop(
        _fake_model_jax, sch, x0, y, key, op, gcfg_h, scfg,
        sample_pattern=PATTERN)

    gcfg_full = GuidanceConfig.from_config("osmosis", COND_PARAMS, PATTERN, None)
    gcfg_x0 = GuidanceConfig.from_config(
        "osmosis", dict(COND_PARAMS, gradient_x_prev=False), PATTERN, None)
    full_ts = np.arange(T_STEPS - 1, -1, -1, dtype=np.int32)
    x_c, phi_c, opt_c, eps_c = x0, None, None, None
    for s in range(T_STEPS):
        res = guided_sample_loop(
            _fake_model_jax, sch, x_c, y, key, op,
            gcfg_full if s % k == 0 else gcfg_x0, scfg,
            sample_pattern=PATTERN, phi_init=phi_c, opt_state_init=opt_c,
            ts=jnp.asarray(full_ts[s:s + 1]), eps_hist_init=eps_c)
        x_c, phi_c, opt_c, eps_c = res.sample, res.phi, res.opt_state, res.eps_hist
    np.testing.assert_allclose(
        np.asarray(res_h.sample), np.asarray(x_c), rtol=1e-4, atol=2e-6)
    for kn in res_h.phi:
        np.testing.assert_allclose(
            np.asarray(res_h.phi[kn]), np.asarray(phi_c[kn]),
            rtol=1e-5, atol=1e-7)


def test_segmented_ltsp_chain_bitwise_equal():
    """ltsp segments chain the PLMS eps history through
    GuidedResult.eps_hist / eps_hist_init — results stay bitwise equal to
    the single-scan run, including across the AB1..AB3 warmup boundary
    (first segment shorter than the 4-step history)."""
    gcfg = GuidanceConfig.from_config(
        "osmosis", COND_PARAMS, PATTERN,
        {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    scfg = SamplerConfig(sampler="ltsp", clip_denoised=True)
    full, pieces = _run_segmented([2, 18, 30], gcfg, scfg=scfg)
    _assert_segments_match(full, pieces)
    # eps history surfaces only for ltsp (3 most-recent eps, full shape)
    assert len(pieces[-1].eps_hist) == 3
    assert pieces[-1].eps_hist[0].shape == full.sample.shape
    plain = GuidanceConfig.from_config("osmosis", COND_PARAMS, PATTERN, None)
    res_plain, _ = _run_segmented([T_STEPS], plain)
    assert res_plain.eps_hist is None
