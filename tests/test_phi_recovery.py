"""Scientific end-to-end validation: phi recovery with an oracle denoiser.

Without the released checkpoint we cannot test restoration quality, but the
GibbsDDRM phi-optimization machinery can be validated quantitatively: give
the sampler an ORACLE denoiser that always predicts the true clean RGBD
(eps = (x_t - sqrt(a_bar) x0_true)/sqrt(1-a_bar)), synthesize the
measurement with KNOWN water parameters through the physics operator, and
check the in-scan phi SGD converges toward the true phi. This exercises the
whole guided loop — vjp, inner phi iterations, masks, optimizer — with a
measurable ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np

from osmosis_tpu.diffusion import make_schedule
from osmosis_tpu.diffusion.guided import GuidanceConfig, guided_sample_loop
from osmosis_tpu.diffusion.sampler import SamplerConfig
from osmosis_tpu.guidance.operators import get_operator

HW = 16
T = 60


def _smooth_image(key, shape):
    """Low-frequency random image in [-0.8, 0.8]."""
    small = jax.random.uniform(key, (4, 4, shape[-1]), minval=-0.8, maxval=0.8)
    return jax.image.resize(small, shape, method="bilinear")


def test_phi_converges_to_truth_with_oracle_denoiser():
    x0_true = _smooth_image(jax.random.key(0), (HW, HW, 4))[None]

    phi_true = {
        "phi_a": jnp.array([[0.9, 0.7, 0.6]]),
        "phi_b": jnp.array([[0.7, 0.6, 0.5]]),
        "phi_inf": jnp.array([[0.2, 0.35, 0.5]]),
    }
    op_kw = dict(
        optimizer="sgd", depth_type="original", value="1.4,1.4,1",
        phi_a="1.1,0.95,0.95", phi_b="0.95,0.8,0.8", phi_inf="0.14,0.29,0.49",
        phi_a_eta=2e-4, phi_b_eta=2e-4, phi_inf_eta=2e-4,
    )
    operator = get_operator("underwater_physical_revised", batch_size=1, **op_kw)
    y = 2.0 * operator.forward(phi_true, x0_true) - 1.0  # measurement in [-1,1]

    sch = make_schedule("linear", T)
    consts = sch.device_constants()
    sa = jnp.asarray(consts["sqrt_alphas_cumprod"])
    s1m = jnp.asarray(consts["sqrt_one_minus_alphas_cumprod"])
    tmap = jnp.asarray(consts["model_timesteps"])

    def oracle_model(x, t_float):
        # invert model timestep -> respaced index (identity respacing here)
        idx = jnp.clip(t_float[0].astype(jnp.int32), 0, T - 1)
        eps = (x - sa[idx] * x0_true) / s1m[idx]
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    pattern = dict(
        pattern="pcgs", update_start=1.0, update_end=0, global_N=1, local_M=1,
        s_start=1, s_end=0, n_iter=10, start_guidance=1, stop_guidance=0,
    )
    gcfg = GuidanceConfig.from_config(
        "osmosis",
        dict(loss_function="norm", loss_weight="none",
             weight_function="gamma,1.4,1.4,1", scale="0.5,0.5,0.5,0.5",
             gradient_x_prev=True, gradient_clip="True,0.005"),
        pattern, None,
    )
    x_init = jax.random.normal(jax.random.key(1), (1, HW, HW, 4))
    res = guided_sample_loop(
        oracle_model, sch, x_init, y, jax.random.key(2), operator, gcfg,
        SamplerConfig(clip_denoised=True), sample_pattern=pattern,
        deterministic=True,
    )

    # with a perfect denoiser the chain lands on x0_true and the phi gradient
    # is the true physics residual. phi_b/phi_inf trade off inside the
    # backscatter term (only their combination is identifiable), so assert:
    # (a) the attenuation coefficient converges toward its target, and
    # (b) the OBSERVABLE — the forward-model output — converges to the
    #     measurement far beyond what the initial phi explains.
    init_phi = {k: jnp.asarray(v) for k, v in operator.phi_init().items()}
    k = "phi_a"
    d_init = np.abs(np.asarray(init_phi[k]) - np.asarray(phi_true[k])).mean()
    d_final = np.abs(np.asarray(res.phi[k]) - np.asarray(phi_true[k])).mean()
    assert d_final < d_init * 0.9, (
        f"{k}: no convergence toward truth ({d_init:.4f} -> {d_final:.4f})"
    )

    def forward_err(phi):
        pred = 2.0 * operator.forward(phi, x0_true) - 1.0
        return float(jnp.sqrt(jnp.sum((y - pred) ** 2)))

    err_init = forward_err(init_phi)
    err_final = forward_err(res.phi)
    assert err_final < 0.35 * err_init, (
        f"forward model did not converge: {err_init:.4f} -> {err_final:.4f}"
    )

    # the guidance loss must decrease substantially over the chain
    sep = np.asarray(res.sep_loss)[:, 0]
    assert sep[-1] < 0.35 * sep.max(), f"loss did not collapse: max {sep.max()} -> {sep[-1]}"

    # and the final x0-hat equals the oracle's clean image
    np.testing.assert_allclose(
        np.asarray(res.pred_xstart), np.asarray(x0_true), atol=1e-2
    )
