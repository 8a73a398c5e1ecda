"""Guidance-stack unit parity: operators, depth conversion, aux losses,
noise models, pcgs schedule masks — each checked against the reference
implementation (measurements.py, losses.py, utils.py:529-630)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from osmosis_tpu.guidance import operators as OPS
from osmosis_tpu.guidance import losses as L
from osmosis_tpu.guidance import noise as N
from osmosis_tpu.guidance.schedule_masks import pattern_masks
from tests.ref_utils import import_reference


def _rand_rgbd(key=0, b=2, hw=8):
    rng = np.random.default_rng(key)
    return rng.uniform(-1, 1, (b, hw, hw, 4)).astype(np.float32)


def test_convert_depth_parity():
    import_reference()
    import torch
    import osmosis_utils.utils as utilso

    rng = np.random.default_rng(0)
    d = rng.uniform(-1, 1, (1, 1, 8, 8)).astype(np.float32)
    for depth_type, value in [
        ("gamma", np.array([1.4, 1.4, 1.0])),
        ("original", np.array([1.4, 1.4, 1.0])),  # value unused but required
        ("move", 0.5),
    ]:
        ref = utilso.convert_depth(
            torch.from_numpy(d), depth_type=depth_type, value=value
        ).numpy()
        ours = np.asarray(
            OPS.convert_depth(jnp.asarray(d.transpose(0, 2, 3, 1)), depth_type, value)
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


@pytest.mark.parametrize(
    "name,kwargs",
    [
        (
            "underwater_physical_revised",
            dict(phi_a="1.1,0.95,0.95", phi_b="0.95, 0.8, 0.8", phi_inf="0.14, 0.29, 0.49",
                 depth_type="gamma", value="1.4,1.4,1"),
        ),
        (
            "underwater_physical",
            dict(phi_ab="1.1,0.95,0.95", phi_inf="0.2,0.4,0.7",
                 depth_type="original", value="1.4,1.4,1"),
        ),
        (
            "haze_physical",
            dict(phi_ab=1.0, phi_inf="0.14, 0.29, 0.49",
                 depth_type="gamma", value="1.4,1.4,1"),
        ),
    ],
)
def test_operator_forward_parity(name, kwargs):
    import_reference()
    import torch
    from guided_diffusion.measurements import get_operator as ref_get_operator

    data = _rand_rgbd(1)
    ref_op = ref_get_operator(
        name=name, device=torch.device("cpu"), optimizer="sgd", batch_size=2, **kwargs
    )
    ref_out = ref_op.forward(torch.from_numpy(data.transpose(0, 3, 1, 2)))

    op = OPS.get_operator(name, batch_size=2, optimizer="sgd", **kwargs)
    phi = {k: jnp.asarray(v) for k, v in op.phi_init().items()}
    ours = np.asarray(op.forward(phi, jnp.asarray(data))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref_out.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_operator_etas_and_learn_flags():
    op = OPS.get_operator(
        "underwater_physical_revised", phi_a="1,1,1", phi_b="1,1,1", phi_inf="0,0,0",
        phi_a_eta=1e-5, phi_b_eta="2e-5", phi_b_learn_flag=True,
        phi_inf_learn_flag=False, phi_inf_eta=1e-5,
        depth_type="original", value="1.4,1.4,1",
    )
    etas = op.etas()
    assert etas["phi_a"] == 1e-5
    assert etas["phi_b"] == 2e-5
    assert etas["phi_inf"] == 0.0  # learn flag off zeroes the step size


def test_identity_operators():
    for name in ("noise", "rgb_guidance"):
        op = OPS.get_operator(name)
        x = jnp.ones((1, 4, 4, 3))
        np.testing.assert_array_equal(np.asarray(op.forward({}, x)), np.asarray(x))
        assert op.phi_init() == {}


def test_aux_losses_parity():
    import_reference()
    import torch
    import osmosis_utils.losses as losseso

    x = _rand_rgbd(3)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref_aux = losseso.AuxiliaryLoss({"avrg_loss": 0.5, "val_loss": 20.0})
    ref_total, ref_dict = ref_aux.forward(xt)

    aux_fn = L.make_aux_loss_fn({"avrg_loss": 0.5, "val_loss": 20.0})
    total, per = aux_fn(jnp.asarray(x))
    np.testing.assert_allclose(float(total), ref_total.item(), rtol=1e-5)
    np.testing.assert_allclose(float(per["avrg_loss"]), ref_dict["avrg_loss"].item(), rtol=1e-5)
    np.testing.assert_allclose(float(per["val_loss"]), ref_dict["val_loss"].item(), rtol=1e-5)
    assert L.make_aux_loss_fn(None) is None
    assert L.make_aux_loss_fn({}) is None


def test_noise_models():
    x = jnp.asarray(_rand_rgbd(4)[..., :3])
    clean = N.get_noiser("clean")
    np.testing.assert_array_equal(np.asarray(clean(x)), np.asarray(x))
    g0 = N.get_noiser("gaussian", sigma=0)
    np.testing.assert_array_equal(np.asarray(g0(x)), np.asarray(x))
    g = N.get_noiser("gaussian", sigma=0.1)
    y = np.asarray(g(x, key=jax.random.key(0)))
    assert 0.05 < np.std(y - np.asarray(x)) < 0.2
    p = N.get_noiser("poisson", rate=1.0)
    yp = np.asarray(p(x, key=jax.random.key(1)))
    assert yp.min() >= -1.0 and yp.max() <= 1.0


PCGS = dict(
    pattern="pcgs", update_start=0.7, update_end=0, global_N=1, local_M=1,
    s_start=1, s_end=0, n_iter=20, start_guidance=1, stop_guidance=0,
)


@pytest.mark.parametrize(
    "pattern",
    [
        PCGS,
        {**PCGS, "local_M": 3, "update_start": 0.7, "s_start": 0.6, "s_end": 0.1},
        {**PCGS, "start_guidance": 0.8, "stop_guidance": 0.1},
        dict(pattern="original"),
    ],
)
def test_pattern_masks_truth_table(pattern):
    import_reference()
    import osmosis_utils.utils as utilso

    T = 100
    masks = pattern_masks(pattern, T)
    for t in range(T):
        assert masks["freeze_phi"][t] == utilso.is_freeze_phi(pattern, t, T), t
        if pattern.get("pattern") != "original":
            assert masks["alternate_len"][t] == utilso.set_alternate_length(pattern, t, T), t
        guidance_ref = (
            pattern.get("pattern") in (None, "original")
            or pattern["start_guidance"] * T >= t >= pattern["stop_guidance"] * T
        )
        assert masks["guidance"][t] == guidance_ref, t


def test_phi_warmup_mask():
    """Extension knob: phi_warmup_iters places a one-off iteration burst at
    exactly the FIRST unfrozen step of the reverse chain; default 0 keeps
    every mask zero (reference semantics untouched)."""
    T = 100
    # default / absent: all zeros
    assert not pattern_masks(PCGS, T)["phi_warmup"].any()
    assert not pattern_masks(dict(pattern="original"), T)["phi_warmup"].any()

    masks = pattern_masks({**PCGS, "phi_warmup_iters": 50}, T)
    warm = masks["phi_warmup"]
    freeze = masks["freeze_phi"]
    # unfreeze boundary for update_start=0.7: frozen iff t > 70
    first_unfrozen = max(t for t in range(T) if not freeze[t])
    assert warm[first_unfrozen] == 50
    assert warm.sum() == 50  # exactly one step carries the burst
    # warmup never lands on a frozen step
    assert not (warm > 0)[freeze].any()


def test_per_channel_eta():
    op = OPS.get_operator(
        "underwater_physical_revised",
        phi_a="1,1,1", phi_b="1,1,1", phi_inf="0,0,0",
        phi_a_eta="1e-5,2e-5,3e-5", phi_b_eta=[1e-4, 2e-4, 3e-4],
        phi_inf_eta=1e-5, phi_inf_learn_flag=False,
        depth_type="original", value="1.4,1.4,1",
    )
    etas = op.etas()
    np.testing.assert_allclose(etas["phi_a"], [1e-5, 2e-5, 3e-5])
    np.testing.assert_allclose(etas["phi_b"], [1e-4, 2e-4, 3e-4])
    assert etas["phi_inf"] == 0.0

    # the functional sgd optimizer broadcasts [C] etas over the [B, C] phi
    from osmosis_tpu.guidance.phi_optim import make_phi_optimizer

    opt = make_phi_optimizer("sgd", etas)
    phi = {k: jnp.ones((2, 3)) for k in ("phi_a", "phi_b", "phi_inf")}
    grads = {k: jnp.ones((2, 3)) for k in phi}
    new, _ = opt.update(phi, grads, opt.init(phi))
    np.testing.assert_allclose(
        np.asarray(new["phi_a"])[0], 1.0 - np.array([1e-5, 2e-5, 3e-5]), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(new["phi_inf"]), 1.0)


def test_guided_chain_jit_determinism():
    """SURVEY section 5: jit-determinism as the race-detector equivalent —
    identical seeds must produce bit-identical chains across fresh jits."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from osmosis_tpu.diffusion import make_schedule
    from osmosis_tpu.diffusion.guided import GuidanceConfig, guided_sample_loop
    from osmosis_tpu.diffusion.sampler import SamplerConfig
    from osmosis_tpu.guidance.operators import get_operator

    sch = make_schedule("cosine", 8)
    op = get_operator(
        "underwater_physical_revised", batch_size=1, optimizer="sgd",
        depth_type="gamma", value="1.4,1.4,1",
        phi_a="1.1,0.95,0.95", phi_b="0.95,0.8,0.8", phi_inf="0.14,0.29,0.49",
    )
    pattern = dict(pattern="pcgs", update_start=0.7, update_end=0, global_N=1,
                   local_M=1, s_start=1, s_end=0, n_iter=2, start_guidance=1,
                   stop_guidance=0)
    gcfg = GuidanceConfig.from_config(
        "osmosis",
        dict(loss_function="norm", loss_weight="depth",
             weight_function="gamma,1.4,1.4,1", scale="7,7,7,0.9",
             gradient_x_prev=True, gradient_clip="True,0.005"),
        pattern, None,
    )

    def model(x, t):
        tb = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
        return jnp.concatenate([0.3 * x + 0.001 * tb, 0.1 * x], axis=-1)

    x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    y = jax.random.uniform(jax.random.key(1), (1, 8, 8, 3), minval=-1.0)

    outs = []
    for _ in range(2):  # two FRESH jits of the same program
        fn = jax.jit(lambda p, x, yy, k: guided_sample_loop(
            model, sch, x, yy, k, op, gcfg, SamplerConfig(clip_denoised=True),
            sample_pattern=pattern,
        ).sample)
        outs.append(np.asarray(fn(None, x0, y, jax.random.key(2))))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_eta_scale_matches_scaled_etas():
    """global_eta_scale semantics (guided.py eta_scale): running a chain with
    eta_scale=s must match a chain whose operator etas are multiplied by s
    (eta enters every phi step linearly; state evolution is eta-independent),
    and eta_scale=0.0 must freeze phi EXACTLY at its init."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from osmosis_tpu.diffusion import make_schedule
    from osmosis_tpu.diffusion.guided import GuidanceConfig, guided_sample_loop
    from osmosis_tpu.diffusion.sampler import SamplerConfig
    from osmosis_tpu.guidance.operators import get_operator

    sch = make_schedule("cosine", 8)
    pattern = dict(pattern="pcgs", update_start=0.7, update_end=0, global_N=1,
                   local_M=1, s_start=1, s_end=0, n_iter=3, start_guidance=1,
                   stop_guidance=0)
    gparams = dict(loss_function="norm", loss_weight="depth",
                   weight_function="gamma,1.4,1.4,1", scale="7,7,7,0.9",
                   gradient_x_prev=True, gradient_clip="True,0.005")

    def model(x, t):
        tb = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
        return jnp.concatenate([0.3 * x + 0.001 * tb, 0.1 * x], axis=-1)

    x0 = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    y = jax.random.uniform(jax.random.key(1), (1, 8, 8, 3), minval=-1.0)

    def run(optimizer, eta_mult, eta_scale):
        op = get_operator(
            "underwater_physical_revised", batch_size=1, optimizer=optimizer,
            depth_type="gamma", value="1.4,1.4,1",
            phi_a="1.1,0.95,0.95", phi_b="0.95,0.8,0.8",
            phi_inf="0.14,0.29,0.49",
            phi_a_eta=1e-3 * eta_mult, phi_b_eta=1e-3 * eta_mult,
            phi_inf_eta=1e-3 * eta_mult,
        )
        gcfg = GuidanceConfig.from_config("osmosis", gparams, pattern, None)
        res = guided_sample_loop(
            model, sch, x0, y, jax.random.key(2), op, gcfg,
            SamplerConfig(clip_denoised=True), sample_pattern=pattern,
            eta_scale=eta_scale,
        )
        return res

    for optimizer in ("sgd", "adam"):
        ref = run(optimizer, eta_mult=0.5, eta_scale=None)
        scaled = run(optimizer, eta_mult=1.0, eta_scale=jnp.float32(0.5))
        for k in ref.phi:
            np.testing.assert_allclose(
                np.asarray(scaled.phi[k]), np.asarray(ref.phi[k]),
                rtol=2e-4, atol=2e-6, err_msg=f"{optimizer}:{k}",
            )

    # eta_scale=0.0: p + 0*(n-p) == p bitwise -> phi never moves
    frozen = run("sgd", eta_mult=1.0, eta_scale=jnp.float32(0.0))
    init = {"phi_a": [1.1, 0.95, 0.95], "phi_b": [0.95, 0.8, 0.8],
            "phi_inf": [0.14, 0.29, 0.49]}
    for k, v in init.items():
        np.testing.assert_array_equal(
            np.asarray(frozen.phi[k])[0], np.asarray(v, dtype=np.float32))
