"""Batched vmap runner ≡ independent batch-1 guided runs (exact)."""

import jax
import jax.numpy as jnp
import numpy as np

from osmosis_tpu.diffusion.guided import GuidanceConfig, guided_sample_loop
from osmosis_tpu.diffusion.sampler import SamplerConfig
from osmosis_tpu.diffusion.schedules import make_schedule
from osmosis_tpu.guidance.operators import get_operator
from osmosis_tpu.parallel.mesh import make_mesh
from osmosis_tpu.parallel.runner import make_batched_guided_runner

HW = 8
T = 10

OP_KW = dict(
    optimizer="sgd", depth_type="gamma", value="1.4,1.4,1",
    phi_a="1.1,0.95,0.95", phi_a_eta=1e-4,
    phi_b="0.95,0.8,0.8", phi_b_eta=1e-4,
    phi_inf="0.14,0.29,0.49", phi_inf_eta=1e-4,
)
PATTERN = dict(
    pattern="pcgs", update_start=0.7, update_end=0, global_N=1, local_M=1,
    s_start=1, s_end=0, n_iter=2, start_guidance=1, stop_guidance=0,
)


def _model_apply(params, x, t):
    del params
    tb = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
    return jnp.concatenate([0.3 * x + 0.001 * tb, 0.1 * x], axis=-1)


def _setup():
    sch = make_schedule("cosine", T)
    op = get_operator("underwater_physical_revised", batch_size=1, **OP_KW)
    gcfg = GuidanceConfig.from_config(
        "osmosis",
        dict(loss_function="norm", loss_weight="depth",
             weight_function="gamma,1.4,1.4,1", scale="7,7,7,0.9",
             gradient_x_prev=True, gradient_clip="True,0.005"),
        PATTERN, {"aux_loss": {"avrg_loss": 0.5, "val_loss": 20.0}},
    )
    return sch, op, gcfg, SamplerConfig(clip_denoised=True)


def test_batched_equals_independent():
    sch, op, gcfg, scfg = _setup()
    n = 4
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((n, HW, HW, 4)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-1, 1, (n, HW, HW, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.key(1), n)

    run = make_batched_guided_runner(
        _model_apply, sch, op, gcfg, scfg, sample_pattern=PATTERN
    )
    batched = run({}, xs, ys, keys)

    for i in range(n):
        single = guided_sample_loop(
            lambda x, t: _model_apply({}, x, t), sch, xs[i][None], ys[i][None],
            keys[i], op, gcfg, scfg, sample_pattern=PATTERN,
        )
        np.testing.assert_allclose(
            np.asarray(batched.sample[i]), np.asarray(single.sample),
            rtol=2e-5, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(batched.phi["phi_a"][i]), np.asarray(single.phi["phi_a"]),
            rtol=1e-5, atol=1e-6,
        )


def test_warm_phi_cold_opt():
    """global_opt_reset path: warm phi with opt0s=None must re-init cold
    optimizer moments (restore.py threads res.phi + None between global
    chains) and match an explicit cold-state call bit-for-bit."""
    sch, op, gcfg, scfg = _setup()
    n = 2
    rng = np.random.default_rng(4)
    xs = jnp.asarray(rng.standard_normal((n, HW, HW, 4)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-1, 1, (n, HW, HW, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.key(5), n)

    run = make_batched_guided_runner(
        _model_apply, sch, op, gcfg, scfg, sample_pattern=PATTERN
    )
    first = run({}, xs, ys, keys)

    # second chain: warm phi, reset opt (None) vs explicit cold opt state
    from osmosis_tpu.guidance.phi_optim import make_phi_optimizer

    phi1 = {k: jnp.asarray(v) for k, v in op.phi_init().items()}
    opt_cold = make_phi_optimizer(op.optimizer, op.etas()).init(phi1)
    opt_cold_n = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (n,) + a.shape), opt_cold
    )
    a = run({}, xs, ys, keys, phi0s=first.phi, opt0s=None)
    b = run({}, xs, ys, keys, phi0s=first.phi, opt0s=opt_cold_n)
    np.testing.assert_array_equal(np.asarray(a.sample), np.asarray(b.sample))
    for k in a.phi:
        np.testing.assert_array_equal(np.asarray(a.phi[k]), np.asarray(b.phi[k]))


def test_batched_runner_dp_sharded():
    sch, op, gcfg, scfg = _setup()
    mesh = make_mesh(8, dp=8, tp=1)
    n = 8
    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.standard_normal((n, HW, HW, 4)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-1, 1, (n, HW, HW, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.key(3), n)
    with mesh:
        run = make_batched_guided_runner(
            _model_apply, sch, op, gcfg, scfg, sample_pattern=PATTERN, mesh=mesh
        )
        out = run({}, xs, ys, keys)
    assert out.sample.shape == (n, 1, HW, HW, 4)
    assert np.isfinite(np.asarray(out.sample)).all()
