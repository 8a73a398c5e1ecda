"""Batched / data-parallel fleet runner.

The reference processes one image at a time (batch_size=1 in every shipped
config; its batch>1 guidance semantics are untested and couple images through
the joint norm loss). For throughput, this runner ``jax.vmap``s the batch-1
guided loop over a stack of images: every image gets EXACTLY the batch-1
math (independent phi, independent loss norms), while the UNet executes with
a real batch dimension on the MXU. The stacked axis shards over the mesh's
'dp' axis for multi-chip fleets.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..diffusion.guided import GuidanceConfig, guided_sample_loop
from ..diffusion.sampler import SamplerConfig
from ..diffusion.schedules import DiffusionSchedule
from ..guidance.operators import Operator


def _broadcast_cold_start(operator: Operator, n: int):
    """Stack the operator's cold phi init (and matching optimizer state) to a
    leading fleet axis — per-lane phi is batch-1 inside the vmapped loop."""
    from ..guidance.phi_optim import make_phi_optimizer

    phi1 = {k: jnp.asarray(v) for k, v in operator.phi_init().items()}
    opt1 = make_phi_optimizer(operator.optimizer, operator.etas()).init(phi1)
    bc = lambda a: jnp.broadcast_to(a, (n,) + a.shape)
    return (
        jax.tree_util.tree_map(bc, phi1),
        jax.tree_util.tree_map(bc, opt1),
    )


def make_batched_guided_runner(
    model_apply,
    schedule: DiffusionSchedule,
    operator: Operator,
    gcfg: GuidanceConfig,
    scfg: SamplerConfig = SamplerConfig(),
    sample_pattern: Optional[dict] = None,
    record_every: Optional[int] = None,
    mesh=None,
):
    """Returns jit(fn)(params, xs, ys, keys, phi0s, opt0s) where xs: [N,H,W,4],
    ys: [N,H,W,3], keys: [N] PRNG keys, and phi0s/opt0s are per-image warm-start
    pytrees with a leading N axis (stack ``operator.phi_init()`` for cold
    starts; feed the previous global iteration's ``res.phi``/``res.opt_state``
    for global_N>1 — see guided_sample_loop). Output pytree has a leading N
    axis; each element is bit-identical in semantics to an independent
    batch-1 guided run."""

    def one(params, x, y, key, phi0, opt0, eta_s):
        def model_fn(xx, tt):
            return model_apply(params, xx, tt)

        return guided_sample_loop(
            model_fn, schedule, x[None], y[None], key, operator, gcfg, scfg,
            sample_pattern=sample_pattern, record_every=record_every,
            phi_init=phi0, opt_state_init=opt0, eta_scale=eta_s,
        )

    # eta_s is a scalar shared by every image (global_eta_scale knob)
    batched = jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0, None))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _sharded(params, xs, ys, keys, phi0s, opt0s, eta_s):
            xs = jax.lax.with_sharding_constraint(xs, NamedSharding(mesh, P("dp")))
            ys = jax.lax.with_sharding_constraint(ys, NamedSharding(mesh, P("dp")))
            return batched(params, xs, ys, keys, phi0s, opt0s, eta_s)

        jitted = jax.jit(_sharded)
    else:
        jitted = jax.jit(batched)

    def run(params, xs, ys, keys, phi0s=None, opt0s=None, eta_scale=None):
        n = xs.shape[0]
        cold_phi, cold_opt = _broadcast_cold_start(operator, n)
        if phi0s is None:
            phi0s = cold_phi
        if opt0s is None:
            # cold optimizer state — also the global_opt_reset path, where a
            # warm phi rides with freshly-zeroed optimizer moments
            opt0s = cold_opt
        return jitted(params, xs, ys, keys, phi0s, opt0s, eta_scale)

    return run


def make_batched_segment_runner(
    model_apply,
    schedule: DiffusionSchedule,
    operator: Operator,
    gcfg: GuidanceConfig,
    scfg: SamplerConfig = SamplerConfig(),
    sample_pattern: Optional[dict] = None,
    record_every: Optional[int] = None,
    mesh=None,
):
    """Segment variant of :func:`make_batched_guided_runner`: runs only the
    given descending slice of chain timesteps (``ts``), threading each lane's
    incoming x_t / snapshot buffer / PLMS eps history through the boundary —
    the fleet-path counterpart of restore.py's serial segment runner. Per-step
    noise is keyed on the timestep value, so chaining segments reproduces the
    single-scan fleet run bitwise (tests/test_chain_checkpoint.py). Used for
    ``progress_segments`` live telemetry and ``chain_checkpoint`` durable
    mid-chain resume at batch_size > 1."""

    def one(params, x, y, key, phi0, opt0, eta_s, ts, buf0, eps0):
        def model_fn(xx, tt):
            return model_apply(params, xx, tt)

        return guided_sample_loop(
            model_fn, schedule, x[None], y[None], key, operator, gcfg, scfg,
            sample_pattern=sample_pattern, record_every=record_every,
            phi_init=phi0, opt_state_init=opt0, eta_scale=eta_s,
            ts=ts, x0_buf_init=buf0, eps_hist_init=eps0,
        )

    # ts is the SAME timestep slice for every lane (in_axes None); buf0/eps0
    # are per-lane (None on the first segment — zero leaves under vmap)
    batched = jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0, None, None, 0, 0))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _sharded(params, xs, ys, keys, phi0s, opt0s, eta_s, ts, b0, e0):
            xs = jax.lax.with_sharding_constraint(xs, NamedSharding(mesh, P("dp")))
            ys = jax.lax.with_sharding_constraint(ys, NamedSharding(mesh, P("dp")))
            return batched(params, xs, ys, keys, phi0s, opt0s, eta_s, ts, b0, e0)

        jitted = jax.jit(_sharded)
    else:
        jitted = jax.jit(batched)

    def run(params, xs, ys, keys, phi0s, opt0s, eta_scale, ts,
            buf0s=None, eps0s=None):
        n = xs.shape[0]
        cold_phi, cold_opt = _broadcast_cold_start(operator, n)
        if phi0s is None:
            phi0s = cold_phi
        if opt0s is None:
            opt0s = cold_opt
        return jitted(params, xs, ys, keys, phi0s, opt0s, eta_scale, ts,
                      buf0s, eps0s)

    return run
