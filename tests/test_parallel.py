"""Mesh/sharding layer on the virtual 8-device CPU mesh, plus the driver's
multichip dryrun entry."""

import jax
import jax.numpy as jnp
import numpy as np

from osmosis_tpu.parallel.mesh import make_mesh, shard_batch, shard_params


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    mesh2 = make_mesh(8, dp=8, tp=1)
    assert mesh2.shape == {"dp": 8, "tp": 1}
    mesh4 = make_mesh(4, dp=2, tp=2)
    assert mesh4.shape == {"dp": 2, "tp": 2}


def test_shard_params_layout():
    mesh = make_mesh(8, dp=2, tp=4)
    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 16, 64)), "bias": jnp.zeros((64,))},
        "norm": {"scale": jnp.zeros((7,))},  # not divisible → replicated
    }
    sharded = shard_params(params, mesh)
    kernel_shards = sharded["conv"]["kernel"].sharding
    assert kernel_shards.spec[-1] == "tp"
    assert sharded["norm"]["scale"].sharding.spec == ()


def test_data_parallel_batch_math():
    """A jitted computation over a dp-sharded batch matches single-device."""
    mesh = make_mesh(8, dp=8, tp=1)
    x = jnp.arange(8 * 4 * 4, dtype=jnp.float32).reshape(8, 4, 4)
    xs = shard_batch(x, mesh)

    f = jax.jit(lambda a: (a * 2 + 1).sum(axis=(1, 2)))
    np.testing.assert_allclose(np.asarray(f(xs)), np.asarray(f(x)))


def test_dryrun_multichip_8(monkeypatch):
    """Full driver dryrun: tiny-arch equivalence matrix (single-device vs
    dp2/tp4 vs dp8 vs tp8 vs hybrid x_prev_every) + the 552.8M
    production-width phase with its sharded-vs-unsharded numerics
    comparison. The driver's default entry runs the slimmed 2-phase path;
    OSMOSIS_DRYRUN_FULL=1 restores the whole matrix here."""
    monkeypatch.setenv("OSMOSIS_DRYRUN_FULL", "1")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_4(monkeypatch):
    # the production-width phase is covered by the n=8 variant; skip it here
    # to keep the single-core suite tractable
    monkeypatch.setenv("OSMOSIS_DRYRUN_PROD", "0")
    import __graft_entry__ as g

    g.dryrun_multichip(4)
