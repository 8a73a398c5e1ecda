"""Functional phi optimizers vs torch.optim on identical gradient sequences
(utils.py:494-524 surface; torch-default hyperparameters)."""

import numpy as np
import pytest

import jax.numpy as jnp

from osmosis_tpu.guidance.phi_optim import make_phi_optimizer


def _run_ours(name, etas, phi0, grads_seq):
    opt = make_phi_optimizer(name, etas)
    phi = {k: jnp.asarray(v) for k, v in phi0.items()}
    state = opt.init(phi)
    for grads in grads_seq:
        phi, state = opt.update(phi, {k: jnp.asarray(g) for k, g in grads.items()}, state)
    return {k: np.asarray(v) for k, v in phi.items()}


def _run_torch(optim_cls, etas, phi0, grads_seq, **kw):
    import torch

    params = {k: torch.tensor(v, requires_grad=True) for k, v in phi0.items()}
    opt = optim_cls(
        [{"params": [params[k]], "lr": etas[k]} for k in sorted(params)], **kw
    )
    for grads in grads_seq:
        opt.zero_grad()
        for k in params:
            params[k].grad = torch.tensor(grads[k])
        opt.step()
    return {k: v.detach().numpy() for k, v in params.items()}


@pytest.mark.parametrize("name", ["sgd", "adam", "rmsprop"])
def test_optimizer_parity_with_torch(name):
    import torch

    rng = np.random.default_rng(0)
    phi0 = {
        "phi_a": rng.uniform(0.5, 1.5, (1, 3)).astype(np.float32),
        "phi_inf": rng.uniform(0.0, 0.5, (1, 3)).astype(np.float32),
    }
    etas = {"phi_a": 1e-2, "phi_inf": 5e-3}
    grads_seq = [
        {k: rng.standard_normal(v.shape).astype(np.float32) for k, v in phi0.items()}
        for _ in range(5)
    ]

    ours = _run_ours(name, etas, phi0, grads_seq)
    cls = {"sgd": torch.optim.SGD, "adam": torch.optim.Adam,
           "rmsprop": torch.optim.RMSprop}[name]
    kw = {"eps": 1e-8} if name == "rmsprop" else {}
    ref = _run_torch(cls, etas, phi0, grads_seq, **kw)
    for k in phi0:
        np.testing.assert_allclose(ours[k], ref[k], rtol=1e-5, atol=1e-6)


def test_gd_equals_sgd():
    phi0 = {"p": np.array([[1.0, 2.0]], np.float32)}
    etas = {"p": 0.1}
    grads = [{"p": np.array([[0.5, -0.5]], np.float32)}]
    a = _run_ours("gd", etas, phi0, grads)
    b = _run_ours("sgd", etas, phi0, grads)
    np.testing.assert_array_equal(a["p"], b["p"])
    np.testing.assert_allclose(a["p"], [[0.95, 2.05]], rtol=1e-6)


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError):
        make_phi_optimizer("lbfgs", {})
