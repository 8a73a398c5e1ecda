"""Functional per-phi optimizers for the in-scan water-parameter updates.

The reference drives phi with torch optimizers built per operator
(osmosis_utils/utils.py:494-524; measurements.py:244-249) — shipped configs
use SGD with per-parameter lr (== plain gradient descent, measurements.py:
266-303). Here each optimizer is a pure (init, update) pair whose state lives
in the sampling-scan carry, with torch-default hyperparameters.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

PhiTree = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class PhiOptimizer:
    init: Callable[[PhiTree], dict]
    update: Callable[[PhiTree, PhiTree, dict], Tuple[PhiTree, dict]]


def make_phi_optimizer(name: str, etas: Dict[str, float]) -> PhiOptimizer:
    name = (name or "gd").lower()

    if name in ("", "gd", "sgd"):
        # torch.optim.SGD without momentum == manual GD (measurements.py:279-301)
        def init(phi):
            return {}

        def update(phi, grads, state):
            new = {k: phi[k] - etas[k] * grads[k] for k in phi}
            return new, state

        return PhiOptimizer(init, update)

    if name == "adam":
        b1, b2, eps = 0.9, 0.999, 1e-8  # torch.optim.Adam defaults

        def init(phi):
            return {
                "m": {k: jnp.zeros_like(v) for k, v in phi.items()},
                "v": {k: jnp.zeros_like(v) for k, v in phi.items()},
                "count": jnp.zeros((), jnp.int32),
            }

        def update(phi, grads, state):
            count = state["count"] + 1
            t = count.astype(jnp.float32)
            new_phi, new_m, new_v = {}, {}, {}
            for k in phi:
                m = b1 * state["m"][k] + (1 - b1) * grads[k]
                v = b2 * state["v"][k] + (1 - b2) * grads[k] ** 2
                mhat = m / (1 - b1**t)
                vhat = v / (1 - b2**t)
                new_phi[k] = phi[k] - etas[k] * mhat / (jnp.sqrt(vhat) + eps)
                new_m[k], new_v[k] = m, v
            return new_phi, {"m": new_m, "v": new_v, "count": count}

        return PhiOptimizer(init, update)

    if name == "rmsprop":
        alpha, eps = 0.99, 1e-8  # torch.optim.RMSprop defaults

        def init(phi):
            return {"sq": {k: jnp.zeros_like(v) for k, v in phi.items()}}

        def update(phi, grads, state):
            new_phi, new_sq = {}, {}
            for k in phi:
                sq = alpha * state["sq"][k] + (1 - alpha) * grads[k] ** 2
                new_phi[k] = phi[k] - etas[k] * grads[k] / (jnp.sqrt(sq) + eps)
                new_sq[k] = sq
            return new_phi, {"sq": new_sq}

        return PhiOptimizer(init, update)

    raise ValueError(f"phi optimizer '{name}' is not supported")
