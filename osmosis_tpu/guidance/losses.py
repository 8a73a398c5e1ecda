"""Auxiliary quality losses (osmosis_utils/losses.py).

These act on x0-hat inside the guided step; they are pure jnp functions so
they fuse into the guidance gradient computation.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..registry import LOSSES


@LOSSES.register("avrg_loss")
def average_loss(x: jax.Array) -> jax.Array:
    """Global exposure control: sum |per-channel spatial mean| over batch and
    RGB channels (losses.py:29-45). NHWC input in [-1,1]."""
    rgb = x[..., 0:3]
    mean = jnp.mean(rgb, axis=(1, 2))  # [B, 3]
    # |m| written so the subgradient at m == 0 is 0, matching torch
    # (jnp.abs' gives 1 there, torch.abs' gives 0). A saturated x0-hat
    # (clip_denoised at high t) can land a channel mean on exactly 0, where
    # the conventions inject a ±gamma/HW gradient difference into the
    # x0-gradient guidance mode (which never clips, so it shows up 1:1).
    return jnp.sum(jax.lax.stop_gradient(jnp.sign(mean)) * mean)


@LOSSES.register("val_loss")
def value_loss(x: jax.Array, value: float = 0.7) -> jax.Array:
    """Penalize RGB magnitudes above `value` (losses.py:50-62)."""
    rgb = x[..., 0:3]
    return jnp.mean(jnp.maximum(jnp.abs(rgb) - value, 0.0) ** 2)


def make_aux_loss_fn(
    losses_dictionary: Optional[Dict[str, float]],
) -> Optional[Callable[[jax.Array], Tuple[jax.Array, Dict[str, jax.Array]]]]:
    """Weighted sum container (AuxiliaryLoss, losses.py:67-83).

    Returns None when the config's aux_loss section is empty — then no
    auxiliary term is added (condition_methods.py:85-91,177-182).
    """
    if not losses_dictionary:
        return None
    items = [(k, float(v), LOSSES.get(k)) for k, v in losses_dictionary.items()]

    def aux_fn(x: jax.Array):
        total = 0.0
        per = {}
        for name, gamma, fn in items:
            cur = fn(x)
            total = total + gamma * cur
            per[name] = cur
        return total, per

    return aux_fn
