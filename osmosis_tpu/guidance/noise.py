"""Measurement noise models (guided_diffusion/measurements.py:462-529)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..registry import NOISES


@dataclasses.dataclass(frozen=True)
class Noiser:
    name: str

    def __call__(self, data, key=None):
        return self.forward(data, key)

    def forward(self, data, key=None):
        raise NotImplementedError


@NOISES.register("clean")
@dataclasses.dataclass(frozen=True)
class Clean(Noiser):
    def forward(self, data, key=None):
        return data


@NOISES.register("gaussian")
@dataclasses.dataclass(frozen=True)
class GaussianNoise(Noiser):
    sigma: float = 0.0

    def forward(self, data, key=None):
        if self.sigma == 0:
            return data
        return data + jax.random.normal(key, data.shape, data.dtype) * self.sigma


@NOISES.register("poisson")
@dataclasses.dataclass(frozen=True)
class PoissonNoise(Noiser):
    """skimage-style poisson shot noise on [0,1]*255 counts
    (measurements.py:486-507, 'version 3')."""

    rate: float = 1.0

    def forward(self, data, key=None):
        d = jnp.clip((data + 1.0) / 2.0, 0.0, 1.0)
        counts = jax.random.poisson(key, d * 255.0 * self.rate, shape=d.shape)
        d = counts.astype(jnp.float32) / 255.0 / self.rate
        return jnp.clip(d * 2.0 - 1.0, -1.0, 1.0)


def get_noiser(name: str, **kwargs) -> Noiser:
    cls = NOISES.get(name)
    if name == "gaussian":
        return cls(name=name, sigma=float(kwargs.get("sigma", 0.0)))
    if name == "poisson":
        return cls(name=name, rate=float(kwargs.get("rate", 1.0)))
    return cls(name=name)
