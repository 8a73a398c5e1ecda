"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native substitute for multi-node tests (SURVEY.md section 4):
sharding/pjit paths are validated on `xla_force_host_platform_device_count=8`
CPU devices; the real chip only runs bench/graft entry points.
Must set env vars BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start; the
# config update wins regardless of registration order.
jax.config.update("jax_platforms", "cpu")
# Schedule/attention parity tests need true fp32 matmuls, not bf16 MXU passes.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, "expected a virtual 8-device CPU mesh"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
