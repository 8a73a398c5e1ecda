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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
