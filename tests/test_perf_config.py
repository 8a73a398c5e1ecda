"""Perf-knob config surface (osmosis_tpu/perf.py): every trace-time knob is
settable via the YAML ``perf:`` section, env vars act as overrides only, and
the effective values are reproducible from the run-dir snapshot."""

import dataclasses

import pytest

from osmosis_tpu import perf
from osmosis_tpu.models import nn as onn


@pytest.fixture(autouse=True)
def _clean_env_and_config(monkeypatch):
    for env in perf._ENV.values():
        monkeypatch.delenv(env, raising=False)
    monkeypatch.delenv(perf._BWD_FLAT_ENV, raising=False)
    # restore config defaults after each test
    saved = dataclasses.replace(perf._CONFIG)
    yield
    for f in dataclasses.fields(saved):
        setattr(perf._CONFIG, f.name, getattr(saved, f.name))


def test_defaults_are_the_measured_best():
    eff = perf.effective()
    assert eff["strip_conv"] is True
    assert eff["strip_count"] == 16
    assert eff["strip_min_tokens"] == 1024
    assert eff["strip_bwd"] == "rot"
    assert eff["fused_norm_silu"] is True
    assert eff["scan_unroll"] == 2  # +0.8% at 200-step scans, PERF.md round 5
    assert eff["async_save"] is False
    assert eff["gn_affine_bf16"] is False  # experiment knob (PERF.md)
    assert eff["hybrid_scan_unroll"] == 1


def test_gn_affine_bf16_storage_fp32_math():
    """gn_affine_bf16 stores GroupNorm scale/bias in bf16; GroupNorm32
    upcasts at the use site so outputs stay within bf16-rounding of the
    fp32-affine path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from osmosis_tpu.models.convert import cast_params_half
    from osmosis_tpu.models.nn import GroupNorm32

    gn = GroupNorm32(num_groups=4)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    params = gn.init(jax.random.key(1), x)
    # nonzero affines so the cast actually matters
    params = jax.tree_util.tree_map(
        lambda a: a + 0.123 * jnp.arange(a.size, dtype=a.dtype) / a.size, params
    )

    half = cast_params_half({"norm": params["params"]})
    assert half["norm"]["scale"].dtype == jnp.float32  # default: fp32 kept

    perf.set_perf(gn_affine_bf16=True)
    half_b = cast_params_half({"norm": params["params"]})
    assert half_b["norm"]["scale"].dtype == jnp.bfloat16
    out_ref = gn.apply(params, x)
    out_b = gn.apply({"params": half_b["norm"]}, x)
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_ref), rtol=2e-2, atol=2e-2
    )
    assert out_b.dtype == out_ref.dtype


def test_env_overrides_config(monkeypatch):
    perf.set_perf(strip_count=8)
    assert perf.get("strip_count") == 8
    monkeypatch.setenv("OSMOSIS_TPU_STRIP_COUNT", "32")
    assert perf.get("strip_count") == 32  # env wins
    monkeypatch.delenv("OSMOSIS_TPU_STRIP_COUNT")
    assert perf.get("strip_count") == 8  # config resurfaces


def test_bool_env_coercion(monkeypatch):
    monkeypatch.setenv("OSMOSIS_TPU_STRIP_CONV", "0")
    assert perf.get("strip_conv") is False
    monkeypatch.setenv("OSMOSIS_TPU_STRIP_CONV", "1")
    assert perf.get("strip_conv") is True


def test_legacy_bwd_flat_alias(monkeypatch):
    monkeypatch.setenv("OSMOSIS_TPU_STRIP_BWD_FLAT", "1")
    assert perf.get("strip_bwd") == "flat"


def test_configure_from_dict_and_unknown_key():
    perf.configure_from_dict({"scan_unroll": 2, "strip_min_tokens": 4096})
    assert perf.get("scan_unroll") == 2
    assert perf.get("strip_min_tokens") == 4096
    with pytest.raises(KeyError):
        perf.configure_from_dict({"not_a_knob": 1})


def test_nn_getters_follow_config():
    perf.set_perf(strip_conv=False, strip_count=4, strip_min_tokens=99)
    assert onn.strips_enabled() is False
    assert onn.strip_count() == 4
    assert onn.strip_min_tokens() == 99


def test_snapshot_text_lists_every_knob():
    txt = perf.snapshot_text()
    for name in perf._ENV:
        assert f"perf.{name}:" in txt
