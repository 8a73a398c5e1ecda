"""Smoke test for the toy e2e quality-validation harness itself
(tools/validate_toy_e2e.py): tiny toy arch, random weights, 10 respaced
steps — asserts the full protocol (synth scene -> degrade with known phi ->
guided restoration -> metrics JSON) runs and reports sane fields. Random
weights cannot restore, so pass=false and the triage hint must print."""

import importlib.util
import json
import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(__file__), "..", relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_validator_smoke(tmp_path, capsys, monkeypatch):
    ttp = _load("tools/train_toy_prior.py", "ttp_smoke")
    from osmosis_tpu.models import UNetModel
    from osmosis_tpu.models.convert import save_params_msgpack

    cfg = ttp.toy_unet_config(32, 32, "toy")
    params = jax.jit(UNetModel(cfg).init)(
        jax.random.key(0),
        jax.numpy.zeros((1, 32, 32, 4)), jax.numpy.zeros((1,)),
    )
    ckpt = str(tmp_path / "rand.msgpack")
    save_params_msgpack(jax.device_get(params), ckpt)

    vte = _load("tools/validate_toy_e2e.py", "vte_smoke")
    monkeypatch.setattr(sys, "argv", [
        "validate_toy_e2e.py", "--checkpoint", ckpt, "--size", "32",
        "--channels", "32", "--arch", "toy", "--scenes", "1",
        "--respacing", "10", "--n-iter", "2",
    ])
    rc = vte.main()
    out = capsys.readouterr()
    report = json.loads(out.out.strip().splitlines()[-1])
    assert report["scenes"][0]["scene"] == 0
    assert "psnr_gain_db" in report and "depth_corr_mean" in report
    # random weights can't restore: the harness must say so, exit nonzero,
    # and point at the prior-calibration triage
    assert report["pass"] is False and rc == 1
    assert "check_prior_stats" in out.err
