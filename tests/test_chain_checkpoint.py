"""Durable mid-chain checkpoint/resume (chain_checkpoint: True).

The reference's resume granularity is the per-image loop; this extension
persists scan-carry state at progress_segments boundaries so a preempted
run continues the interrupted image mid-chain. The key claim is BITWISE
equality with an uninterrupted run (per-step noise is keyed on the
timestep value) — asserted here end-to-end through the production
pipeline with the OSMOSIS_TPU_CRASH_AFTER_SEGMENTS fault-injection hook.
"""

import os
from os.path import join as pjoin

import numpy as np
import pytest
import yaml

from tests.test_pipelines_e2e import DIFFUSION, PATTERN, TINY_UNET, _write_images

from osmosis_tpu.utils.chainjournal import ChainJournal


# ---------------------------------------------------------------- unit tests

def test_journal_roundtrip(tmp_path):
    j = ChainJournal(str(tmp_path), "img_0", "fp-abc")
    res = {"sample": np.arange(6.0).reshape(2, 3), "phi": {"a": np.ones(3)}}
    j.save_chain(0, 0, res)
    j.save_chain(1, 0, {"sample": np.zeros(2)})
    loaded = j.load_chains()
    assert set(loaded) == {(0, 0), (1, 0)}
    np.testing.assert_array_equal(loaded[(0, 0)]["sample"], res["sample"])
    # restored arrays must be WRITABLE (np.frombuffer over immutable bytes
    # would hand resumed runs read-only state — caught in r4 review)
    assert loaded[(0, 0)]["sample"].flags.writeable
    loaded[(0, 0)]["phi"]["a"][0] = 7.0

    state = {"done": 10, "x": np.ones((1, 4)), "traces": {}}
    j.save_partial((1, 0), state)
    assert j.load_partial((1, 0))["done"] == 10
    # a different chain tag must not pick up this partial
    assert j.load_partial((0, 1)) is None
    j.clear_partial()
    assert j.load_partial((1, 0)) is None

    # image done → no residue
    j.save_partial((0, 0), state)
    j.clear()
    assert not os.path.exists(j.dir)


def test_journal_roundtrip_guided_result(tmp_path):
    """The npz+manifest format (no pickle) must round-trip the full
    GuidedResult dataclass, including extension dtypes (bfloat16), tuple
    fields, nested optimizer-state dicts, and None optionals."""
    import ml_dtypes

    from osmosis_tpu.diffusion.guided import GuidedResult

    res = GuidedResult(
        sample=np.ones((1, 4, 4, 4), np.float32),
        pred_xstart=np.zeros((1, 4, 4, 4), ml_dtypes.bfloat16),
        phi={"phi_a": np.full((1, 3), 1.1, np.float32)},
        sep_loss=np.arange(6, dtype=np.float32).reshape(3, 2),
        phi_trace={"phi_a": np.zeros((3, 1, 3), np.float32)},
        aux_trace={},
        x0_std_trace=None,
        opt_state={"m": {"phi_a": np.zeros((1, 3))},
                   "count": np.zeros((), np.int32)},
        x0_snapshots=None,
        eps_hist=(np.ones((1, 2)), np.zeros((1, 2))),
        snapshot_steps=(29, 19, 9),
    )
    j = ChainJournal(str(tmp_path), "img_0", "fp")
    j.save_chain(2, 1, res)
    got = j.load_chains()[(2, 1)]
    assert isinstance(got, GuidedResult)
    np.testing.assert_array_equal(got.sample, res.sample)
    assert got.pred_xstart.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        got.pred_xstart.astype(np.float32), res.pred_xstart.astype(np.float32)
    )
    np.testing.assert_array_equal(got.phi["phi_a"], res.phi["phi_a"])
    assert got.x0_std_trace is None and got.x0_snapshots is None
    assert got.opt_state["count"].dtype == np.int32
    assert isinstance(got.eps_hist, tuple) and len(got.eps_hist) == 2
    assert got.snapshot_steps == (29, 19, 9)
    # the on-disk file must be a real npz loadable with allow_pickle=False
    with np.load(pjoin(j.dir, "chain_2_1.npz"), allow_pickle=False) as z:
        assert "__manifest__" in z


def test_journal_fingerprint_staleness(tmp_path):
    j = ChainJournal(str(tmp_path), "img_0", "fp-old")
    j.save_chain(0, 0, {"v": np.ones(2)})
    j.save_partial((0, 0), {"done": 5})
    # a config change (different fingerprint) must ignore the stale state
    j2 = ChainJournal(str(tmp_path), "img_0", "fp-new")
    assert j2.load_chains() == {}
    assert j2.load_partial((0, 0)) is None
    # corrupt file → treated as absent, not an exception
    with open(pjoin(j.dir, "chain_0_0.npz"), "wb") as f:
        f.write(b"not an npz archive")
    assert j2.load_chains() == {}
    # legacy pickle files (format v1) must be ignored, never unpickled
    import pickle

    with open(pjoin(j.dir, "chain_1_0.npz"), "wb") as f:
        pickle.dump({"version": 1, "fp": "fp-new", "payload": {}}, f)
    assert j2.load_chains() == {}


# ------------------------------------------------------- e2e crash-then-resume

def _cfg(tmp_path, data_dir, tag):
    diffusion = dict(DIFFUSION, steps=30, timestep_respacing=30)
    return dict(
        save_dir=str(tmp_path / f"results_{tag}"),
        degamma_input=False, manual_seed=0, rgb_guidance=False,
        save_singles=True, save_grids=True,
        record_process=True, record_every=10,
        change_input_output_channels=True, input_channels=4, output_channels=8,
        progress_segments=3, chain_checkpoint=True,
        sample_pattern=PATTERN,
        unet_model=TINY_UNET,
        diffusion=diffusion,
        conditioning=dict(
            method="osmosis",
            params=dict(
                loss_function="norm", loss_weight="depth",
                weight_function="gamma,1.4,1.4,1", scale="7,7,7,0.9",
                gradient_x_prev=True, gradient_clip="True,0.005",
            ),
        ),
        aux_loss=dict(aux_loss=dict(avrg_loss=0.5, val_loss=20)),
        data=dict(batch_size=1, name="tiny", root=data_dir,
                  stop_after=1, ground_truth=False),
        measurement=dict(
            operator=dict(
                name="underwater_physical_revised", optimizer="sgd",
                depth_type="gamma", value="1.4,1.4,1",
                phi_a="1.1,0.95,0.95", phi_a_eta=1e-5, phi_a_learn_flag=True,
                phi_b="0.95, 0.8, 0.8", phi_b_eta=1e-5, phi_b_learn_flag=True,
                phi_inf="0.14, 0.29, 0.49", phi_inf_eta=1e-5,
                phi_inf_learn_flag=True,
            ),
            noise=dict(name="clean"),
        ),
    )


def _run(cfg, tmp_path, name, resume=False):
    if resume:
        cfg = dict(cfg, resume=True)
    cfg_path = str(tmp_path / f"{name}.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    from osmosis_tpu.pipelines import run_restoration

    return run_restoration(cfg_path)


def test_crash_then_resume_bitwise(tmp_path):
    data_dir = str(tmp_path / "images")
    _write_images(data_dir, n=1)

    # uninterrupted run (chain checkpointing ON — also asserts the no-crash
    # path leaves no state residue and matches the plain segmented numbers)
    cfg_a = _cfg(tmp_path, data_dir, "a")
    out_a = _run(cfg_a, tmp_path, "cfg_a")
    assert not os.path.exists(pjoin(out_a, ".chain_state"))

    # interrupted run: die after the first boundary save of THIS run
    from osmosis_tpu.pipelines import restore as R

    cfg_b = _cfg(tmp_path, data_dir, "b")
    os.environ["OSMOSIS_TPU_CRASH_AFTER_SEGMENTS"] = str(R._CRASH_SAVES["n"] + 1)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            _run(cfg_b, tmp_path, "cfg_b")
    finally:
        del os.environ["OSMOSIS_TPU_CRASH_AFTER_SEGMENTS"]

    # the durable state exists and the output does not
    res_root = str(tmp_path / "results_b")
    crashed_runs = [
        pjoin(dp, d) for dp, dns, _ in os.walk(res_root) for d in dns
        if d.startswith("run")
    ]
    assert crashed_runs, "crashed run dir missing"
    state_dirs = [
        pjoin(r, ".chain_state", "img_0") for r in crashed_runs
        if os.path.exists(pjoin(r, ".chain_state", "img_0"))
    ]
    assert state_dirs, "no chain state persisted before the crash"

    # resume: re-enters the same run dir, continues mid-chain, finishes
    out_b = _run(cfg_b, tmp_path, "cfg_b_resume", resume=True)
    log = open(pjoin(out_b, "log.txt")).read()
    assert "resuming chain at step" in log
    assert not os.path.exists(pjoin(out_b, ".chain_state"))

    # BITWISE-identical outputs vs the uninterrupted run
    for sub in ("rgb", "depth_raw", "depth_color"):
        pa = pjoin(out_a, "single_images", sub, "img_0.png")
        pb = pjoin(out_b, "single_images", sub, "img_0.png")
        assert open(pa, "rb").read() == open(pb, "rb").read(), sub
    # telemetry traces survive the boundary: the grid strip also matches
    ga = pjoin(out_a, "grid_results", "img_0_process.png")
    gb = pjoin(out_b, "grid_results", "img_0_process.png")
    assert open(ga, "rb").read() == open(gb, "rb").read()


# ------------------------------------------------- fleet (batch>1) durability

def _fleet_ckpt_cfg(tmp_path, data_dir, tag, *, segments=3, checkpoint=True):
    cfg = _cfg(tmp_path, data_dir, tag)
    cfg["data"] = dict(cfg["data"], batch_size=2, stop_after=-1)
    cfg["progress_segments"] = segments
    cfg["chain_checkpoint"] = checkpoint
    # process grids need the serial/fleet-common snapshot buffer
    return cfg


def test_fleet_segmented_matches_unsegmented(tmp_path):
    """progress_segments on the fleet path: the vmapped segment runner must
    reproduce the single-scan fleet run bitwise (per-step noise keyed on the
    timestep value; the per-lane batch-1 carry squeezes through boundaries)."""
    data_dir = str(tmp_path / "images")
    _write_images(data_dir, n=2)

    cfg_a = _fleet_ckpt_cfg(tmp_path, data_dir, "fa", segments=0, checkpoint=False)
    out_a = _run(cfg_a, tmp_path, "cfg_fa")
    cfg_b = _fleet_ckpt_cfg(tmp_path, data_dir, "fb", segments=3, checkpoint=False)
    out_b = _run(cfg_b, tmp_path, "cfg_fb")

    for img in ("img_0", "img_1"):
        for sub in ("rgb", "depth_raw", "depth_color"):
            pa = pjoin(out_a, "single_images", sub, f"{img}.png")
            pb = pjoin(out_b, "single_images", sub, f"{img}.png")
            assert open(pa, "rb").read() == open(pb, "rb").read(), (sub, img)
    # one lane-mean progress row per boundary
    log = open(pjoin(out_b, "log.txt")).read()
    assert log.count("  progress ") == 3


def test_fleet_crash_then_resume_bitwise(tmp_path):
    """chain_checkpoint on the fleet path: a preempted chunk resumes
    MID-CHAIN (whole batched scan state) with bitwise-identical outputs."""
    data_dir = str(tmp_path / "images")
    _write_images(data_dir, n=2)

    cfg_a = _fleet_ckpt_cfg(tmp_path, data_dir, "ga")
    out_a = _run(cfg_a, tmp_path, "cfg_ga")
    assert not os.path.exists(pjoin(out_a, ".chain_state"))

    from osmosis_tpu.pipelines import restore as R

    cfg_b = _fleet_ckpt_cfg(tmp_path, data_dir, "gb")
    os.environ["OSMOSIS_TPU_CRASH_AFTER_SEGMENTS"] = str(R._CRASH_SAVES["n"] + 1)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            _run(cfg_b, tmp_path, "cfg_gb")
    finally:
        del os.environ["OSMOSIS_TPU_CRASH_AFTER_SEGMENTS"]

    # durable chunk state exists; no image output was written
    res_root = str(tmp_path / "results_gb")
    crashed_runs = [
        pjoin(dp, d) for dp, dns, _ in os.walk(res_root) for d in dns
        if d.startswith("run")
    ]
    assert crashed_runs
    state_dirs = [
        pjoin(r, ".chain_state", "chunk_00000") for r in crashed_runs
        if os.path.exists(pjoin(r, ".chain_state", "chunk_00000"))
    ]
    assert state_dirs, "no fleet chunk state persisted before the crash"

    out_b = _run(cfg_b, tmp_path, "cfg_gb_resume", resume=True)
    log = open(pjoin(out_b, "log.txt")).read()
    assert "resuming chain at step" in log
    assert not os.path.exists(pjoin(out_b, ".chain_state"))

    for img in ("img_0", "img_1"):
        for sub in ("rgb", "depth_raw", "depth_color"):
            pa = pjoin(out_a, "single_images", sub, f"{img}.png")
            pb = pjoin(out_b, "single_images", sub, f"{img}.png")
            assert open(pa, "rb").read() == open(pb, "rb").read(), (sub, img)
        ga = pjoin(out_a, "grid_results", f"{img}_process.png")
        gb = pjoin(out_b, "grid_results", f"{img}_process.png")
        assert open(ga, "rb").read() == open(gb, "rb").read()
