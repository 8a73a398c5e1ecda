"""e2e smoke for the remaining capability presets: simulation (GT grids),
haze (degamma + scalar phi_ab), DDIM respacing."""

import os
from os.path import join as pjoin

import numpy as np
import pytest
import yaml
from PIL import Image

from tests.test_pipelines_e2e import DIFFUSION, PATTERN, TINY_UNET


def _write_images(d, n=1, size=40, dtype=np.uint8, depth=False):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(42)
    names = []
    for i in range(n):
        if depth:
            arr = rng.integers(0, 65535, (size, size), dtype=np.uint16)
            import cv2

            path = pjoin(d, f"img_{i}.png")
            cv2.imwrite(path, arr)
        else:
            arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            path = pjoin(d, f"img_{i}.png")
            Image.fromarray(arr).save(path)
        names.append(path)
    return names


def test_simulation_gt_pipeline(tmp_path):
    root = str(tmp_path / "input")
    gt_rgb = str(tmp_path / "gt_rgb")
    gt_depth = str(tmp_path / "gt_depth")
    _write_images(root)
    _write_images(gt_rgb)
    _write_images(gt_depth, depth=True)  # uint16 depth handling (data.py:93-98)

    cfg = dict(
        save_dir=str(tmp_path / "results"),
        degamma_input=False, manual_seed=0, rgb_guidance=False,
        save_singles=True, save_grids=True,
        record_process=False, record_every=20,
        sample_pattern=PATTERN, unet_model=TINY_UNET, diffusion=DIFFUSION,
        conditioning=dict(
            method="osmosis",
            params=dict(
                loss_function="norm", loss_weight="depth",
                weight_function="gamma,1.4,1.4,1", scale="4,4,4,1",
                gradient_x_prev=True, gradient_clip="True,0.001",
            ),
        ),
        aux_loss=dict(aux_loss=dict(val_loss=40)),
        data=dict(batch_size=1, name="simulation", root=root,
                  gt_rgb=gt_rgb, gt_depth=gt_depth,
                  stop_after=-1, ground_truth=True),
        measurement=dict(
            operator=dict(
                name="underwater_physical", optimizer="sgd",
                depth_type="original", value="1.4,1.4,1",
                phi_ab="1.1,0.95,0.95", phi_ab_eta=1e-5, phi_ab_learn_flag=True,
                phi_inf="0.2,0.4,0.7", phi_inf_eta=1e-5, phi_inf_learn_flag=True,
            ),
            noise=dict(name="clean"),
        ),
    )
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    from osmosis_tpu.pipelines import run_restoration

    out = run_restoration(cfg_path)
    assert os.path.exists(pjoin(out, "single_images", "rgb", "img_0.png"))
    # GT grid has 6 panels (3 + zeros + gt rgb + gt depth)
    grid = np.asarray(Image.open(pjoin(out, "grid_results", "img_0_g0_grid.png")))
    assert grid.shape[1] > 3 * 32  # 3-wide grid
    log = open(pjoin(out, "log.txt")).read()
    assert "phi_ab" in log


def _fleet_cfg(tmp_path, root, batch_size, *, noise=None, gt=None, global_N=1,
               resume=False, subdir="results", pattern_extra=None,
               optimizer=("sgd", 1e-5), degamma=False):
    data = dict(batch_size=batch_size, name="fleetpar", root=root,
                stop_after=-1, ground_truth=gt is not None)
    if gt is not None:
        data.update(gt_rgb=gt[0], gt_depth=gt[1])
    cfg = dict(
        save_dir=str(tmp_path / subdir),
        degamma_input=degamma, manual_seed=0, rgb_guidance=False,
        save_singles=True, save_grids=gt is not None,
        record_process=False, record_every=20,
        resume=resume,
        sample_pattern=dict(PATTERN, global_N=global_N, **(pattern_extra or {})),
        unet_model=TINY_UNET, diffusion=DIFFUSION,
        conditioning=dict(
            method="osmosis",
            params=dict(
                loss_function="norm", loss_weight="depth",
                weight_function="gamma,1.4,1.4,1", scale="7,7,7,0.9",
                gradient_x_prev=True, gradient_clip="True,0.005",
            ),
        ),
        aux_loss=dict(aux_loss=dict(avrg_loss=0.5, val_loss=20)),
        data=data,
        measurement=dict(
            operator=dict(
                name="underwater_physical_revised", optimizer=optimizer[0],
                depth_type="gamma", value="1.4,1.4,1",
                phi_a="1.1,0.95,0.95", phi_a_eta=optimizer[1],
                phi_a_learn_flag=True,
                phi_b="0.95, 0.8, 0.8", phi_b_eta=optimizer[1],
                phi_b_learn_flag=True,
                phi_inf="0.14, 0.29, 0.49", phi_inf_eta=optimizer[1],
                phi_inf_learn_flag=True,
            ),
            noise=noise or dict(name="clean"),
        ),
    )
    cfg_path = str(tmp_path / f"cfg_{subdir}.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    return cfg_path


def test_fleet_matches_serial_with_gaussian_noise(tmp_path):
    """Fleet mode must reproduce the serial path per image — including the
    per-image measurement-noise stream (fold_in(key(seed+1), image_index)),
    which round 1 shared across chunks (ADVICE.md)."""
    from osmosis_tpu.pipelines import run_restoration

    root = str(tmp_path / "imgs")
    _write_images(root, n=3)
    noise = dict(name="gaussian", sigma=0.05)

    out_serial = run_restoration(_fleet_cfg(tmp_path, root, 1, noise=noise,
                                            subdir="serial"))
    out_fleet = run_restoration(_fleet_cfg(tmp_path, root, 2, noise=noise,
                                           subdir="fleet"))
    for i in range(3):
        a = np.asarray(Image.open(pjoin(out_serial, "single_images", "rgb", f"img_{i}.png")), dtype=np.int16)
        b = np.asarray(Image.open(pjoin(out_fleet, "single_images", "rgb", f"img_{i}.png")), dtype=np.int16)
        assert np.abs(a - b).max() <= 1, f"fleet diverged from serial on img_{i}"
    # tail chunk (3 images / batch 2) ran unpadded
    log = open(pjoin(out_fleet, "log.txt")).read()
    assert "tail chunk of 1 images" in log
    # fleet writes the same per-image progress rows as the serial path
    # (image, final_loss, per-channel phi — consumed by evaluate --manifest)
    import json as _json

    rows = [_json.loads(l) for l in open(pjoin(out_fleet, "progress.json"))]
    assert sorted(r["image"] for r in rows) == [f"img_{i}.png" for i in range(3)]
    srows = [_json.loads(l) for l in open(pjoin(out_serial, "progress.json"))]
    by_img = {r["image"]: r for r in srows}
    for r in rows:
        s = by_img[r["image"]]
        assert np.isclose(r["final_loss"], s["final_loss"], rtol=1e-5)
        for k in r:
            if k.startswith("phi_"):
                assert np.isclose(r[k], s[k], atol=2e-6), (k, r[k], s[k])


def test_fleet_matches_serial_with_degamma_and_noise(tmp_path):
    """Review r4: the fleet path applied degamma BEFORE the measurement
    noise while the serial path (and the reference, osmosis_sampling.py:
    170-175) noises first then degammas — with both knobs on, fleet lanes
    guided against a different measurement than serial."""
    from osmosis_tpu.pipelines import run_restoration

    root = str(tmp_path / "imgs")
    _write_images(root, n=2)
    noise = dict(name="gaussian", sigma=0.05)

    out_serial = run_restoration(_fleet_cfg(tmp_path, root, 1, noise=noise,
                                            degamma=True, subdir="serial_dg"))
    out_fleet = run_restoration(_fleet_cfg(tmp_path, root, 2, noise=noise,
                                           degamma=True, subdir="fleet_dg"))
    for i in range(2):
        a = np.asarray(Image.open(pjoin(out_serial, "single_images", "rgb",
                                        f"img_{i}.png")), dtype=np.int16)
        b = np.asarray(Image.open(pjoin(out_fleet, "single_images", "rgb",
                                        f"img_{i}.png")), dtype=np.int16)
        assert np.abs(a - b).max() <= 1, (
            f"fleet degamma+noise diverged from serial on img_{i}")


def test_fleet_gt_resume_global_n(tmp_path):
    """Fleet first-class features: GT grids, resume skip, global_N>1 warm
    starts (one output per global iteration, as in the serial path)."""
    from osmosis_tpu.pipelines import run_restoration

    root = str(tmp_path / "in")
    gt_rgb = str(tmp_path / "gtr")
    gt_depth = str(tmp_path / "gtd")
    _write_images(root, n=3)
    _write_images(gt_rgb, n=3)
    _write_images(gt_depth, n=3, depth=True)

    cfg_path = _fleet_cfg(tmp_path, root, 2, gt=(gt_rgb, gt_depth),
                          global_N=2, resume=True, subdir="gtfleet")
    out = run_restoration(cfg_path)
    for i in range(3):
        assert os.path.exists(pjoin(out, "single_images", "rgb", f"img_{i}.png"))
        # one grid per global iteration, GT panels included
        for g in range(2):
            assert os.path.exists(pjoin(out, "grid_results", f"img_{i}_g{g}_grid.png"))
    log = open(pjoin(out, "log.txt")).read()
    assert "global iteration: 1" in log

    # resume: a second run re-enters the same run dir and skips every image
    out2 = run_restoration(cfg_path)
    assert out2 == out
    log2 = open(pjoin(out, "log.txt")).read()
    assert log2.count("skipping image") >= 3


def test_best_of_nan_lane_displacement():
    """_better_loss: a NaN-seeded best lane must be displaced by any later
    finite trial (plain `<` never fires against NaN — ADVICE r3), while a
    NaN challenger never displaces a finite best."""
    from osmosis_tpu.pipelines.restore import _better_loss

    nan = float("nan")
    assert _better_loss(1.0, None)          # trial 0 always seeds
    assert _better_loss(nan, None)          # even a NaN trial 0 seeds
    assert _better_loss(0.5, 1.0)
    assert not _better_loss(2.0, 1.0)
    assert _better_loss(2.0, nan)           # finite displaces NaN
    assert not _better_loss(nan, 1.0)       # NaN never wins over finite
    assert not _better_loss(nan, nan)


def test_best_of_restarts(tmp_path):
    """best_of: K (extension, default 1): loss-selected seed restarts. The
    kept chain's loss must be the min of the logged restart losses, and the
    saved output must match a single-chain run at the kept restart's seed."""
    import re
    import yaml as _y

    from osmosis_tpu.pipelines import run_restoration

    root = str(tmp_path / "imgs")
    _write_images(root, n=1)

    p = _fleet_cfg(tmp_path, root, 1, subdir="bestof")
    cfg = _y.safe_load(open(p))
    cfg["best_of"] = 2
    _y.dump(cfg, open(p, "w"))
    out = run_restoration(p)
    log = open(pjoin(out, "log.txt")).read()
    losses = [float(m) for m in re.findall(r"restart \d+: final loss ([\d.]+)", log)]
    kept = float(re.search(r"kept restart with final loss ([\d.]+)", log).group(1))
    assert len(losses) == 2
    assert kept == min(losses)

    # reproduce the kept chain: a best_of=1 run with manual_seed shifted by
    # 7919*k for the kept k must produce the identical output PNG
    kept_k = losses.index(kept)
    p1 = _fleet_cfg(tmp_path, root, 1, subdir="single")
    cfg1 = _y.safe_load(open(p1))
    cfg1["manual_seed"] = 0 + 7919 * kept_k
    _y.dump(cfg1, open(p1, "w"))
    out1 = run_restoration(p1)
    a = np.asarray(Image.open(pjoin(out, "single_images", "rgb", "img_0.png")))
    b = np.asarray(Image.open(pjoin(out1, "single_images", "rgb", "img_0.png")))
    assert np.array_equal(a, b)


def test_best_of_accept_loss_and_jitter(tmp_path):
    """accept_loss stops restarting once satisfied (trial 0 accepts at a
    huge threshold); phi_jitter>0 makes trial-1 chains differ from the
    unjittered restart."""
    import re
    import yaml as _y

    from osmosis_tpu.pipelines import run_restoration

    root = str(tmp_path / "imgs")
    _write_images(root, n=1)

    # accept on trial 0 -> exactly one restart logged
    p = _fleet_cfg(tmp_path, root, 1, subdir="accept")
    cfg = _y.safe_load(open(p))
    cfg["best_of"] = 3
    cfg["accept_loss"] = 1e9
    _y.dump(cfg, open(p, "w"))
    out = run_restoration(p)
    log = open(pjoin(out, "log.txt")).read()
    assert len(re.findall(r"restart \d+: final loss", log)) == 1

    # jittered restarts: trial 1 phi must differ from the unjittered trial 1
    def final_phi(subdir, jitter):
        p2 = _fleet_cfg(tmp_path, root, 1, subdir=subdir)
        c2 = _y.safe_load(open(p2))
        c2["best_of"] = 2
        c2["phi_jitter"] = jitter
        _y.dump(c2, open(p2, "w"))
        o = run_restoration(p2)
        lg = open(pjoin(o, "log.txt")).read()
        return re.findall(r"restart \d+: final loss ([\d.eE+-]+)", lg)

    a = final_phi("nojit", 0.0)
    b = final_phi("jit", 0.2)
    assert len(a) == 2 and len(b) == 2
    assert a[0] == b[0], "trial 0 must be jitter-free"
    assert a[1] != b[1], "phi_jitter had no effect on trial 1"


def test_fleet_best_of_matches_serial(tmp_path):
    """best_of / phi_jitter / accept_loss run on the FLEET path too (round-2
    verdict #5): per-lane loss-selected restarts must reproduce the serial
    best_of result for every image (trial seeds and phi jitter are
    image-independent in both paths), and accept_loss must stop a chunk's
    restarts once every lane is under threshold."""
    import re

    import yaml as _y

    from osmosis_tpu.pipelines import run_restoration

    root = str(tmp_path / "imgs")
    _write_images(root, n=3)

    def _with(p, **kv):
        c = _y.safe_load(open(p))
        c.update(kv)
        _y.dump(c, open(p, "w"))
        return p

    out_serial = run_restoration(_with(
        _fleet_cfg(tmp_path, root, 1, subdir="serialbo"),
        best_of=2, phi_jitter=0.1,
    ))
    out_fleet = run_restoration(_with(
        _fleet_cfg(tmp_path, root, 2, subdir="fleetbo"),
        best_of=2, phi_jitter=0.1,
    ))
    for i in range(3):
        a = np.asarray(Image.open(pjoin(out_serial, "single_images", "rgb", f"img_{i}.png")), dtype=np.int16)
        b = np.asarray(Image.open(pjoin(out_fleet, "single_images", "rgb", f"img_{i}.png")), dtype=np.int16)
        assert np.abs(a - b).max() <= 1, f"fleet best_of diverged on img_{i}"

    log = open(pjoin(out_fleet, "log.txt")).read()
    assert re.search(r"restart 1: final losses \[", log)
    assert re.search(r"kept restarts with final losses \[", log)

    # accept_loss: a huge threshold accepts every lane on trial 0 — exactly
    # one restart line per chunk (3 images / batch 2 -> 2 chunks)
    out_acc = run_restoration(_with(
        _fleet_cfg(tmp_path, root, 2, subdir="fleetacc"),
        best_of=3, accept_loss=1e9,
    ))
    log_acc = open(pjoin(out_acc, "log.txt")).read()
    assert len(re.findall(r"restart \d+: final losses", log_acc)) == 2


def test_haze_degamma_ddim_pipeline(tmp_path):
    root = str(tmp_path / "haze")
    _write_images(root)
    diffusion = dict(DIFFUSION, sampler="ddim", timestep_respacing="ddim10")
    cfg = dict(
        save_dir=str(tmp_path / "results"),
        degamma_input=True, manual_seed=0, rgb_guidance=False,
        save_singles=True, save_grids=False,
        record_process=False, record_every=20,
        sample_pattern=dict(PATTERN, n_iter=2),
        unet_model=TINY_UNET, diffusion=diffusion,
        conditioning=dict(
            method="osmosis",
            params=dict(
                loss_function="mse", loss_weight="none",
                weight_function="gamma,1.4,1.4,1", scale="7,7,7,0.9",
                gradient_x_prev=True, gradient_clip="True,0.005",
            ),
        ),
        aux_loss=dict(aux_loss=dict(avrg_loss=0.5, val_loss=20)),
        data=dict(batch_size=1, name="haze", root=root,
                  stop_after=-1, ground_truth=False),
        measurement=dict(
            operator=dict(
                name="haze_physical", optimizer="sgd",
                depth_type="gamma", value="1.4,1.4,1",
                phi_inf="0.14, 0.29, 0.49", phi_inf_eta=1e-5, phi_inf_learn_flag=True,
                phi_ab=1.0, phi_ab_eta=1e-5, phi_ab_learn_flag=True,
            ),
            noise=dict(name="clean"),
        ),
    )
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    from osmosis_tpu.pipelines import run_restoration

    out = run_restoration(cfg_path)
    assert os.path.exists(pjoin(out, "single_images", "rgb", "img_0.png"))
    log = open(pjoin(out, "log.txt")).read()
    assert "phi_ab" in log and "phi_inf" in log


def test_global_eta_scale_pipeline(tmp_path):
    """sample_pattern.global_eta_scale (extension): chain ii runs with phi
    etas * scale**ii as a TRACED scalar. At scale=0.0 chain 2's phi must
    equal chain 1's final phi bitwise (frozen donor); at the default the
    warm chain keeps moving. Locks both the serial and fleet wiring."""
    from osmosis_tpu.pipelines import run_restoration

    root = str(tmp_path / "in")
    _write_images(root, n=2)

    def phi_lines(out):
        # one "phi_a: [..]" results line per (image, global iteration)
        log = open(pjoin(out, "log.txt")).read()
        return [ln for ln in log.splitlines()
                if ln.startswith("phi_a: [") and "lr:" not in ln]

    # serial path (batch 1), frozen chain 2
    cfg = _fleet_cfg(tmp_path, root, 1, global_N=2, subdir="etaser",
                     pattern_extra=dict(global_eta_scale=0.0),
                     optimizer=("adam", 1e-3))
    out = run_restoration(cfg)
    lines = phi_lines(out)
    assert len(lines) == 4  # 2 images x 2 global iterations
    assert lines[0] == lines[1] and lines[2] == lines[3]

    # fleet path (batch 2), frozen chain 2
    cfg = _fleet_cfg(tmp_path, root, 2, global_N=2, subdir="etaflt",
                     pattern_extra=dict(global_eta_scale=0.0),
                     optimizer=("adam", 1e-3))
    out = run_restoration(cfg)
    lines = phi_lines(out)
    assert len(lines) == 4
    # fleet logs per global iteration: [img0_g0, img1_g0, img0_g1, img1_g1]
    assert sorted(lines[:2]) == sorted(lines[2:])

    # control: default scale, warm chain 2 must keep moving
    cfg = _fleet_cfg(tmp_path, root, 1, global_N=2, subdir="etactl",
                     optimizer=("adam", 1e-3))
    out = run_restoration(cfg)
    lines = phi_lines(out)
    assert len(lines) == 4
    assert lines[0] != lines[1]


def test_progress_segments_matches_single_scan(tmp_path):
    """progress_segments: N (extension): the chain runs as N jitted segment
    calls with a progress line after each — outputs must be IDENTICAL to the
    single-scan run (guided.py keys per-step noise on the timestep value, so
    segmentation is bitwise-neutral)."""
    import yaml as _y

    from osmosis_tpu.pipelines import run_restoration

    root = str(tmp_path / "imgs")
    _write_images(root, n=1)

    out_plain = run_restoration(_fleet_cfg(tmp_path, root, 1, subdir="onescan"))

    p = _fleet_cfg(tmp_path, root, 1, subdir="segmented")
    cfg = _y.safe_load(open(p))
    cfg["progress_segments"] = 4
    _y.dump(cfg, open(p, "w"))
    out_seg = run_restoration(p)

    a = np.asarray(Image.open(pjoin(out_plain, "single_images", "rgb", "img_0.png")))
    b = np.asarray(Image.open(pjoin(out_seg, "single_images", "rgb", "img_0.png")))
    assert np.array_equal(a, b)
    log = open(pjoin(out_seg, "log.txt")).read()
    # one progress row per segment, and the final row covers the whole chain
    T = DIFFUSION["steps"]
    assert log.count("  progress ") == 4
    assert f"progress   {T}/{T} steps (t=0)" in log


def test_async_save_matches_sync(tmp_path):
    """perf: async_save=true (extension): the device fetch stays on the main
    thread; only the host postprocess/PNG work moves to the worker. Outputs
    must be byte-identical to the synchronous path and all run-dir files
    must exist after run_restoration returns (the pipeline joins the worker
    before closing the logger)."""
    import yaml as _y

    from osmosis_tpu import perf
    from osmosis_tpu.pipelines import run_restoration

    root = str(tmp_path / "imgs")
    _write_images(root, n=2)

    out_sync = run_restoration(_fleet_cfg(tmp_path, root, 1, subdir="syncsave"))

    p = _fleet_cfg(tmp_path, root, 1, subdir="asyncsave")
    cfg = _y.safe_load(open(p))
    cfg["perf"] = dict(async_save=True)
    _y.dump(cfg, open(p, "w"))
    try:
        out_async = run_restoration(p)
    finally:
        perf.set_perf(async_save=False)  # module-level singleton

    for name in ("img_0.png", "img_1.png"):
        for sub in ("rgb", "depth_color", "depth_raw", "input"):
            a = np.asarray(Image.open(pjoin(out_sync, "single_images", sub, name)))
            b = np.asarray(Image.open(pjoin(out_async, "single_images", sub, name)))
            assert np.array_equal(a, b), (sub, name)
    # per-image telemetry from the worker still lands in the log
    log = open(pjoin(out_async, "log.txt")).read()
    assert log.count("Run time:") == 2
