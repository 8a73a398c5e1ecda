"""2-process multi-host integration test (jax.distributed over CPU).

The TPU-native replacement for the reference's nonexistent distribution
(SURVEY.md section 2.7): two real OS processes initialize a JAX cluster,
run the SAME restoration pipeline, stride the image set between them into
one shared run dir, and all-gather scalars across hosts.
"""

import json
import os
import socket
import subprocess
import sys
import time
from os.path import join as pjoin

import numpy as np
import pytest
import yaml
from PIL import Image

from tests.test_pipelines_e2e import DIFFUSION, PATTERN, TINY_UNET

REPO = os.path.abspath(pjoin(os.path.dirname(__file__), ".."))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_restore_cfg(root, steps=50, respacing=10, resume=False,
                      batch_size=1, **extra):
    return dict(
        save_dir="unused",
        degamma_input=False, manual_seed=0, rgb_guidance=False,
        save_singles=True, save_grids=False,
        record_process=False, record_every=20,
        resume=resume,
        **extra,
        sample_pattern=PATTERN,
        unet_model=TINY_UNET,
        diffusion=dict(DIFFUSION, steps=steps, timestep_respacing=respacing),
        conditioning=dict(
            method="osmosis",
            params=dict(
                loss_function="norm", loss_weight="depth",
                weight_function="gamma,1.4,1.4,1", scale="7,7,7,0.9",
                gradient_x_prev=True, gradient_clip="True,0.005",
            ),
        ),
        aux_loss=dict(aux_loss=dict(avrg_loss=0.5, val_loss=20)),
        data=dict(batch_size=batch_size, name="mh", root=root,
                  stop_after=-1, ground_truth=False),
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


def _write_dataset(root, n, size=40):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        ).save(pjoin(root, f"img_{i}.png"))


def _launch_workers(n, tmp_path, mode="restore", crash_after=0, env_extra=None):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)  # 1 local device per process
    if env_extra:
        env.update(env_extra)
    args_tail = [mode] + ([str(crash_after)] if crash_after else [])
    return [
        subprocess.Popen(
            [sys.executable, "-m", "tests.multihost_worker",
             coordinator, str(n), str(pid), str(tmp_path)] + args_tail,
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(n)
    ]


def _drain(procs, budget=540):
    outs = []
    deadline = time.time() + budget
    for p in procs:
        timeout = max(10, deadline - time.time())
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    return outs


@pytest.mark.timeout(600)
def test_two_process_multihost_restoration(tmp_path):
    root = str(tmp_path / "imgs")
    os.makedirs(root)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(pjoin(root, f"img_{i}.png"))

    cfg = dict(
        save_dir="unused",
        degamma_input=False, manual_seed=0, rgb_guidance=False,
        save_singles=True, save_grids=False,
        record_process=False, record_every=20,
        sample_pattern=PATTERN,
        unet_model=TINY_UNET,
        diffusion=dict(DIFFUSION, steps=50, timestep_respacing=10),
        conditioning=dict(
            method="osmosis",
            params=dict(
                loss_function="norm", loss_weight="depth",
                weight_function="gamma,1.4,1.4,1", scale="7,7,7,0.9",
                gradient_x_prev=True, gradient_clip="True,0.005",
            ),
        ),
        aux_loss=dict(aux_loss=dict(avrg_loss=0.5, val_loss=20)),
        data=dict(batch_size=1, name="mh", root=root,
                  stop_after=-1, ground_truth=False),
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
    with open(pjoin(str(tmp_path), "cfg.yaml"), "w") as f:
        yaml.dump(cfg, f)

    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)  # 1 local device per process
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.multihost_worker",
             coordinator, "2", str(pid), str(tmp_path)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    deadline = time.time() + 540
    for p in procs:
        timeout = max(10, deadline - time.time())
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out

    r0 = json.load(open(pjoin(str(tmp_path), "report_0.json")))
    r1 = json.load(open(pjoin(str(tmp_path), "report_1.json")))
    assert r0["process_count"] == 2 and r1["process_count"] == 2
    assert r0["global_devices"] == 2
    # both ranks joined the SAME run dir
    assert r0["run_dir"] == r1["run_dir"]
    # all 3 images restored exactly once across the two hosts
    assert r0["outputs"] == ["img_0.png", "img_1.png", "img_2.png"]
    # rank-suffixed log files from both processes in the shared dir
    assert "log.txt" in r0["log_files"] and "log-rank001.txt" in r0["log_files"]
    # gather saw both ranks
    assert sorted(r0["gathered_ranks"]) == [0.0, 1.0]
    assert sorted(r1["gathered_ranks"]) == [0.0, 1.0]


@pytest.mark.timeout(900)
def test_four_process_multihost_restoration(tmp_path):
    """4-process cluster, 5 images: every image restored exactly once, all
    ranks join one run dir, rank-suffixed logs from every process."""
    root = str(tmp_path / "imgs")
    _write_dataset(root, 5)
    cfg = _make_restore_cfg(root, steps=50, respacing=5)
    with open(pjoin(str(tmp_path), "cfg.yaml"), "w") as f:
        yaml.dump(cfg, f)

    procs = _launch_workers(4, tmp_path)
    outs = _drain(procs, budget=840)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out

    reports = [
        json.load(open(pjoin(str(tmp_path), f"report_{pid}.json")))
        for pid in range(4)
    ]
    assert all(r["process_count"] == 4 for r in reports)
    assert len({r["run_dir"] for r in reports}) == 1
    assert reports[0]["outputs"] == [f"img_{i}.png" for i in range(5)]
    for suffix in ("log.txt", "log-rank001.txt", "log-rank002.txt",
                   "log-rank003.txt"):
        assert suffix in reports[0]["log_files"], reports[0]["log_files"]
    for r in reports:
        assert sorted(r["gathered_ranks"]) == [0.0, 1.0, 2.0, 3.0]


@pytest.mark.timeout(600)
def test_two_process_multihost_prior(tmp_path):
    """Prior sampling under multi-host: sample indices stride across hosts
    into one shared run dir — every index sampled exactly once."""
    cfg = dict(
        save_dir="unused",
        number_of_images=4, manual_seed=4321,
        save_singles=True, save_grids=False,
        record_process=False, record_every=20,
        unet_model=TINY_UNET,
        diffusion=dict(DIFFUSION, steps=50, timestep_respacing=10),
    )
    with open(pjoin(str(tmp_path), "prior_cfg.yaml"), "w") as f:
        yaml.dump(cfg, f)

    procs = _launch_workers(2, tmp_path, mode="prior")
    outs = _drain(procs)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out

    r0 = json.load(open(pjoin(str(tmp_path), "report_prior_0.json")))
    r1 = json.load(open(pjoin(str(tmp_path), "report_prior_1.json")))
    assert r0["run_dir"] == r1["run_dir"]
    assert r0["outputs"] == [f"image_{i}.png" for i in range(4)]
    assert sorted(r0["gathered_ranks"]) == [0.0, 1.0]
    assert sorted(r1["gathered_ranks"]) == [0.0, 1.0]


@pytest.mark.timeout(1500)
def test_multihost_fleet_chain_checkpoint_crash_resume(tmp_path):
    """Fleet × multihost composition (VERDICT r3 weak #5): 2 CPU processes ×
    batch_size=2 fleet over 6 images with chain_checkpoint: True. Both ranks
    are killed MID-CHUNK at a segment boundary via the chainjournal fault
    injection, the job is relaunched with resume: True (rank-local chunk
    journals resume the interrupted batched chains), and the outputs must be
    bitwise-identical to an uninterrupted control run."""
    root = str(tmp_path / "imgs")
    _write_dataset(root, 6)
    kw = dict(steps=50, respacing=10, batch_size=2,
              chain_checkpoint=True, progress_segments=3)
    with open(pjoin(str(tmp_path), "cfg.yaml"), "w") as f:
        yaml.dump(_make_restore_cfg(root, **kw), f)
    with open(pjoin(str(tmp_path), "cfg_resume.yaml"), "w") as f:
        yaml.dump(_make_restore_cfg(root, resume=True, **kw), f)

    # phase 1: each rank dies at its 2nd segment-boundary save — mid-chunk,
    # before any image output — or from noticing the dead coordinator
    procs = _launch_workers(
        2, tmp_path, mode="seg_crash",
        env_extra={"OSMOSIS_TPU_CRASH_AFTER_SEGMENTS": "2"},
    )
    outs = _drain(procs)
    assert all(p.returncode != 0 for p in procs), [o[-2000:] for o in outs]
    assert any("WORKER_CRASH" in o for o in outs)

    results_root = pjoin(str(tmp_path), "results")
    partials = [
        pjoin(d, f) for d, _, fs in os.walk(results_root)
        for f in fs if f == "partial.npz"
    ]
    assert partials, "no mid-chain chunk journal state was persisted"
    # nothing was fully restored before the crash
    rgb_dirs = [d for d, _, _ in os.walk(results_root)
                if d.endswith(pjoin("single_images", "rgb"))]
    saved = sorted(f for d in rgb_dirs for f in os.listdir(d))
    assert len(saved) < 6, saved

    # phase 2: fresh cluster, resume — chunk journals continue mid-chain
    procs = _launch_workers(2, tmp_path, mode="resume")
    outs = _drain(procs, budget=840)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"resume worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out
    r0 = json.load(open(pjoin(str(tmp_path), "report_resume_0.json")))
    r1 = json.load(open(pjoin(str(tmp_path), "report_resume_1.json")))
    assert r0["run_dir"] == r1["run_dir"]
    assert r0["outputs"] == [f"img_{i}.png" for i in range(6)]
    logs = ""
    for f in os.listdir(r0["run_dir"]):
        if f.startswith("log"):
            logs += open(pjoin(r0["run_dir"], f)).read()
    assert ("resuming chain at step" in logs
            or "restored from a previous run" in logs), logs[-2000:]
    # durable state cleaned up once every chunk finished
    assert not os.path.exists(pjoin(r0["run_dir"], ".chain_state"))

    # phase 3: uninterrupted control run in its own results root
    procs = _launch_workers(2, tmp_path, mode="clean")
    outs = _drain(procs, budget=840)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"clean worker {pid} failed:\n{out[-4000:]}"
    rc0 = json.load(open(pjoin(str(tmp_path), "report_clean_0.json")))
    assert rc0["outputs"] == r0["outputs"]

    # bitwise: resumed multihost fleet == uninterrupted multihost fleet
    for sub in ("rgb", "depth_raw"):
        a_dir = pjoin(r0["run_dir"], "single_images", sub)
        b_dir = pjoin(rc0["run_dir"], "single_images", sub)
        for name in sorted(os.listdir(a_dir)):
            a = np.asarray(Image.open(pjoin(a_dir, name)))
            b = np.asarray(Image.open(pjoin(b_dir, name)))
            np.testing.assert_array_equal(a, b, err_msg=f"{sub}/{name}")


@pytest.mark.timeout(900)
def test_multihost_crash_then_resume(tmp_path):
    """Failure/resume contract (SURVEY section 5): a 2-process run is
    hard-killed mid-job (every rank os._exits after saving its first image,
    leaving 2 of 4 images on disk), then the job is RE-LAUNCHED with
    ``resume: True`` — the new cluster re-enters the same run dir, skips
    the finished images, and completes the stragglers with no duplicates."""
    root = str(tmp_path / "imgs")
    _write_dataset(root, 4)
    with open(pjoin(str(tmp_path), "cfg.yaml"), "w") as f:
        yaml.dump(_make_restore_cfg(root, steps=50, respacing=5), f)
    with open(pjoin(str(tmp_path), "cfg_resume.yaml"), "w") as f:
        yaml.dump(_make_restore_cfg(root, steps=50, respacing=5, resume=True), f)

    # phase 1: rank 0 hard-exits (17) right after its first saved image;
    # the OTHER rank either reaches its own crash point (17) or is killed
    # by the JAX distributed runtime when it notices the dead coordinator
    # (exit 1, "detected fatal errors") — both are real failure modes and
    # both must leave a resumable run dir
    procs = _launch_workers(2, tmp_path, mode="restore_crash", crash_after=1)
    outs = _drain(procs)
    assert procs[0].returncode == 17, (
        f"rank 0 should have crash-exited 17, got "
        f"{procs[0].returncode}:\n{outs[0][-4000:]}"
    )
    assert "WORKER_CRASH 0" in outs[0]
    assert procs[1].returncode != 0, (
        f"rank 1 should have died:\n{outs[1][-4000:]}"
    )

    results_root = pjoin(str(tmp_path), "results")
    partial, rgb_dir = [], None
    for dirpath, _, files in os.walk(results_root):
        if dirpath.endswith(pjoin("single_images", "rgb")):
            partial = sorted(files)
            rgb_dir = dirpath
    # rank 0 definitely saved img_0 before dying; rank 1's progress depends
    # on which failure mode hit it — either way nothing is fully restored
    assert rgb_dir is not None
    assert "img_0.png" in partial
    assert len(partial) < 4, partial

    # phase 2: fresh cluster, resume config — stragglers complete
    procs = _launch_workers(2, tmp_path, mode="resume")
    outs = _drain(procs)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"resume worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out

    r0 = json.load(open(pjoin(str(tmp_path), "report_resume_0.json")))
    r1 = json.load(open(pjoin(str(tmp_path), "report_resume_1.json")))
    # re-entered the ORIGINAL run dir (no new runN allocated)
    assert r0["run_dir"] == r1["run_dir"] == os.path.dirname(
        os.path.dirname(rgb_dir)
    )
    # all 4 images exactly once, no duplicates anywhere else
    assert r0["outputs"] == [f"img_{i}.png" for i in range(4)]
    all_rgb_dirs = [
        d for d, _, _ in os.walk(results_root)
        if d.endswith(pjoin("single_images", "rgb"))
    ]
    assert all_rgb_dirs == [rgb_dir]
    # every phase-1 image was SKIPPED, not recomputed; and no truncated
    # PNGs survived the kill (save_png writes atomically)
    logs = ""
    for f in os.listdir(r0["run_dir"]):
        if f.startswith("log"):
            logs += open(pjoin(r0["run_dir"], f)).read()
    for name in partial:
        idx = name.split("_")[1].split(".")[0]
        assert f"skipping image {idx}" in logs
    for name in r0["outputs"]:
        img = Image.open(pjoin(rgb_dir, name))
        img.verify()  # raises on a truncated file
