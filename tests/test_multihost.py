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
