"""Serving mode: warm-model HTTP endpoint drives the guided chain."""

import base64
import importlib.util
import io
import json
import os
import socket
import sys
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.test_pipelines_e2e import DIFFUSION, PATTERN, TINY_UNET

_spec = importlib.util.spec_from_file_location(
    "serve", os.path.join(os.path.dirname(__file__), "..", "tools", "serve.py")
)
serve = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(serve)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import yaml
    from http.server import HTTPServer

    tmp = tmp_path_factory.mktemp("serve")
    cfg = dict(
        save_dir=str(tmp), degamma_input=False, manual_seed=0,
        rgb_guidance=False, save_singles=False, save_grids=False,
        record_process=False, record_every=20,
        sample_pattern=PATTERN, unet_model=TINY_UNET,
        diffusion=dict(DIFFUSION, timestep_respacing=10),
        conditioning=dict(
            method="osmosis",
            params=dict(loss_function="norm", loss_weight="depth",
                        weight_function="gamma,1.4,1.4,1", scale="7,7,7,0.9",
                        gradient_x_prev=True, gradient_clip="True,0.005"),
        ),
        aux_loss=dict(aux_loss=dict(avrg_loss=0.5, val_loss=20)),
        data=dict(batch_size=1, name="serve", root="unused",
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
    cfg_path = str(tmp / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    restorer = serve.Restorer(cfg_path, warmup=True)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    httpd = HTTPServer(("127.0.0.1", port), serve.make_handler(restorer))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz") as r:
        assert r.status == 200
        assert json.loads(r.read())["warm"] is True


def test_restore_roundtrip(server):
    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)).save(
        buf, format="PNG"
    )
    req = urllib.request.Request(
        f"{server}/restore?seed=7", data=buf.getvalue(), method="POST",
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        out = json.loads(r.read())
    rgb = Image.open(io.BytesIO(base64.b64decode(out["rgb_png"])))
    depth = Image.open(io.BytesIO(base64.b64decode(out["depth_png"])))
    assert rgb.size == (32, 32) and depth.size == (32, 32)
    assert set(out["phi"]) == {"phi_a", "phi_b", "phi_inf"}
    assert out["ms"] > 0


def test_restore_bad_payload(server):
    req = urllib.request.Request(
        f"{server}/restore", data=b"not an image", method="POST"
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())


def test_unknown_route(server):
    try:
        urllib.request.urlopen(f"{server}/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404
