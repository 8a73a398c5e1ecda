"""tools/simulate_degraded.py: the simulation-dataset generator.

The reference's quantitative protocol builds its simulated set out-of-tree
(reference README.md:93-106); this tool is the in-tree equivalent. The
tests pin the round-trip property: re-applying the operator forward to the
saved GT PNGs with the manifest's phi reproduces the saved input to within
PNG quantization.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.simulate_degraded import simulate_dataset, synth_scenes  # noqa: E402


def _load_rgbd(out, name):
    from PIL import Image

    rgb = np.asarray(Image.open(os.path.join(out, "gt_rgb", f"{name}.png")))
    depth = np.asarray(Image.open(os.path.join(out, "gt_depth", f"{name}.png")))
    rgb01 = rgb.astype(np.float32) / 255.0
    d01 = depth.astype(np.float32) / 65535.0
    return np.concatenate([rgb01, d01[..., None]], axis=-1)[None] * 2.0 - 1.0


@pytest.mark.parametrize("operator", [
    "underwater_physical_revised", "underwater_physical", "haze_physical",
])
def test_roundtrip(tmp_path, operator):
    import jax.numpy as jnp

    from osmosis_tpu.guidance.operators import get_operator

    out = str(tmp_path / operator)
    manifest = simulate_dataset(
        out, synth_scenes(2, 16, seed=3), operator_name=operator,
    )
    assert manifest["count"] == 2
    assert sorted(os.listdir(os.path.join(out, "input"))) == [
        "scene_0.png", "scene_1.png",
    ]
    disk = json.load(open(os.path.join(out, "manifest.json")))
    assert disk["images"].keys() == manifest["images"].keys()

    from PIL import Image

    for name, phi in manifest["images"].items():
        rgbd = _load_rgbd(out, name)
        op = get_operator(operator, batch_size=1, depth_type="gamma",
                          value="1.4,1.4,1",
                          **{k: ",".join(str(x) for x in v)
                             for k, v in phi.items()})
        y = np.clip(np.asarray(op.forward(
            {k: jnp.asarray([v], jnp.float32) for k, v in phi.items()},
            jnp.asarray(rgbd))), 0, 1)[0]
        saved = np.asarray(Image.open(
            os.path.join(out, "input", f"{name}.png"))).astype(np.float32) / 255.0
        # GT passed through uint8/uint16 quantization before the re-forward;
        # exp() keeps the error within a few levels
        assert np.max(np.abs(y - saved)) < 3.0 / 255.0


def test_phi_jitter_varies_per_image(tmp_path):
    out = str(tmp_path / "jit")
    manifest = simulate_dataset(
        out, synth_scenes(3, 16, seed=0), operator_name="haze_physical",
        phi_jitter=0.15, seed=7,
    )
    abs_ = [manifest["images"][f"scene_{i}"]["phi_ab"][0] for i in range(3)]
    assert len(set(abs_)) == 3  # jittered per image
    assert all(a > 0 for a in abs_)


def test_simulated_protocol_phi_error_loop(tmp_path):
    """The full quantitative loop: simulate (manifest with true phi) →
    restore through the product pipeline → per-channel phi KVs in
    progress.json → tools/evaluate.phi_error closes the comparison."""
    import yaml

    from tests.test_pipelines_e2e import DIFFUSION, PATTERN, TINY_UNET
    from tools.evaluate import phi_error

    sim = str(tmp_path / "sim")
    simulate_dataset(sim, synth_scenes(1, 32, seed=11))

    cfg = dict(
        save_dir=str(tmp_path / "results"),
        degamma_input=False, manual_seed=0, rgb_guidance=False,
        save_singles=True, save_grids=False,
        record_process=False, record_every=20,
        change_input_output_channels=True, input_channels=4, output_channels=8,
        sample_pattern=dict(PATTERN, n_iter=2),
        unet_model=TINY_UNET,
        diffusion=dict(DIFFUSION, timestep_respacing=10),
        conditioning=dict(method="osmosis", params=dict(
            loss_function="norm", loss_weight="depth",
            weight_function="gamma,1.4,1.4,1", scale="4,4,4,2",
            gradient_x_prev=True, gradient_clip="True,0.01",
        )),
        aux_loss=dict(aux_loss=dict(avrg_loss=0.5, val_loss=20)),
        data=dict(batch_size=1, name="sim", root=os.path.join(sim, "input"),
                  stop_after=1, ground_truth=True,
                  gt_rgb=os.path.join(sim, "gt_rgb"),
                  gt_depth=os.path.join(sim, "gt_depth")),
        measurement=dict(
            operator=dict(
                name="underwater_physical_revised", optimizer="sgd",
                depth_type="gamma", value="1.4,1.4,1",
                phi_a="0.7,0.6,0.5", phi_a_eta=1e-4, phi_a_learn_flag=True,
                phi_b="0.6,0.5,0.45", phi_b_eta=1e-4, phi_b_learn_flag=True,
                phi_inf="0.14,0.29,0.49", phi_inf_eta=1e-4,
                phi_inf_learn_flag=True,
            ),
            noise=dict(name="clean"),
        ),
    )
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    from osmosis_tpu.pipelines import run_restoration

    out = run_restoration(cfg_path)

    recs = [json.loads(l) for l in open(os.path.join(out, "progress.json"))]
    rec = recs[-1]
    for pname in ("phi_a", "phi_b", "phi_inf"):
        for ci in range(3):
            assert f"{pname}_{ci}" in rec, f"missing {pname}_{ci} KV"

    err = phi_error(os.path.join(sim, "manifest.json"), out)
    assert err["n_phi_images"] == 1
    assert np.isfinite(err["phi_mae"])
    # untrained 10-step chain barely moves phi from its init: the error
    # must be ~the init offset, proving truth and recovery are aligned
    assert 0.01 < err["phi_mae"] < 0.5


def test_gaussian_noise_in_png(tmp_path):
    clean = str(tmp_path / "clean")
    noisy = str(tmp_path / "noisy")
    simulate_dataset(clean, synth_scenes(1, 16, seed=5))
    simulate_dataset(noisy, synth_scenes(1, 16, seed=5),
                     noise="gaussian", sigma=0.1)
    from PIL import Image

    a = np.asarray(Image.open(os.path.join(clean, "input", "scene_0.png")),
                   dtype=np.float32)
    b = np.asarray(Image.open(os.path.join(noisy, "input", "scene_0.png")),
                   dtype=np.float32)
    assert np.std(b - a) > 5.0  # ~0.1 * 255 noise is present
