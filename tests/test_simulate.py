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
