#!/usr/bin/env python
"""Simulation-dataset generator: GT RGBD → degraded input + GT triples.

The reference's quantitative protocol (reference README.md:93-106,
configs/osmosis_simulation_sample_config.yaml) evaluates restoration on
UNDERWATER-SIMULATED images built out-of-tree from NYUv2 RGBD pairs —
the simulation code itself is not in the reference repo. This tool closes
that gap: it applies the framework's own physical formation models
(osmosis_tpu/guidance/operators.py, the exact forward the guided loop
inverts) to ground-truth RGBD and writes the simulation-preset dataset
layout consumed by `ImagesFolderGT` (data/datasets.py:66-102):

    <out>/input/*.png       degraded RGB (uint8)
    <out>/gt_rgb/*.png      clean RGB (uint8)
    <out>/gt_depth/*.png    depth (uint16, full precision)
    <out>/manifest.json     per-image true phi + generation settings

Sources: either real GT folders (--gt-rgb/--gt-depth, e.g. an NYUv2
export: RGB PNGs + uint16 depth PNGs) or procedural toy scenes
(--synth N, the train_toy_prior distribution). Per-image phi jitter
(--phi-jitter) produces heterogeneous water conditions; the manifest
records every image's true parameters so recovered-phi error is
measurable after restoration.

Examples:
    # 6 toy scenes through the revised underwater model (demo regime)
    python tools/simulate_degraded.py --out /tmp/sim --synth 6 --size 64

    # NYUv2-style folders through the haze model with parameter jitter
    python tools/simulate_degraded.py --out /tmp/sim_haze \\
        --gt-rgb nyu/rgb --gt-depth nyu/depth --size 256 \\
        --operator haze_physical --phi-ab 0.8 --phi-inf 0.7,0.72,0.74 \\
        --phi-jitter 0.1
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# default TRUE degradation parameters per operator — the same regimes the
# validated toy protocols use (VALIDATION.md §3); inits in the shipped
# presets are intentionally offset from these.
DEFAULT_PHI = {
    "underwater_physical_revised": {
        "phi_a": "0.55,0.45,0.35",
        "phi_b": "0.5,0.4,0.35",
        "phi_inf": "0.18,0.32,0.45",
    },
    "underwater_physical": {
        "phi_ab": "0.5,0.42,0.35",
        "phi_inf": "0.18,0.32,0.45",
    },
    "haze_physical": {
        "phi_ab": "0.8",
        "phi_inf": "0.7,0.72,0.74",
    },
}


def _resize_crop_float(arr: np.ndarray, size: int) -> np.ndarray:
    """Float [H,W,C] → [size,size,C]: small-side resize + center crop with
    the shipped transform's torchvision-pinned geometry (transforms.py)."""
    from osmosis_tpu.data import transforms as T

    h, w = arr.shape[:2]
    if (h, w) != (size, size):
        new_h, new_w = T._small_side_dims(h, w, size)
        arr = T.bilinear_resize_u8(arr, new_h, new_w)
        arr = T.center_crop(arr, size)
    return arr.astype(np.float32)


def load_gt_scenes(gt_rgb_dir: str, gt_depth_dir: str, size: int, limit: int = -1):
    """Yield (name, rgbd in [-1,1] [1,size,size,4]) from GT folders.

    RGB: u8 PNGs. Depth: uint16 (full 0..65535 → [0,1]) or u8 (0..255).
    Pairing is natsorted-index like ImagesFolderGT (datasets.py:71-81).
    """
    import cv2

    from osmosis_tpu.data.datasets import natsorted

    rgbs = natsorted(os.listdir(gt_rgb_dir))
    depths = natsorted(os.listdir(gt_depth_dir))
    if len(rgbs) != len(depths):
        raise SystemExit(
            f"gt_rgb has {len(rgbs)} files but gt_depth has {len(depths)}"
        )
    if limit > 0:
        rgbs, depths = rgbs[:limit], depths[:limit]
    for rgb_name, depth_name in zip(rgbs, depths):
        rgb = cv2.imread(os.path.join(gt_rgb_dir, rgb_name), cv2.IMREAD_COLOR)
        if rgb is None:
            raise SystemExit(f"cannot read rgb {rgb_name}")
        rgb = cv2.cvtColor(rgb, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        d = cv2.imread(os.path.join(gt_depth_dir, depth_name), cv2.IMREAD_UNCHANGED)
        if d is None:
            raise SystemExit(f"cannot read depth {depth_name}")
        if d.ndim == 3:
            d = d[..., 0]
        denom = 65535.0 if d.dtype == np.uint16 else 255.0
        d01 = d.astype(np.float32) / denom
        rgb = _resize_crop_float(rgb, size)
        d01 = _resize_crop_float(d01[..., None], size)
        rgbd = np.concatenate([rgb, d01], axis=-1) * 2.0 - 1.0
        yield os.path.splitext(rgb_name)[0], rgbd[None]


def synth_scenes(n: int, size: int, seed: int):
    """Yield procedural toy scenes (train_toy_prior distribution)."""
    import jax

    from tools.train_toy_prior import synth_scene_batch

    key = jax.random.key(seed)
    for i in range(n):
        kk = jax.random.fold_in(key, i)
        scene = np.asarray(synth_scene_batch(jax.random.fold_in(kk, 0), 1, size))
        yield f"scene_{i}", scene


def jitter_phi(phi, sigma: float, rng: np.random.Generator):
    """Per-image multiplicative log-normal jitter, clipped positive.
    phi_inf (veiling light, a color in [0,1]) is additionally capped at 1.0
    so the formation output stays in [0,1] and the manifest phi keeps the
    exact round-trip property with the saved input PNG."""
    if sigma <= 0:
        return phi
    out = {}
    for k, v in phi.items():
        j = np.maximum(v * np.exp(rng.normal(0.0, sigma, v.shape)).astype(v.dtype),
                       1e-3)
        if k == "phi_inf":
            j = np.minimum(j, 1.0)
        out[k] = j
    return out


def simulate_dataset(
    out: str,
    scenes,
    operator_name: str = "underwater_physical_revised",
    phi_spec=None,
    depth_type: str = "gamma",
    depth_value: str = "1.4,1.4,1",
    noise: str = "clean",
    sigma: float = 0.05,
    phi_jitter: float = 0.0,
    seed: int = 0,
):
    """Write the simulation layout from an iterable of (name, rgbd[-1,1]).

    Returns the manifest dict. Callable from other tools/tests."""
    import jax.numpy as jnp
    from PIL import Image

    from osmosis_tpu.guidance.operators import get_operator

    for sub in ("input", "gt_rgb", "gt_depth"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)

    phi_spec = dict(DEFAULT_PHI[operator_name], **(phi_spec or {}))
    op = get_operator(
        operator_name, batch_size=1, depth_type=depth_type, value=depth_value,
        **phi_spec,
    )
    base_phi = op.phi_init()
    rng = np.random.default_rng(seed)
    manifest = {
        "operator": operator_name,
        "depth_type": depth_type,
        "depth_value": depth_value,
        "noise": noise,
        "sigma": sigma if noise == "gaussian" else None,
        "phi_jitter": phi_jitter,
        "seed": seed,
        "images": {},
    }
    n = 0
    for name, rgbd in scenes:
        phi = jitter_phi(base_phi, phi_jitter, rng)
        y01 = np.asarray(op.forward({k: jnp.asarray(v) for k, v in phi.items()},
                                    jnp.asarray(rgbd)))[0]
        if noise == "gaussian":
            y01 = y01 + sigma * rng.standard_normal(y01.shape).astype(np.float32)
        y01 = np.clip(y01, 0.0, 1.0)
        rgb01 = np.clip(0.5 * (rgbd[0, ..., :3] + 1.0), 0, 1)
        depth01 = np.clip(0.5 * (rgbd[0, ..., 3] + 1.0), 0, 1)
        Image.fromarray((y01 * 255).round().astype(np.uint8)).save(
            os.path.join(out, "input", f"{name}.png"))
        Image.fromarray((rgb01 * 255).round().astype(np.uint8)).save(
            os.path.join(out, "gt_rgb", f"{name}.png"))
        Image.fromarray((depth01 * 65535).round().astype(np.uint16)).save(
            os.path.join(out, "gt_depth", f"{name}.png"))
        manifest["images"][name] = {
            k: np.asarray(v)[0].tolist() for k, v in phi.items()
        }
        n += 1
    manifest["count"] = n
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def main():
    # escape hatch for relay-less hosts and the runbook's CPU self-test:
    # the axon sitecustomize pins the platform via env, so the flip must
    # happen inside the interpreter, before any jax use (CLAUDE.md)
    plat = os.environ.get("OSMOSIS_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--out", required=True, help="output dataset directory")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--synth", type=int, metavar="N",
                     help="synthesize N procedural toy scenes")
    src.add_argument("--gt-rgb", help="directory of GT RGB images")
    ap.add_argument("--gt-depth", help="directory of GT depth maps "
                    "(uint16 or uint8 PNGs; natsorted index pairing)")
    ap.add_argument("--limit", type=int, default=-1,
                    help="use only the first N GT pairs")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--operator", default="underwater_physical_revised",
                    choices=sorted(DEFAULT_PHI))
    ap.add_argument("--phi-a", help="true phi_a (revised underwater)")
    ap.add_argument("--phi-b", help="true phi_b (revised underwater)")
    ap.add_argument("--phi-ab", help="true phi_ab (underwater/haze)")
    ap.add_argument("--phi-inf", help="true phi_inf")
    ap.add_argument("--depth-type", default="gamma",
                    choices=["gamma", "original", "move"])
    ap.add_argument("--depth-value", default="1.4,1.4,1")
    ap.add_argument("--noise", default="clean", choices=["clean", "gaussian"])
    ap.add_argument("--sigma", type=float, default=0.05)
    ap.add_argument("--phi-jitter", type=float, default=0.0,
                    help="per-image log-normal phi jitter sigma")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.gt_rgb and not args.gt_depth:
        ap.error("--gt-rgb requires --gt-depth")

    phi_spec = {}
    for k in ("phi_a", "phi_b", "phi_ab", "phi_inf"):
        v = getattr(args, k)
        if v is not None:
            if k not in DEFAULT_PHI[args.operator]:
                ap.error(f"--{k.replace('_', '-')} does not apply to "
                         f"{args.operator}")
            phi_spec[k] = v

    if args.synth is not None:
        scenes = synth_scenes(args.synth, args.size, args.seed)
    else:
        scenes = load_gt_scenes(args.gt_rgb, args.gt_depth, args.size,
                                args.limit)

    manifest = simulate_dataset(
        args.out, scenes, operator_name=args.operator, phi_spec=phi_spec,
        depth_type=args.depth_type, depth_value=args.depth_value,
        noise=args.noise, sigma=args.sigma, phi_jitter=args.phi_jitter,
        seed=args.seed,
    )
    print(json.dumps({
        "out": args.out, "count": manifest["count"],
        "operator": args.operator,
        "phi": {k: v for k, v in manifest["images"].get(
            next(iter(manifest["images"]), ""), {}).items()},
    }))


if __name__ == "__main__":
    main()
