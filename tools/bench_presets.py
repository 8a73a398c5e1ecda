#!/usr/bin/env python
"""Measure end-to-end s/image of shipped preset x respacing operating points.

Protocol = bench.py's fast-preset line (reference run-loop contract:
/root/reference/scripts/osmosis_sampling.py per-image loop): synthetic
256px inputs through the REAL pipeline (`run_restoration`: chain + fetch
+ postprocess + PNG), steady state = mean of images 2+ (image 1 absorbs
the compile). Each point is the SHIPPED config with only
`diffusion.timestep_respacing` optionally overridden.

Produced the PERF.md round-13 table (one v5e):
  x0@ddim200 3.49 s/image | x0@ddim100 2.15 | x0@ddim50 1.24 |
  x0@ddim25 0.82 | hybrid@ddim200 4.29 | hybrid@ddim50 1.49 —
  pairing with VALIDATION 3a-ii's quality grid (x0 mode holds
  +10.4-10.7 dB down to 50 steps; the 25-step rung fails the 256px
  depth gate).

Usage: python tools/bench_presets.py [all|x0_200|x0_100|x0_50|x0_25|hyb_200|hyb_50]
"""
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import yaml
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

POINTS = {
    "x0_200": ("osmosis_sample_x0_config.yaml", None),
    "x0_100": ("osmosis_sample_x0_config.yaml", "ddim100"),
    "x0_50": ("osmosis_sample_x0_config.yaml", "ddim50"),
    "x0_25": ("osmosis_sample_x0_config.yaml", "ddim25"),
    "hyb_200": ("osmosis_sample_hybrid_config.yaml", None),
    "hyb_50": ("osmosis_sample_hybrid_config.yaml", "ddim50"),
}


def measure_preset_e2e(config_path, respacing=None, n_images=3, tag=""):
    """Run one shipped preset end-to-end on synthetic 256px inputs.

    The ONE measurement protocol shared by bench.py's north-star line and
    this tool (so the two stay comparable by construction): chain + fetch
    + postprocess + PNG through `run_restoration`, steady state = mean of
    images 2+ (image 1 absorbs the compile).

    Returns (steady_mean_seconds, per_image_seconds, total_wall_seconds).
    """
    tmp = tempfile.mkdtemp(prefix=f"bench_{tag}_")
    try:
        data = os.path.join(tmp, "inputs")
        os.makedirs(data)
        rng = np.random.default_rng(0)
        for i in range(n_images):
            Image.fromarray(
                rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
            ).save(os.path.join(data, f"img_{i}.png"))
        with open(config_path) as f:
            cfg = yaml.safe_load(f)
        cfg["save_dir"] = os.path.join(tmp, "results")
        cfg["data"].update(root=data, stop_after=n_images, ground_truth=False)
        cfg["record_process"] = False
        if respacing is not None:
            cfg["diffusion"]["timestep_respacing"] = respacing
        cfg_path = os.path.join(tmp, "cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.dump(cfg, f)
        from osmosis_tpu.pipelines import run_restoration

        t0 = time.perf_counter()
        run_dir = run_restoration(cfg_path)
        wall = time.perf_counter() - t0
        rows = []
        with open(os.path.join(run_dir, "progress.json")) as f:
            for line in f:
                if line.strip():
                    rows.append(json.loads(line))
        secs = [float(r["seconds"]) for r in rows if "seconds" in r]
        steady = secs[1:] if len(secs) > 1 else secs
        return float(np.mean(steady)), secs, wall
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_point(config, respacing=None, n_images=3, tag=""):
    """One operating point; prints a one-line JSON result row."""
    steady, secs, wall = measure_preset_e2e(
        os.path.join(REPO, "configs", config), respacing, n_images, tag)
    print(json.dumps({
        "point": tag, "config": config, "respacing": respacing,
        "steady_s_per_image": round(steady, 3),
        "per_image": [round(s, 2) for s in secs],
        "total_wall_incl_compile": round(wall, 1),
    }), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which != "all" and which not in POINTS:
        sys.exit(f"unknown operating point {which!r}; valid: "
                 f"all {' '.join(POINTS)}")
    from osmosis_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache()
    for tag, (cfg, resp) in POINTS.items():
        if which in ("all", tag):
            run_point(cfg, resp, tag=tag)


if __name__ == "__main__":
    main()
