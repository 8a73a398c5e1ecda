#!/usr/bin/env python
"""Measure end-to-end s/image of shipped preset x respacing operating points.

Protocol = bench.py's north-star line (reference run-loop contract:
/root/reference/scripts/osmosis_sampling.py per-image loop): synthetic
256px inputs through the REAL pipeline (`run_restoration`: chain + fetch
+ postprocess + PNG), steady state = mean of images 2+ (image 1 absorbs
the compile). Each point is the SHIPPED config with only
`diffusion.timestep_respacing` optionally overridden.

This tool is the ONE perf-reporting surface for preset e2e numbers
(VERDICT r4 #6): every measured point is upserted into
docs/data/preset_e2e.jsonl (keyed by point name, newest measurement wins)
and PERF.md / BASELINE.md / config headers cite that file instead of
hand-copying numbers. Each row carries `chain_finite` (from the pipeline's
per-image health stamp) so a timed-but-diverged random-init run is
distinguishable from a real restoration (VERDICT r4 weak #4).

Usage: python tools/bench_presets.py [all|ref_1000|fast_200|turbo_100|
                                      x0_200|x0_100|x0_50|x0_25|
                                      hyb_200|hyb_50|hyb_25]
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
    # full-gradient presets (every shipped preset has a row, so the docs
    # never hand-copy a number measured under an older protocol)
    "ref_1000": ("osmosis_sample_config.yaml", None),
    "fast_200": ("osmosis_sample_fast_config.yaml", None),
    "turbo_100": ("osmosis_sample_turbo_config.yaml", None),
    "x0_200": ("osmosis_sample_x0_config.yaml", None),
    "x0_100": ("osmosis_sample_x0_config.yaml", "ddim100"),
    "x0_50": ("osmosis_sample_x0_config.yaml", "ddim50"),
    "x0_25": ("osmosis_sample_x0_config.yaml", "ddim25"),
    "hyb_200": ("osmosis_sample_hybrid_config.yaml", None),
    "hyb_50": ("osmosis_sample_hybrid_config.yaml", "ddim50"),
    # the 3a-ii grid's own 25-step recommendation ("25-step budgets should
    # switch to hybrid" — hybrid k=4 +6.36 dB where full-grad collapses),
    # measured e2e per VERDICT r4 #3
    "hyb_25": ("osmosis_sample_hybrid_config.yaml", "ddim25"),
}

JSONL = os.path.join(REPO, "docs", "data", "preset_e2e.jsonl")


def measure_preset_e2e(config_path, respacing=None, n_images=3, tag=""):
    """Run one shipped preset end-to-end on synthetic 256px inputs.

    The ONE measurement protocol shared by bench.py's north-star line and
    this tool (so the two stay comparable by construction): chain + fetch
    + postprocess + PNG through `run_restoration`, steady state = mean of
    images 2+ (image 1 absorbs the compile).

    Returns (steady_mean_seconds, per_image_seconds, total_wall_seconds,
    chain_finite) where chain_finite is True iff every image's chain ended
    finite (None when the pipeline emitted no health stamp).
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
        flags = [bool(r["chain_finite"]) for r in rows if "chain_finite" in r]
        chain_finite = all(flags) if flags else None
        return float(np.mean(steady)), secs, wall, chain_finite
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_point(config, respacing=None, n_images=3, tag=""):
    """One operating point; prints the JSON result row and returns it."""
    steady, secs, wall, chain_finite = measure_preset_e2e(
        os.path.join(REPO, "configs", config), respacing, n_images, tag)
    row = {
        "point": tag, "config": config, "respacing": respacing,
        "steady_s_per_image": round(steady, 3),
        "per_image": [round(s, 2) for s in secs],
        "total_wall_incl_compile": round(wall, 1),
        "chain_finite": chain_finite,
        "date": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(row), flush=True)
    return row


def upsert_jsonl(rows, path=JSONL):
    """Merge measured rows into the checked-in artifact, keyed by point
    name (newest measurement wins); row order follows POINTS so diffs stay
    readable. Partial runs (a single point) never drop other points."""
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    merged[r["point"]] = r
    for r in rows:
        merged[r["point"]] = r
    order = {p: i for i, p in enumerate(POINTS)}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in sorted(merged.values(),
                        key=lambda r: order.get(r["point"], len(order))):
            f.write(json.dumps(r) + "\n")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which != "all" and which not in POINTS:
        sys.exit(f"unknown operating point {which!r}; valid: "
                 f"all {' '.join(POINTS)}")
    from osmosis_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache()
    n = 0
    for tag, (cfg, resp) in POINTS.items():
        if which in ("all", tag):
            # upsert each row as soon as it is measured: a relay failure at
            # point k of 7 must not discard the k-1 rows already paid for
            # (each costs 15-145 s of compile + measurement)
            upsert_jsonl([run_point(cfg, resp, tag=tag)])
            n += 1
    print(f"[bench_presets] {n} point(s) upserted into {JSONL}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
