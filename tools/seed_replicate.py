#!/usr/bin/env python
"""Seed-replicate the decision-bearing cells of the 3a-ii quality grid.

VERDICT r4 #2: every headline operating-point claim (x0 > hybrid >
full-grad mode ranking, the 25-step knee, the x0-turbo preset's "+10.4 dB,
grid's best") rested on ONE sampling draw per cell. This tool re-runs the
decision cells with extra sampling seeds — same held-out scenes and
degradations bitwise (validate_toy_e2e.py --sample-seed re-roots only the
chain randomness), different chain noise — then:

  * appends the new rows (with a `seed` field) to
    docs/data/grid_3a_ii.jsonl (the original round-4 rows, no seed field,
    are draw 0);
  * writes docs/data/seed_replication_3a_ii.json: per-cell mean±std of
    psnr_gain_db / depth_corr_mean across all draws, plus the derived
    mode-ranking and 25-step-knee checks.

Cells and flags are verbatim the round-4 grid recipes (VALIDATION.md
3a-ii): production arch, adam, per-octave scale laws, priors from
3b-iv/3b-v. Resumable: cells already present in the jsonl at a given seed
are skipped.

Usage: python tools/seed_replicate.py [--seeds 1 2] [--cells r256_s50_x0 ...]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GRID = os.path.join(REPO, "docs", "data", "grid_3a_ii.jsonl")
SUMMARY = os.path.join(REPO, "docs", "data", "seed_replication_3a_ii.json")

C128 = ("--checkpoint checkpoints/toy_prior128_offn.msgpack --size 128 "
        "--channels 64 --arch production --scenes 6 --scale 8,8,8,4 "
        "--optimizer adam")
C256 = ("--checkpoint checkpoints/toy_prior256_offn.msgpack --size 256 "
        "--channels 64 --arch production --scenes 6 --scale 16,16,16,8 "
        "--optimizer adam")
C256_4K = ("--checkpoint checkpoints/toy_prior256_offn4k.msgpack --size 256 "
           "--channels 64 --arch production --scenes 6 --scale 16,16,16,8 "
           "--optimizer adam")

# the decision-bearing cells (VERDICT r4 #2): x0@100/50 at both
# resolutions, hybrid k=4 @50/25 on the converged 24k prior, and the
# full-grad turbo rung. Flags verbatim from the round-4 grid session
# (a later --scale overrides the base C* one — argparse last-wins).
CELLS = {
    "r128_s100_x0": f"{C128} --x0-grad --scale 4,4,4,2 --phi-eta 5e-4 "
                    "--respacing 100",
    "r128_s50_x0": f"{C128} --x0-grad --scale 4,4,4,2 --phi-eta 5e-4 "
                   "--respacing 50",
    "r256_s100_x0": f"{C256} --x0-grad --scale 8,8,8,4 --phi-eta 2.5e-4 "
                    "--respacing 100",
    "r256_s50_x0": f"{C256} --x0-grad --scale 8,8,8,4 --phi-eta 2.5e-4 "
                   "--respacing 50",
    "r256_s50_hyb4": f"{C256} --phi-eta 2.5e-4 --respacing 50 "
                     "--x-prev-every 4",
    "r256_s25_hyb4": f"{C256} --phi-eta 2.5e-4 --respacing 25 "
                     "--x-prev-every 4",
    "r128_s100_eta5e-4": f"{C128} --phi-eta 5e-4 --respacing 100",
    # the two knee comparators that justify the hybrid-turbo preset: the
    # x0 depth-gate failure at 25 steps (corr 0.03 single-draw) and the
    # full-grad collapse (+1.42 single-draw)
    "r256_s25_x0": f"{C256} --x0-grad --scale 8,8,8,4 --phi-eta 2.5e-4 "
                   "--respacing 25",
    "r256_s25_ddpm": f"{C256} --respacing 25 --phi-eta 2.5e-4",
    # the 128px side of the knee asymmetry ("128px still passes at 25
    # steps") — single-draw in round 4
    "r128_s25_x0": f"{C128} --x0-grad --scale 4,4,4,2 --phi-eta 5e-4 "
                   "--respacing 25",
    "r128_s25_eta5e-4": f"{C128} --phi-eta 5e-4 --respacing 25",
    # the eta-bracketing evidence on the 4k checkpoint-strength prior
    # (3a-ii finding 3: "the 4x upscale wins at 50 steps, +7.96 vs
    # +5.59" — single-draw in round 4; drives the day-one bracketing
    # advice)
    "r256k4_s100_eta1e-4": f"{C256_4K} --respacing 100 --phi-eta 1e-4",
    "r256k4_s100_eta2e-4": f"{C256_4K} --respacing 100 --phi-eta 2e-4",
    "r256k4_s50_eta1e-4": f"{C256_4K} --respacing 50 --phi-eta 1e-4",
    "r256k4_s50_eta4e-4": f"{C256_4K} --respacing 50 --phi-eta 4e-4",
    # the 200-step baselines the turbo preset's "100 steps holds quality"
    # claim (3a-ii finding 1) compares against — single-draw 3b-iv/3b-v
    # numbers (+5.89 / +7.04) until round 5
    "r128_s200_eta5e-4": f"{C128} --phi-eta 5e-4 --respacing 200",
    "r256k4_s200_eta1e-4": f"{C256_4K} --respacing 200 --phi-eta 1e-4",
    # the full-grad comparator inside the mode-ranking check (the last
    # single-draw number a "survives" verdict rested on)
    "r256_s50_eta2.5e-4": f"{C256} --respacing 50 --phi-eta 2.5e-4",
}


def load_grid():
    rows = []
    if os.path.exists(GRID):
        with open(GRID) as f:
            rows = [json.loads(l) for l in f if l.strip()]
    return rows


def have(rows, cell, seed):
    return any(r.get("row") == cell and r.get("seed") == seed for r in rows)


def run_cell(cell, seed):
    cmd = (
        [sys.executable, os.path.join(REPO, "tools", "validate_toy_e2e.py")]
        + CELLS[cell].split()
        + ["--sample-seed", str(seed), "--row-name", cell]
    )
    t0 = time.time()
    try:
        p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                           timeout=3600)
    except subprocess.TimeoutExpired:
        # a cold-cache 256px cell can blow the budget — skip the cell and
        # keep the sweep alive, like every other per-cell failure
        print(f"[seed_replicate] {cell} seed {seed} TIMED OUT after "
              f"{(time.time() - t0) / 60:.0f} min", file=sys.stderr)
        return None
    dt = time.time() - t0
    # rc 1 = the tool's own PASS gate failed (possible at the knee cells);
    # the row is still the measurement we came for
    if p.returncode not in (0, 1):
        print(f"[seed_replicate] {cell} seed {seed} CRASHED rc="
              f"{p.returncode}\n{p.stderr[-2000:]}", file=sys.stderr)
        return None
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(f"[seed_replicate] {cell} seed {seed}: no JSON on stdout\n"
              f"{p.stderr[-2000:]}", file=sys.stderr)
        return None
    row = json.loads(line[-1])
    print(f"[seed_replicate] {cell} seed {seed}: gain "
          f"{row['psnr_gain_db']} dB corr {row['depth_corr_mean']} "
          f"({dt / 60:.1f} min)", file=sys.stderr)
    return row


def summarize(rows):
    import numpy as np

    cells = {}
    for cell in CELLS:
        draws = [r for r in rows if r.get("row") == cell]
        if not draws:
            continue
        gains = [r["psnr_gain_db"] for r in draws]
        corrs = [r["depth_corr_mean"] for r in draws]
        cells[cell] = {
            "n_draws": len(draws),
            "seeds": [r.get("seed", 0) for r in draws],
            "gain_db": gains,
            "gain_mean": round(float(np.mean(gains)), 2),
            "gain_std": round(float(np.std(gains, ddof=1)), 2)
            if len(gains) > 1 else None,
            "depth_corr": corrs,
            "corr_mean": round(float(np.mean(corrs)), 3),
            "corr_std": round(float(np.std(corrs, ddof=1)), 3)
            if len(corrs) > 1 else None,
        }

    checks = {}
    # mode ranking at 256px/50 steps on the 24k prior: x0 > hybrid k=4 >
    # full-grad (the single-draw grid's ordering). full-grad comparator is
    # the round-4 single-draw r256_s50_eta2.5e-4 row (+2.52).
    if "r256_s50_x0" in cells and "r256_s50_hyb4" in cells:
        x0, hyb = cells["r256_s50_x0"], cells["r256_s50_hyb4"]
        fullc = cells.get("r256_s50_eta2.5e-4")
        full = [r for r in rows if r.get("row") == "r256_s50_eta2.5e-4"]
        full_gain = (fullc["gain_mean"] if fullc else
                     full[0]["psnr_gain_db"] if full else None)
        checks["mode_ranking_256px_50steps"] = {
            "x0_gain": f"{x0['gain_mean']}±{x0['gain_std']}",
            "hyb4_gain": f"{hyb['gain_mean']}±{hyb['gain_std']}",
            "full_grad_gain": (f"{fullc['gain_mean']}±{fullc['gain_std']}"
                               if fullc else full_gain),
            "x0_beats_hyb4_by_db": round(x0["gain_mean"] - hyb["gain_mean"], 2),
            "survives": bool(
                x0["gain_mean"] - (x0["gain_std"] or 0)
                > hyb["gain_mean"] + (hyb["gain_std"] or 0)
                and (full_gain is None or hyb["gain_mean"] > full_gain)
            ),
        }
    # the 25-step knee: x0@25 fails the 256px depth gate (corr ~0.03 on
    # the original draw) while hyb4@25 holds — replication asks whether
    # (a) hyb4@25's gain stays clearly above the full-grad collapse and
    # (b) the x0 depth-gate failure is a property of the mode, not of one
    # draw (each validate_toy_e2e row carries its own pass verdict)
    if "r256_s25_hyb4" in cells:
        hyb25 = cells["r256_s25_hyb4"]
        ddpm25 = cells.get("r256_s25_ddpm")
        full_gain = (ddpm25["gain_mean"] if ddpm25 else
                     next((r["psnr_gain_db"] for r in rows
                           if r.get("row") == "r256_s25_ddpm"), 1.42))
        x0_25 = [r for r in rows if r.get("row") == "r256_s25_x0"]
        entry = {
            "hyb4_25_gain": f"{hyb25['gain_mean']}±{hyb25['gain_std']}",
            "full_grad_25": (f"{ddpm25['gain_mean']}±{ddpm25['gain_std']}"
                             if ddpm25 else full_gain),
            "survives": bool(hyb25["gain_mean"] - 2 * (hyb25["gain_std"] or 0)
                             > full_gain),
        }
        if x0_25:
            entry["x0_25_depth_gate_failures"] = (
                f"{sum(1 for r in x0_25 if not r.get('pass', True))}"
                f"/{len(x0_25)} draws")
            entry["x0_25_depth_corr_per_draw"] = [
                r["depth_corr_mean"] for r in x0_25]
        checks["knee_25steps_hyb4_above_collapse"] = entry
    # x0 step-count invariance at the shipped turbo point: is
    # x0@50 vs x0@100 (256px: 10.65 vs 10.59 single-draw) within noise?
    if "r256_s100_x0" in cells and "r256_s50_x0" in cells:
        a, b = cells["r256_s100_x0"], cells["r256_s50_x0"]
        diff = round(b["gain_mean"] - a["gain_mean"], 2)
        spread = max(a["gain_std"] or 0, b["gain_std"] or 0)
        checks["x0_100_vs_50_256px"] = {
            "gain_100": f"{a['gain_mean']}±{a['gain_std']}",
            "gain_50": f"{b['gain_mean']}±{b['gain_std']}",
            "diff_db": diff,
            "within_noise": bool(abs(diff) <= 2 * spread),
        }
    return {"cells": cells, "checks": checks,
            "protocol": "6 fixed scenes per draw; --sample-seed varies "
                        "chain noise only; draw 0 = the round-4 grid row "
                        "(no seed field)"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2],
                    help="sample-seed values (>=1). 0 is RESERVED for the "
                         "original round-4 grid draw (rows without a seed "
                         "field): --sample-seed 0 would measure a NEW draw "
                         "that the summary could not distinguish from it")
    ap.add_argument("--cells", nargs="+", default=list(CELLS),
                    choices=list(CELLS))
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args()
    if any(s < 1 for s in args.seeds):
        ap.error("--seeds must be >= 1 (draw 0 IS the original grid row)")

    rows = load_grid()
    if not args.summarize_only:
        for cell in args.cells:
            for seed in args.seeds:
                if have(rows, cell, seed):
                    print(f"[seed_replicate] {cell} seed {seed}: already "
                          "in grid, skipping", file=sys.stderr)
                    continue
                row = run_cell(cell, seed)
                if row is None:
                    continue
                rows.append(row)
                with open(GRID, "a") as f:
                    f.write(json.dumps(row) + "\n")
    summary = summarize(rows)
    with open(SUMMARY, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["checks"], indent=1))
    print(f"[seed_replicate] summary -> {SUMMARY}", file=sys.stderr)


if __name__ == "__main__":
    main()
