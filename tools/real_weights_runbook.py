#!/usr/bin/env python
"""Day-one runbook for the real checkpoint (`osmosis_outdoor.pt`).

The released weights (loaded by every reference config via
guided_diffusion/unet.py:94-98; README.md:52-54) are not in this container,
so paper-parity numbers are the one standing blocker (VALIDATION.md section
5). This script binds every existing harness piece into ONE command so the
blocker converts to results the hour the weights appear:

    python tools/real_weights_runbook.py --checkpoint /path/osmosis_outdoor.pt \\
        --gt-rgb <nyu_rgb_dir> --gt-depth <nyu_depth_dir> --stop-after 5

Stages (each writes into <out>/, default runbook_results/):
  1. convert+parity — tools/validate_checkpoint.py: .pt → flax msgpack with a
     full-model activation parity check vs the torch reference (auto-bisect
     instructions on mismatch).
  2. simulate — tools/simulate_degraded.py builds the paper-protocol
     simulation set (degraded input + GT triples + true-phi manifest) from
     the provided clean RGBD folders at 256px (reference README.md:93-106).
     Skipped when --sim-dir already holds input/gt_rgb/gt_depth.
  3. reference preset — the full 1000-step simulation preset through the
     production CLI, then tools/evaluate.py: PSNR/SSIM + recovered-phi MAE.
  4. sign-off sweeps — fast (ddim200), turbo (ddim100), x0-gradient,
     x0-turbo (x0 @ ddim100, VALIDATION 3a-ii's measured-best point) and
     hybrid (x_prev_every=4) presets on the same images, each scored —
     PLUS the remaining reference surfaces (one row per shipped reference
     config, VERDICT r3 weak #4):
       * haze — configs/osmosis_haze_sample_config.yaml (scalar phi_ab
         operator) on a haze-simulated set with its own true-phi manifest
         (degamma_input is disabled on simulated data: the sim PNGs are
         linear, the knob exists for gamma-encoded photos);
       * rgb — configs/rgb_guidance_sample_config.yaml ('ps' DPS
         conditioner, identity operator; depth comes free from the prior);
       * prior — unconditional RGBD prior sampling smoke
         (configs/RGBD_sample_config.yaml surface): N images sampled,
         outputs must be finite, decodable and non-constant.
  5. automatic health checks on every run (FUTURE.md #1 encoded):
       * phi stall: final phi within 1% of init while the final loss stays
         high → the run is retried once with `optimizer: adam` and the
         report says which variant won (VALIDATION.md 3b guidance);
       * x0_std contraction: the chain's x0-hat amplitude telemetry must
         contract from its early-chain maximum by mid-chain; a
         non-contracting chain is off-manifold (VALIDATION.md 3b-iv probe
         ladder) and is flagged in the report;
       * divergence: non-finite outputs fail the stage.

Everything lands in <out>/RUNBOOK_REPORT.{md,json}.

Self-test (no weights needed, run it TODAY):
    python tools/real_weights_runbook.py --tiny
builds a seeded random tiny torch checkpoint, synthesizes toy scenes and
drives all five stages end-to-end — proving the runbook itself, the same
philosophy as tools/validate_checkpoint.py's harness self-test.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import re
import subprocess
import sys
import time

import numpy as np
import yaml

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

TOOLS = os.path.join(REPO, "tools")


_SH_ENV = {}  # extra env for stage subprocesses (tiny mode pins cpu)

# execution-ordered per-stage wall-clock records; lands in
# RUNBOOK_REPORT.json["stage_seconds"] and (with --rehearsal-json) in the
# checked-in rehearsal artifact (VERDICT r4 #4: day-one wall-clock budget)
STAGE_SECONDS = []


def _record_stage(stage, seconds, **extra):
    STAGE_SECONDS.append({"stage": stage, "seconds": round(seconds, 1),
                          **extra})


def sh(cmd, log_path=None, check=True):
    """Run a stage as a subprocess (fresh JAX runtime per stage) teeing
    output to the console and optionally a log file."""
    print(f"\n[runbook] $ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env={**os.environ, **_SH_ENV},
    )
    _record_stage(
        os.path.splitext(os.path.basename(log_path))[0] if log_path
        else os.path.basename(cmd[1]) if len(cmd) > 1 else cmd[0],
        time.time() - t0,
    )
    print(proc.stdout)
    if log_path:
        with open(log_path, "w") as f:
            f.write(proc.stdout)
    if check and proc.returncode != 0:
        raise RuntimeError(f"stage failed (rc={proc.returncode}): {cmd}")
    return proc.stdout


# ---------------------------------------------------------------- presets

# every shipped reference config is a runbook row (VERDICT r3 weak #4):
# the six sweep presets share the simulation base; haze/rgb/prior use
# their own reference config's surface
PRESET_BASES = {
    "reference": "osmosis_simulation_sample_config.yaml",
    "fast": "osmosis_simulation_sample_config.yaml",
    "turbo": "osmosis_simulation_sample_config.yaml",
    "x0": "osmosis_simulation_sample_config.yaml",
    "x0_turbo": "osmosis_simulation_sample_config.yaml",
    "hybrid": "osmosis_simulation_sample_config.yaml",
    "hybrid_turbo": "osmosis_simulation_sample_config.yaml",
    "haze": "osmosis_haze_sample_config.yaml",
    "rgb": "rgb_guidance_sample_config.yaml",
    "prior": "RGBD_sample_config.yaml",
}


def _load_cfg(path):
    with open(path) as f:
        return yaml.safe_load(f)


def make_preset_cfg(base_cfg, name, *, checkpoint, sim_dir, out_dir,
                    stop_after, tiny_unet=None, optimizer=None):
    """One sweep variant from its reference base config. Returns (cfg, path)."""
    cfg = copy.deepcopy(base_cfg)
    cfg["save_dir"] = os.path.join(out_dir, name)
    cfg["unet_model"]["model_path"] = checkpoint
    if tiny_unet:
        cfg["unet_model"].update(tiny_unet)
    cfg["data"].update(
        root=os.path.join(sim_dir, "input"),
        gt_rgb=os.path.join(sim_dir, "gt_rgb"),
        gt_depth=os.path.join(sim_dir, "gt_depth"),
        stop_after=stop_after, ground_truth=True,
    )
    cfg["record_process"] = False

    params = cfg["conditioning"]["params"]
    tiny = tiny_unet is not None
    if tiny and name in ("haze", "rgb"):
        # the underwater bases get their tiny shortening in main(); these
        # presets carry their own reference base configs
        cfg["diffusion"].update(sampler="ddim", timestep_respacing="ddim5")
        cfg["sample_pattern"]["n_iter"] = 2
    if name == "fast":
        # tiny self-test keeps the base's short chain; real runs get ddim200
        if not tiny:
            cfg["diffusion"].update(sampler="ddim", timestep_respacing="ddim200")
        _scale_etas(cfg, 5.0)  # 5x fewer steps -> 5x phi eta (VALIDATION 3a)
    elif name == "turbo":
        if not tiny:
            cfg["diffusion"].update(sampler="ddim", timestep_respacing="ddim100")
        _scale_etas(cfg, 10.0)
    elif name == "x0":
        # x0-gradient mode: no UNet backward; halve the scale, keep the
        # ratio (VALIDATION 3e scale recipe)
        params["gradient_x_prev"] = False
        params["scale"] = _scale_guidance(params["scale"], 0.5)
    elif name == "x0_turbo":
        # the measured-best toy-scale operating point (VALIDATION 3a-ii /
        # PERF round 13): x0 mode at the turbo step count. Etas get the
        # fast preset's 5x only — the 3a-ii grid measured NO further
        # short-chain compensation needed for the x0 mode (and upscaling
        # measured harmful at 128px)
        params["gradient_x_prev"] = False
        params["scale"] = _scale_guidance(params["scale"], 0.5)
        if not tiny:
            cfg["diffusion"].update(sampler="ddim", timestep_respacing="ddim100")
        _scale_etas(cfg, 5.0)
    elif name == "hybrid":
        params["x_prev_every"] = 4
    elif name == "hybrid_turbo":
        # the 25-step operating point (osmosis_sample_hybrid_turbo_config
        # .yaml): hybrid k=4 at ddim25, FULL scale, fast-preset 5x etas
        # (3a-ii: bracket further compensation on real weights, don't
        # extrapolate). 25 % 4 = 1 exercises the epilogue block.
        params["x_prev_every"] = 4
        if not tiny:
            cfg["diffusion"].update(sampler="ddim", timestep_respacing="ddim25")
        _scale_etas(cfg, 5.0)
    elif name == "haze":
        # the haze reference preset degammas its (gamma-encoded photo)
        # inputs; the simulation set is linear-coded PNGs, so degamma off
        cfg["degamma_input"] = False
    elif name not in ("reference", "rgb"):
        raise ValueError(name)
    if optimizer:
        cfg["measurement"]["operator"]["optimizer"] = optimizer

    path = os.path.join(out_dir, f"cfg_{name}{'_' + optimizer if optimizer else ''}.yaml")
    with open(path, "w") as f:
        yaml.dump(cfg, f)
    return cfg, path


def _scale_etas(cfg, factor):
    op = cfg["measurement"]["operator"]
    for k in list(op):
        if k.endswith("_eta"):
            op[k] = float(op[k]) * factor


def _scale_guidance(scale, factor):
    vals = [float(s) for s in str(scale).split(",")]
    return ",".join(str(v * factor) for v in vals)


# ------------------------------------------------------------ health checks

def parse_phi_rows(run_dir):
    """progress.json rows -> {phi_name: final_value_list} per image."""
    rows = []
    p = os.path.join(run_dir, "progress.json")
    if os.path.exists(p):
        with open(p) as f:
            rows = [json.loads(line) for line in f if line.strip()]
    return rows


def check_phi_stall(cfg, run_dir, stall_rel=0.01, loss_high_rel=0.5):
    """True (stalled) when every learned phi channel moved <1% from its
    init on every image WHILE the measurement loss stayed high — with a
    nonzero eta that means the optimizer is stuck (FUTURE.md #1: retry
    with adam). A run whose phi froze because the init was already near
    truth announces itself with a low final loss and is NOT a stall (no
    point re-running hours of chain on adam)."""
    rows = parse_phi_rows(run_dir)
    if not rows:
        return False
    op = cfg["measurement"]["operator"]
    inits = {}
    for k, v in op.items():
        if k.startswith("phi_") and not k.endswith(("_eta", "_learn_flag")):
            inits[k] = np.fromstring(str(v), sep=",")
    moved = []
    for r in rows:
        for pname, init in inits.items():
            eta = float(op.get(f"{pname}_eta", 0))
            if eta == 0 or not op.get(f"{pname}_learn_flag", True):
                continue
            for ci, iv in enumerate(init):
                fv = r.get(f"{pname}_{ci}")
                if fv is None:
                    continue
                denom = max(abs(iv), 1e-6)
                moved.append(abs(fv - iv) / denom >= stall_rel)
    if not (bool(moved) and not any(moved)):
        return False
    # phi froze — only a stall if the loss was NOT driven down. Judge from
    # the per-chain telemetry (rows run t=T-1..0, so the last row is the
    # chain's final loss); without telemetry keep the displacement verdict.
    log = os.path.join(run_dir, "log.txt")
    if os.path.exists(log):
        per_chain_converged = []
        for chain in parse_chain_telemetry(log):
            ls = np.asarray([loss for _, loss, _ in chain], float)
            ls = ls[np.isfinite(ls)]
            if ls.size >= 2 and ls.max() > 0:
                per_chain_converged.append(ls[-1] <= loss_high_rel * ls.max())
        if per_chain_converged and all(per_chain_converged):
            return False
    return True


_TELEMETRY_HEADER = "chain telemetry (scan trace"
# x0_std is optional: restore.py omits it when x0_std_trace is None, and the
# loss-convergence exemption in check_phi_stall must still see those rows
# (ADVICE r4 — a loss-only run would otherwise always re-trigger the adam
# retry because the stall gate never saw a converged loss)
_TELEMETRY_ROW = re.compile(
    r"^\s+t=\s*(\d+)\s+loss=\s*(\S+)(?:\s+x0_std=(\S+))?"
)


def parse_chain_telemetry(log_path):
    """log.txt -> one [(t, loss, x0_std), ...] list per chain, from the post-chain
    _log_trace_summary blocks (restore.py). Each image/chain emits its own
    block, so contraction is judged within a chain — never across the
    concatenation of all images' rows (VERDICT r3 weak #2). The live
    `progress N/T ... x0_std=` rows from progress_segments don't match the
    block-row shape and are excluded."""
    chains, cur = [], None
    with open(log_path) as f:
        for line in f:
            if _TELEMETRY_HEADER in line:
                cur = []
                chains.append(cur)
                continue
            m = _TELEMETRY_ROW.match(line) if cur is not None else None
            if m is not None:
                try:
                    loss = float(m.group(2))
                except ValueError:
                    loss = float("nan")
                # absent token -> None (loss-only telemetry); an x0_std
                # that PRINTED as nan/garbage stays NaN so a diverged
                # chain still FAILS the contraction gate — conflating the
                # two made all-nan chains silently pass (review r5)
                if m.group(3) is None:
                    std = None
                else:
                    try:
                        std = float(m.group(3))
                    except ValueError:
                        std = float("nan")
                cur.append((int(m.group(1)), loss, std))
            elif cur is not None:
                cur = None  # any non-row line closes the block
    return [c for c in chains if c]


def check_x0_contraction(run_dir):
    """Per-chain health gate on the x0-hat amplitude telemetry (restore.py
    _log_trace_summary). A healthy chain contracts from its early-chain
    maximum toward the prior's scene scale by mid-chain (VALIDATION.md
    3b-iv); every chain in the run must contract. Returns (ok, detail)."""
    log = os.path.join(run_dir, "log.txt")
    if not os.path.exists(log):
        return True, "no log"
    # a chain whose rows carried no x0_std TOKEN at all (loss-only
    # telemetry, std None on every row) has nothing to gate — distinct
    # from a chain whose std printed as nan (divergence), which must
    # still fail below
    chains = [
        [(t, loss, float("nan") if std is None else std)
         for t, loss, std in c]
        for c in parse_chain_telemetry(log)
        if len(c) >= 4 and any(std is not None for _, _, std in c)
    ]
    if not chains:
        return True, "no x0_std telemetry"
    details, all_ok = [], True
    for ci, rows in enumerate(chains):
        ts = np.asarray([r[0] for r in rows], float)
        vals = np.asarray([r[-1] for r in rows], float)
        # rows run t=T-1..0; "early" = the highest-t quarter of the chain,
        # "mid" = the row nearest t=T/2 — positions inside THIS chain
        T = ts.max() + 1
        early = vals[ts >= 0.75 * (T - 1)]
        early_max = float(early.max()) if early.size else float(vals[0])
        mid = float(vals[np.argmin(np.abs(ts - T / 2))])
        ok = bool(np.isfinite(vals).all() and mid <= early_max * 0.95)
        all_ok &= ok
        details.append(
            f"chain {ci}: early_max={early_max:.3f} mid={mid:.3f} "
            f"{'ok' if ok else 'NO CONTRACTION'}"
        )
    return all_ok, f"{len(chains)} chain(s): " + "; ".join(details)


def score_run(run_dir, sim_dir, image_size=256, use_manifest=True):
    """PSNR/SSIM + recovered-phi MAE via tools/evaluate.py (prints JSON)."""
    rgb = os.path.join(run_dir, "single_images", "rgb")
    if not os.path.isdir(rgb):
        return {"error": "no outputs"}
    cmd = [
        sys.executable, os.path.join(TOOLS, "evaluate.py"),
        "--results", rgb, "--gt", os.path.join(sim_dir, "gt_rgb"),
        "--resize-gt", str(image_size),
    ]
    manifest = os.path.join(sim_dir, "manifest.json")
    if use_manifest and os.path.exists(manifest):
        cmd += ["--manifest", manifest, "--run", run_dir]
    out = sh(cmd, check=False)
    # evaluate.py prints its report as ONE JSON line on stdout, but stderr
    # is merged (stray brace-bearing warnings/tracebacks) — parse the LAST
    # line that decodes as a JSON object rather than a greedy brace match,
    # and never let a parse failure abort the runbook mid-sweep
    for line in reversed(out.splitlines()):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return {"error": "no score parsed", "tail": out.splitlines()[-3:]}


# ------------------------------------------------------------------- main

def run_prior_smoke(ctx, report):
    """Stage 4 row for the unconditional RGBD prior-sampling surface
    (configs/RGBD_sample_config.yaml): sample N images, gate on outputs
    being present, decodable, finite and non-constant."""
    import numpy as np
    from PIL import Image

    from osmosis_tpu.pipelines import run_prior_sampling

    cfg = _load_cfg(os.path.join(REPO, "configs", PRESET_BASES["prior"]))
    cfg["save_dir"] = os.path.join(ctx["out_dir"], "prior")
    cfg["unet_model"]["model_path"] = ctx["checkpoint"]
    tiny = ctx["tiny_unet"] is not None
    if tiny:
        cfg["unet_model"].update(ctx["tiny_unet"])
        cfg["diffusion"].update(timestep_respacing=5)
    cfg["number_of_images"] = 2 if tiny else 4
    cfg["record_process"] = False
    path = os.path.join(ctx["out_dir"], "cfg_prior.yaml")
    with open(path, "w") as f:
        yaml.dump(cfg, f)
    t0 = time.time()
    run_dir = run_prior_sampling(path)
    _record_stage("preset:prior", time.time() - t0,
                  n_images=cfg["number_of_images"])

    rgb_dir = os.path.join(run_dir, "single_images", "rgb")
    names = sorted(os.listdir(rgb_dir)) if os.path.isdir(rgb_dir) else []
    ok = len(names) == cfg["number_of_images"]
    stats = []
    for n in names:
        arr = np.asarray(Image.open(os.path.join(rgb_dir, n)), dtype=float)
        stats.append({"name": n, "mean": round(float(arr.mean()), 2),
                      "std": round(float(arr.std()), 2)})
        # non-constant: a collapsed/NaN chain clips to a flat image
        ok = ok and bool(np.isfinite(arr).all()) and arr.std() > 1.0
    entry = {
        "config": path, "run_dir": run_dir,
        "score": {"n_images": len(names)},
        "prior_stats": stats,
        "x0_std_contraction": {
            "ok": bool(ok),
            "detail": "prior smoke gate: outputs present/finite/non-constant",
        },
    }
    if not ok:
        print(f"[runbook] WARNING prior: smoke gate failed ({stats})")
    report["presets"]["prior"] = entry
    return entry


def run_preset(name, ctx, report):
    """Stage 3/4 worker: run one preset through the production pipeline,
    health-check it, auto-retry with adam on a phi stall, score it."""
    from osmosis_tpu.pipelines import run_restoration

    kw = dict(ctx)
    sim_haze = kw.pop("sim_dir_haze", None)
    if name == "prior":
        return run_prior_smoke(kw, report)
    if name == "haze":
        kw["sim_dir"] = sim_haze
    base_cfg = kw.pop("base_cfg")[name]
    use_manifest = name != "rgb"  # identity operator: no phi to recover

    cfg, path = make_preset_cfg(base_cfg, name, **kw)
    t0 = time.time()
    run_dir = run_restoration(path)
    # per-image seconds from the run's own progress rows: image 1 absorbs
    # the (remote) compile, so image0 - steady ≈ this session's compile
    # cost for the preset's executable (cold vs warm cache shows up here)
    per_img = [r["seconds"] for r in parse_phi_rows(run_dir)
               if "seconds" in r]
    steady = (sum(per_img[1:]) / len(per_img[1:])) if len(per_img) > 1 else None
    _record_stage(
        f"preset:{name}", time.time() - t0,
        per_image=[round(s, 1) for s in per_img],
        steady_s_per_image=round(steady, 1) if steady else None,
        compile_estimate_s=round(per_img[0] - steady, 1)
        if steady and per_img else None,
    )
    entry = {"config": path, "run_dir": run_dir}

    size = (kw["tiny_unet"] or {}).get("image_size", 256)
    stalled = check_phi_stall(cfg, run_dir)
    if stalled and cfg["measurement"]["operator"].get("optimizer") != "adam":
        print(f"[runbook] {name}: phi stall detected -> retrying with adam")
        cfg2, path2 = make_preset_cfg(base_cfg, name, optimizer="adam", **kw)
        t0 = time.time()
        run_dir2 = run_restoration(path2)
        _record_stage(f"preset:{name}:adam-retry", time.time() - t0)
        entry.update(phi_stall_sgd=True, adam_run_dir=run_dir2)
        s1 = score_run(run_dir, kw["sim_dir"], size, use_manifest)
        s2 = score_run(run_dir2, kw["sim_dir"], size, use_manifest)
        if s2.get("psnr_mean", -1) > s1.get("psnr_mean", -1):
            entry.update(score=s2, kept="adam", score_sgd=s1)
            run_dir = run_dir2
        else:
            entry.update(score=s1, kept="sgd", score_adam=s2)
    else:
        entry["score"] = score_run(run_dir, kw["sim_dir"], size, use_manifest)

    ok, detail = check_x0_contraction(run_dir)
    entry["x0_std_contraction"] = {"ok": ok, "detail": detail}
    if not ok:
        print(f"[runbook] WARNING {name}: x0_std did not contract ({detail}) "
              "— off-manifold chain; see VALIDATION.md 3b-iv probe ladder")
    report["presets"][name] = entry
    return entry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None, help="osmosis_outdoor.pt")
    ap.add_argument("--gt-rgb", default=None, help="clean RGB dir (e.g. NYUv2)")
    ap.add_argument("--gt-depth", default=None, help="uint16 depth dir")
    ap.add_argument("--sim-dir", default=None,
                    help="pre-built simulation set (input/gt_rgb/gt_depth)")
    ap.add_argument("--sim-dir-haze", default=None,
                    help="pre-built HAZE simulation set for the haze preset")
    ap.add_argument("--out", default="runbook_results")
    ap.add_argument("--stop-after", type=int, default=5,
                    help="images per preset (full protocol: -1 = all)")
    ap.add_argument("--presets",
                    default="reference,fast,turbo,x0,x0_turbo,hybrid,"
                            "hybrid_turbo,haze,rgb,prior",
                    help="comma list; one row per reference surface "
                         f"(known: {','.join(sorted(PRESET_BASES))})")
    ap.add_argument("--tiny", action="store_true",
                    help="harness self-test: tiny random checkpoint + toy scenes")
    ap.add_argument("--rehearsal-json", default=None,
                    help="also write a dated per-stage wall-clock artifact "
                         "here (production-scale rehearsal record, "
                         "VERDICT r4 #4 — e.g. docs/data/runbook_rehearsal.json)")
    args = ap.parse_args()

    presets = [p.strip() for p in args.presets.split(",") if p.strip()]
    unknown = [p for p in presets if p not in PRESET_BASES]
    if unknown:
        ap.error(f"unknown presets: {unknown}")

    # stage subprocesses run with cwd=REPO while the in-process pipeline
    # stages run in the caller's cwd — absolutize every path argument so a
    # launch from outside the repo root doesn't split artifacts across two
    # relative dirs (or lose the stage-1 checkpoint)
    for attr in ("checkpoint", "gt_rgb", "gt_depth", "sim_dir",
                 "sim_dir_haze", "out"):
        v = getattr(args, attr)
        if v:
            setattr(args, attr, os.path.abspath(v))

    os.makedirs(args.out, exist_ok=True)
    report = {"checkpoint": args.checkpoint, "presets": {}}
    bases = {
        name: _load_cfg(os.path.join(REPO, "configs", PRESET_BASES[name]))
        for name in presets if name != "prior"
    }
    tiny_unet = None

    if args.tiny:
        # tiny self-test runs host-side (flip inside the interpreter; the
        # axon sitecustomize ignores the env var — CLAUDE.md). Subprocess
        # stages (simulate) honor OSMOSIS_TPU_PLATFORM so the self-test
        # never depends on a live TPU relay.
        import jax

        jax.config.update("jax_platforms", "cpu")
        _SH_ENV["OSMOSIS_TPU_PLATFORM"] = "cpu"
        # tiny self-test: random torch ckpt at a small arch + toy scenes
        ckpt = os.path.join(args.out, "tiny_random.msgpack")
        sh([sys.executable, os.path.join(TOOLS, "validate_checkpoint.py"),
            "--tiny", "--skip-sample", "--out", ckpt],
           log_path=os.path.join(args.out, "stage1_convert.log"))
        tiny_unet = dict(image_size=32, num_channels=32, num_res_blocks=1,
                         channel_mult="1,2", attention_resolutions="8",
                         num_head_channels=16)
        # shorten the simulation-based sweep presets here; haze/rgb carry
        # their own base configs and shorten inside make_preset_cfg
        for name, cfg in bases.items():
            if PRESET_BASES[name].startswith("osmosis_simulation"):
                cfg["diffusion"].update(sampler="ddim",
                                        timestep_respacing="ddim5")
                cfg["sample_pattern"]["n_iter"] = 2
        args.checkpoint = ckpt
        if not args.sim_dir:
            args.sim_dir = os.path.join(args.out, "sim")
            sh([sys.executable, os.path.join(TOOLS, "simulate_degraded.py"),
                "--out", args.sim_dir, "--synth", "2", "--size", "32",
                "--operator", "underwater_physical"],
               log_path=os.path.join(args.out, "stage2_simulate.log"))
        if "haze" in presets and not args.sim_dir_haze:
            args.sim_dir_haze = os.path.join(args.out, "sim_haze")
            sh([sys.executable, os.path.join(TOOLS, "simulate_degraded.py"),
                "--out", args.sim_dir_haze, "--synth", "2", "--size", "32",
                "--operator", "haze_physical"],
               log_path=os.path.join(args.out, "stage2_simulate_haze.log"))
    else:
        if not args.checkpoint or not os.path.exists(args.checkpoint):
            ap.error("--checkpoint is required (or use --tiny for the self-test)")
        # Stage 1: convert + activation parity (fails loudly on mismatch)
        ckpt_ms = os.path.join(args.out, "osmosis_outdoor.msgpack")
        out = sh([sys.executable, os.path.join(TOOLS, "validate_checkpoint.py"),
                  "--checkpoint", args.checkpoint, "--skip-sample",
                  "--out", ckpt_ms],
                 log_path=os.path.join(args.out, "stage1_convert.log"))
        report["activation_parity"] = out.splitlines()[-3:]
        args.checkpoint = ckpt_ms

        # Stage 2: simulation set (paper protocol, README.md:93-106)
        if not args.sim_dir:
            if not (args.gt_rgb and args.gt_depth):
                ap.error("need --sim-dir or --gt-rgb/--gt-depth")
            args.sim_dir = os.path.join(args.out, "sim")
            sh([sys.executable, os.path.join(TOOLS, "simulate_degraded.py"),
                "--out", args.sim_dir, "--gt-rgb", args.gt_rgb,
                "--gt-depth", args.gt_depth, "--size", "256",
                "--operator", "underwater_physical"],
               log_path=os.path.join(args.out, "stage2_simulate.log"))
        if "haze" in presets and not args.sim_dir_haze:
            if not (args.gt_rgb and args.gt_depth):
                # a pre-built --sim-dir run can't synthesize the haze set;
                # run every other surface and flag haze instead of aborting
                # the whole runbook (it is in the default preset list)
                print("[runbook] skipping haze preset: needs --sim-dir-haze "
                      "or --gt-rgb/--gt-depth to build one", file=sys.stderr)
                presets = [p for p in presets if p != "haze"]
                report["presets"]["haze"] = {
                    "skipped": "no --sim-dir-haze and no --gt-rgb/--gt-depth "
                               "to build one"}
        if "haze" in presets and not args.sim_dir_haze:
            args.sim_dir_haze = os.path.join(args.out, "sim_haze")
            sh([sys.executable, os.path.join(TOOLS, "simulate_degraded.py"),
                "--out", args.sim_dir_haze, "--gt-rgb", args.gt_rgb,
                "--gt-depth", args.gt_depth, "--size", "256",
                "--operator", "haze_physical"],
               log_path=os.path.join(args.out, "stage2_simulate_haze.log"))

    report["checkpoint"] = args.checkpoint  # post-convert msgpack path
    ctx = dict(checkpoint=args.checkpoint, sim_dir=args.sim_dir,
               sim_dir_haze=args.sim_dir_haze, out_dir=args.out,
               stop_after=args.stop_after, tiny_unet=tiny_unet,
               base_cfg=bases)

    # Stages 3+4: reference preset, sign-off sweeps, other surfaces.
    # One preset's failure must NOT abort the sweep: on a multi-hour
    # day-one run a transient relay/compile hiccup at preset 5 of 10
    # would otherwise throw away every remaining surface (this exact
    # failure happened in the round-5 rehearsal — the remote-compile
    # service closed a connection mid-retry). Record the error as the
    # preset's row, keep going; retry once first, since relay errors are
    # usually transient.
    for name in presets:
        for attempt in (1, 2):
            t0 = time.time()
            try:
                run_preset(name, ctx, report)
                break
            except Exception as e:  # noqa: BLE001 — keep the sweep alive
                print(f"[runbook] ERROR {name} (attempt {attempt}): "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                # record the REAL elapsed time of the failed attempt — a
                # 40-minute chain that dies at the end is exactly what the
                # day-one wall-clock budget must not undercount
                _record_stage(f"preset:{name}:error", time.time() - t0,
                              error=f"{type(e).__name__}: {e}"[:300],
                              attempt=attempt)
                if attempt == 2:
                    report["presets"][name] = {
                        "error": f"{type(e).__name__}: {e}"[:500]}

    report["stage_seconds"] = STAGE_SECONDS
    with open(os.path.join(args.out, "RUNBOOK_REPORT.json"), "w") as f:
        json.dump(report, f, indent=2, default=str)
    if args.rehearsal_json:
        import jax

        total = sum(s["seconds"] for s in STAGE_SECONDS)
        rehearsal = {
            "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
            "mode": "tiny-selftest" if args.tiny else "production-geometry",
            "device": str(jax.devices()[0]),
            "stop_after": args.stop_after,
            "presets": presets,
            "stages": STAGE_SECONDS,
            "total_seconds": round(total, 1),
            "total_human": f"{total / 60:.1f} min",
            "note": (
                "per-preset compile_estimate_s = image0 - steady-state "
                "(this session's cache state); a COLD compilation cache "
                "adds 2-11 min per distinct executable (CLAUDE.md) on top "
                "of the steady-state budget"
            ),
        }
        os.makedirs(os.path.dirname(os.path.abspath(args.rehearsal_json)),
                    exist_ok=True)
        with open(args.rehearsal_json, "w") as f:
            json.dump(rehearsal, f, indent=1)
        print(f"[runbook] rehearsal artifact -> {args.rehearsal_json}")
    lines = ["# Real-weights runbook report", ""]
    lines.append(f"checkpoint: `{report['checkpoint']}`")
    lines.append("")
    lines.append("| preset | PSNR | SSIM | phi MAE | x0_std contracts | notes |")
    lines.append("|---|---|---|---|---|---|")
    for name, e in report["presets"].items():
        s = e.get("score", {})
        notes = []
        if e.get("phi_stall_sgd"):
            notes.append(f"phi stalled on sgd; kept {e['kept']}")
        if e.get("skipped"):
            notes.append(f"SKIPPED: {e['skipped']}")
        if e.get("error"):
            notes.append(f"ERROR: {e['error']}")
        contraction = e.get("x0_std_contraction", {}).get("ok", "n/a")
        lines.append(
            f"| {name} | {s.get('psnr_mean', 'n/a')} | "
            f"{s.get('ssim_mean', 'n/a')} | {s.get('phi_mae', 'n/a')} | "
            f"{contraction} | {'; '.join(notes) or '-'} |"
        )
    lines += ["", "Paper protocol: PSNR/SSIM vs GT on the NYUv2-simulated set "
              "(reference README.md:93-106). Compare against the paper's "
              "table 1 for parity sign-off."]
    with open(os.path.join(args.out, "RUNBOOK_REPORT.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
