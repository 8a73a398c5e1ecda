"""Smoke test for the real-weights day-one runbook (VERDICT round-2 #4).

The full 5-preset self-test is a tool-level check
(`python tools/real_weights_runbook.py --tiny`, ~12 min on this host); the
suite runs the single-preset variant: convert+parity -> simulate ->
restore -> score -> report, all through the real subprocess stages.
"""

import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _telemetry_block(rows):
    """One _log_trace_summary block exactly as restore.py writes it."""
    lines = ["chain telemetry (scan trace; step runs t=T-1..0):"]
    for t, loss, std in rows:
        lines.append(
            f"  t={t:4d} loss={loss:9.3f} x0_std={std:.3f}"
            " {'phi_a': [1.1, 0.95, 0.95]}"
        )
    return "\n".join(lines)


def _progress_row(done, total, t, std):
    """A progress_segments live row (restore.py chain() logger) — carries an
    x0_std= token that the contraction gate must NOT treat as chain
    telemetry."""
    return (f"  progress {done:4d}/{total} steps (t={t})"
            f" loss={100.0:9.3f} x0_std={std:.3f}")


def _write_log(tmp_path, name, text):
    d = tmp_path / name
    d.mkdir()
    (d / "log.txt").write_text(text + "\n")
    return str(d)


def test_x0_contraction_gate_per_chain(tmp_path):
    """VERDICT r3 weak #2: the x0_std health gate must score each chain
    (one _log_trace_summary block) separately, not the concatenation of
    every x0_std= token in log.txt, and must ignore progress_segments
    rows."""
    from tools.real_weights_runbook import check_x0_contraction

    ts = [999, 888, 777, 666, 555, 444, 333, 222, 111, 0]

    # healthy: contracts from 1.6 toward the scene scale by mid-chain
    contracting = [1.6, 1.5, 1.2, 0.9, 0.6, 0.45, 0.4, 0.37, 0.35, 0.34]
    run = _write_log(tmp_path, "ok", _telemetry_block(
        list(zip(ts, [12.0] * 10, contracting))))
    ok, detail = check_x0_contraction(run)
    assert ok, detail

    # off-manifold: flat amplitude — but preceded by progress rows whose
    # large x0_std values would fake an "early max" if swallowed
    flat = [1.0] * 10
    text = "\n".join([
        _progress_row(250, 1000, 749, 9.999),
        _progress_row(500, 1000, 499, 9.999),
        _telemetry_block(list(zip(ts, [50.0] * 10, flat))),
    ])
    run = _write_log(tmp_path, "flat", text)
    ok, detail = check_x0_contraction(run)
    assert not ok, detail

    # 2-image mix that a whole-file parse mis-scores: image A flat at 1.0,
    # image B flat at 0.5 — concatenated, vals[n//2] (0.5) is below image
    # A's "early max" (1.0) and the gate would pass two non-contracting
    # chains
    text = "\n".join([
        _telemetry_block(list(zip(ts, [50.0] * 10, [1.0] * 10))),
        "some unrelated log line",
        _telemetry_block(list(zip(ts, [50.0] * 10, [0.5] * 10))),
    ])
    run = _write_log(tmp_path, "mix", text)
    ok, detail = check_x0_contraction(run)
    assert not ok, detail

    # and the healthy 2-image mix still passes, reporting per-chain detail
    text = "\n".join([
        _telemetry_block(list(zip(ts, [12.0] * 10, contracting))),
        _telemetry_block(list(zip(ts, [12.0] * 10, [s * 2 for s in contracting]))),
    ])
    run = _write_log(tmp_path, "mix_ok", text)
    ok, detail = check_x0_contraction(run)
    assert ok, detail
    assert "2 chain" in detail or "chains=2" in detail

    # no telemetry at all -> pass-through (can't judge)
    run = _write_log(tmp_path, "empty", "nothing here")
    ok, detail = check_x0_contraction(run)
    assert ok


def test_phi_stall_gate_requires_high_final_loss(tmp_path):
    """Review r4: frozen phi with a low final loss is a CONVERGED run
    (init near truth), not a stall — the gate must not trigger the hours-
    long adam re-run for it. Frozen phi + flat loss stays a stall."""
    from tools.real_weights_runbook import check_phi_stall

    cfg = dict(measurement=dict(operator=dict(
        name="underwater_physical_revised", optimizer="sgd",
        phi_a="1.1,0.95,0.95", phi_a_eta=1e-5, phi_a_learn_flag=True,
        phi_b="0.95,0.8,0.8", phi_b_eta=0.0,
        phi_inf="0.14,0.29,0.49", phi_inf_eta=0.0)))
    frozen = {"phi_a_0": 1.1, "phi_a_1": 0.95, "phi_a_2": 0.95}
    ts = [40, 30, 20, 10, 0]

    def mk(name, losses):
        d = tmp_path / name
        d.mkdir()
        (d / "progress.json").write_text(json.dumps(frozen) + "\n")
        (d / "log.txt").write_text(_telemetry_block(
            list(zip(ts, losses, [1.0, 0.8, 0.6, 0.5, 0.5]))) + "\n")
        return str(d)

    # loss driven down 100 -> 5 while phi froze: converged, NOT a stall
    assert check_phi_stall(cfg, mk("converged", [100, 60, 30, 10, 5])) is False
    # loss flat at its max while phi froze: a real stall
    assert check_phi_stall(cfg, mk("stuck", [100, 99, 98, 97, 96])) is True
    # no telemetry -> displacement-only verdict is kept (old behavior)
    d = tmp_path / "nolog"
    d.mkdir()
    (d / "progress.json").write_text(json.dumps(frozen) + "\n")
    assert check_phi_stall(cfg, str(d)) is True
    # phi actually moved -> never a stall regardless of loss
    moved = dict(frozen, phi_a_0=0.9)
    d = tmp_path / "moved"
    d.mkdir()
    (d / "progress.json").write_text(json.dumps(moved) + "\n")
    assert check_phi_stall(cfg, str(d)) is False


def test_runbook_prebuilt_simdir_skips_haze_instead_of_aborting(
        tmp_path, monkeypatch):
    """Review r4: `--sim-dir <prebuilt>` without --gt-rgb/--gt-depth is a
    documented invocation; with haze in the default preset list it must run
    the other surfaces and flag haze as skipped, not ap.error out before
    any preset runs."""
    import tools.real_weights_runbook as rb

    ckpt = tmp_path / "ck.pt"
    ckpt.write_bytes(b"x")
    sim = tmp_path / "sim"
    sim.mkdir()
    out = tmp_path / "out"

    calls = []
    monkeypatch.setattr(rb, "sh", lambda cmd, log_path=None, check=True:
                        "parity ok\nrel err 0\nconverted\n")
    monkeypatch.setattr(rb, "run_preset",
                        lambda name, ctx, report:
                        (calls.append(name),
                         report["presets"].setdefault(name, {"ran": True})))
    monkeypatch.setattr(sys, "argv", [
        "real_weights_runbook.py", "--checkpoint", str(ckpt),
        "--sim-dir", str(sim), "--out", str(out),
        "--presets", "reference,fast,haze,prior"])
    rb.main()

    assert calls == ["reference", "fast", "prior"]  # haze dropped, rest ran
    with open(out / "RUNBOOK_REPORT.json") as f:
        report = json.load(f)
    assert "skipped" in report["presets"]["haze"]
    md = (out / "RUNBOOK_REPORT.md").read_text()
    assert "SKIPPED" in md  # the skip is visible in the report table


def test_runbook_tiny_single_preset(tmp_path):
    out = str(tmp_path / "rb")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "real_weights_runbook.py"),
         "--tiny", "--out", out, "--stop-after", "1",
         "--presets", "reference,prior"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout[-4000:]

    with open(os.path.join(out, "RUNBOOK_REPORT.json")) as f:
        report = json.load(f)
    assert report["checkpoint"] and report["checkpoint"].endswith(".msgpack")
    entry = report["presets"]["reference"]
    # the scoring stage ran and produced both metrics + recovered-phi MAE
    assert "psnr_mean" in entry["score"] and "ssim_mean" in entry["score"]
    assert "phi_mae" in entry["score"]
    # health checks recorded (values are garbage with random weights —
    # the contract is that they RAN)
    assert "x0_std_contraction" in entry
    # the unconditional prior-sampling surface has its own runbook row
    # (VERDICT r3 weak #4): N sampled images, smoke-gated
    prior = report["presets"]["prior"]
    assert prior["score"]["n_images"] == 2
    assert len(prior["prior_stats"]) == 2
    assert prior["x0_std_contraction"]["ok"] is True
    assert os.path.exists(os.path.join(out, "RUNBOOK_REPORT.md"))


def test_runbook_preset_failure_does_not_abort_sweep(tmp_path, monkeypatch):
    """Round-5 rehearsal regression: a transient relay/compile error in ONE
    preset killed the remaining five surfaces of a 42-minute run. The sweep
    loop must retry once, then record the error as that preset's row and
    keep going."""
    import tools.real_weights_runbook as rb

    ckpt = tmp_path / "ck.pt"
    ckpt.write_bytes(b"x")
    sim = tmp_path / "sim"
    sim.mkdir()
    out = tmp_path / "out"

    calls = []

    def fake_run_preset(name, ctx, report):
        calls.append(name)
        if name == "fast":
            raise RuntimeError("remote_compile: response body closed")
        report["presets"].setdefault(name, {"ran": True})

    monkeypatch.setattr(rb, "sh", lambda cmd, log_path=None, check=True:
                        "parity ok\nrel err 0\nconverted\n")
    monkeypatch.setattr(rb, "run_preset", fake_run_preset)
    monkeypatch.setattr(sys, "argv", [
        "real_weights_runbook.py", "--checkpoint", str(ckpt),
        "--sim-dir", str(sim), "--out", str(out),
        "--presets", "reference,fast,prior",
        "--rehearsal-json", str(tmp_path / "rehearsal.json")])
    rb.main()

    # fast retried once (two calls), then the sweep moved on to prior
    assert calls == ["reference", "fast", "fast", "prior"]
    with open(out / "RUNBOOK_REPORT.json") as f:
        report = json.load(f)
    assert "remote_compile" in report["presets"]["fast"]["error"]
    assert report["presets"]["prior"] == {"ran": True}
    md = (out / "RUNBOOK_REPORT.md").read_text()
    assert "ERROR" in md
    # the rehearsal artifact still lands, with the error stage recorded
    with open(tmp_path / "rehearsal.json") as f:
        rj = json.load(f)
    errs = [s for s in rj["stages"] if s["stage"] == "preset:fast:error"]
    assert len(errs) == 2 and errs[-1]["attempt"] == 2


def test_contraction_gate_nan_vs_absent_x0_std(tmp_path):
    """Review r5 regression: an all-NaN x0_std chain (divergence — the
    token PRINTED as nan) must FAIL the gate, while loss-only telemetry
    (no x0_std token at all) passes through as un-gateable. Conflating
    the two made diverged chains silently pass."""
    from tools.real_weights_runbook import (check_phi_stall,
                                            check_x0_contraction,
                                            parse_chain_telemetry)

    ts = [999, 888, 777, 666, 555, 444, 333, 222, 111, 0]

    # diverged: x0_std printed as nan on every row -> NO CONTRACTION
    lines = ["chain telemetry (scan trace; step runs t=T-1..0):"]
    for t in ts:
        lines.append(f"  t={t:4d} loss=      nan x0_std=nan {{}}")
    run = _write_log(tmp_path, "nan", "\n".join(lines))
    ok, detail = check_x0_contraction(run)
    assert not ok, detail

    # loss-only telemetry: rows without the x0_std token parse (std None)
    # and feed the stall gate's loss-convergence exemption, but the
    # contraction gate has nothing to judge
    lines = ["chain telemetry (scan trace; step runs t=T-1..0):"]
    for i, t in enumerate(ts):
        lines.append(f"  t={t:4d} loss={50.0 - 4 * i:9.3f}")
    run = _write_log(tmp_path, "lossonly", "\n".join(lines))
    ok, detail = check_x0_contraction(run)
    assert ok and "no x0_std" in detail
    chains = parse_chain_telemetry(os.path.join(run, "log.txt"))
    assert len(chains) == 1 and len(chains[0]) == 10
    assert all(std is None for _, _, std in chains[0])
    # and the loss values are real (the ADVICE r4 fix's purpose): a
    # converged loss exempts frozen phi from the stall verdict
    assert chains[0][-1][1] == 14.0
