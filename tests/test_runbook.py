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


def test_runbook_tiny_single_preset(tmp_path):
    out = str(tmp_path / "rb")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "real_weights_runbook.py"),
         "--tiny", "--out", out, "--stop-after", "1",
         "--presets", "reference"],
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
    assert os.path.exists(os.path.join(out, "RUNBOOK_REPORT.md"))
