"""bench.py stdout contract (VERDICT r4 weak #1 / next #1, #5).

The driver records the LAST JSON line on bench.py's stdout as the round's
parsed metric. Round 4 lost the primary metric from the scoreboard because
the e2e north-star line printed after it. These tests drive the actual
printing path (bench.emit_results) and pin:

  * the LAST stdout JSON line is guided_denoise_steps_per_sec_256px_rgbd
    — with and without a measured e2e point (the e2e bench is allowed to
    fail without dropping the primary);
  * the e2e line still appears, BEFORE the primary, and carries the
    chain_finite health stamp (weak #4);
  * tools/bench_presets.py rows carry chain_finite and upsert into
    docs/data/preset_e2e.jsonl without dropping unmeasured points (#6).
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402
from tools import bench_presets  # noqa: E402

PRIMARY = "guided_denoise_steps_per_sec_256px_rgbd"
E2E = "fast_preset_e2e_seconds_per_image"


def _json_lines(capsys):
    out = capsys.readouterr().out
    rows = []
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            rows.append(json.loads(line))
    return rows


def test_last_line_is_primary_with_e2e(capsys):
    bench.emit_results(31.4, 67.5, e2e=(6.83, [16.2, 6.9, 6.8], False))
    rows = _json_lines(capsys)
    assert len(rows) == 2
    assert rows[-1]["metric"] == PRIMARY, (
        "driver parses the LAST stdout JSON line — it must be the primary"
    )
    assert rows[-1]["value"] == 31.4
    assert rows[0]["metric"] == E2E
    # weak #4: the e2e artifact line must carry the chain-health stamp
    assert rows[0]["chain_finite"] is False
    assert "chain_finite" in rows[0]["note"]


def test_last_line_is_primary_when_e2e_failed(capsys):
    """The e2e bench is wrapped in try/except in main(); a failure passes
    e2e=None and the primary must still be the (only, last) line."""
    bench.emit_results(31.4, 67.5, e2e=None)
    rows = _json_lines(capsys)
    assert len(rows) == 1 and rows[0]["metric"] == PRIMARY


def test_main_prints_primary_last_even_if_e2e_raises(capsys, monkeypatch):
    """Drive the REAL bench.main() (not a re-implementation of its tail):
    stub only the chip measurements, make the e2e bench raise, and assert
    stdout still ends with the primary line. A future edit that prints
    after emit_results or drops the e2e try/except fails here."""
    monkeypatch.setattr(bench, "measure_primary", lambda: 30.0)
    monkeypatch.setattr(bench, "measure_prior", lambda: 60.0)
    monkeypatch.setattr(
        bench, "bench_fast_preset_e2e",
        lambda n_images=3: (_ for _ in ()).throw(RuntimeError("no chip")))
    bench.main()
    rows = _json_lines(capsys)
    assert len(rows) == 1 and rows[-1]["metric"] == PRIMARY


def test_main_prints_primary_last_with_e2e(capsys, monkeypatch):
    """Same, happy path: main() emits e2e-then-primary in order."""
    monkeypatch.setattr(bench, "measure_primary", lambda: 30.0)
    monkeypatch.setattr(bench, "measure_prior", lambda: 60.0)
    monkeypatch.setattr(
        bench, "bench_fast_preset_e2e",
        lambda n_images=3: (6.8, [16.0, 6.8, 6.8], True))
    bench.main()
    rows = _json_lines(capsys)
    assert [r["metric"] for r in rows] == [E2E, PRIMARY]
    assert rows[0]["chain_finite"] is True


def test_bench_presets_row_has_chain_finite(monkeypatch, capsys):
    monkeypatch.setattr(
        bench_presets, "measure_preset_e2e",
        lambda *a, **k: (1.5, [9.0, 1.5, 1.5], 12.0, True))
    row = bench_presets.run_point("osmosis_sample_x0_config.yaml",
                                  "ddim50", tag="x0_50")
    assert row["chain_finite"] is True
    assert row["steady_s_per_image"] == 1.5
    printed = _json_lines(capsys)
    assert printed[-1]["point"] == "x0_50"


def test_preset_jsonl_upsert_preserves_other_points(tmp_path):
    path = str(tmp_path / "preset_e2e.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"point": "x0_200", "steady_s_per_image": 3.49,
                            "chain_finite": None}) + "\n")
        f.write(json.dumps({"point": "hyb_50", "steady_s_per_image": 1.49,
                            "chain_finite": None}) + "\n")
    bench_presets.upsert_jsonl(
        [{"point": "hyb_50", "steady_s_per_image": 1.44,
          "chain_finite": False}], path=path)
    with open(path) as f:
        rows = {r["point"]: r for r in map(json.loads, f) if r}
    assert rows["x0_200"]["steady_s_per_image"] == 3.49  # untouched
    assert rows["hyb_50"]["steady_s_per_image"] == 1.44  # updated
    assert rows["hyb_50"]["chain_finite"] is False
    # row order follows POINTS for stable diffs
    with open(path) as f:
        order = [json.loads(l)["point"] for l in f if l.strip()]
    assert order == ["x0_200", "hyb_50"]


def test_hyb_25_point_exists():
    """VERDICT r4 #3: the grid's 25-step recommendation must be measurable
    as a named operating point."""
    assert "hyb_25" in bench_presets.POINTS
    cfg, resp = bench_presets.POINTS["hyb_25"]
    assert cfg == "osmosis_sample_hybrid_config.yaml" and resp == "ddim25"


@pytest.mark.parametrize("flags,expect", [
    ([{"chain_finite": True}, {"chain_finite": True}], True),
    ([{"chain_finite": True}, {"chain_finite": False}], False),
    ([{}, {}], None),
])
def test_chain_finite_aggregation(tmp_path, monkeypatch, flags, expect):
    """measure_preset_e2e folds per-image chain_finite stamps: all-finite
    → True, any diverged → False, no stamps (old pipeline) → None."""
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    rows = []
    for i, extra in enumerate(flags):
        rows.append({"seconds": 1.0 + i, **extra})
    with open(run_dir / "progress.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    import osmosis_tpu.pipelines as P
    monkeypatch.setattr(P, "run_restoration", lambda cfg: str(run_dir))
    steady, secs, wall, chain_finite = bench_presets.measure_preset_e2e(
        os.path.join(bench_presets.REPO, "configs",
                     "osmosis_sample_fast_config.yaml"),
        n_images=2, tag="t")
    assert chain_finite is expect
    assert secs == [1.0, 2.0] and steady == 2.0
