"""tools/seed_replicate.py summary logic (VERDICT r4 #2).

The chip runs are expensive; what CAN be pinned on CPU: the mean±std
aggregation over draws, the decision checks (mode ranking, 25-step knee,
x0 step-invariance), and the skip-already-measured resume predicate.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import seed_replicate as SR  # noqa: E402


def _row(name, gain, corr, seed=None):
    r = {"row": name, "psnr_gain_db": gain, "depth_corr_mean": corr}
    if seed is not None:
        r["seed"] = seed
    return r


def test_summarize_mean_std_and_checks():
    rows = [
        # x0@50, three draws tightly clustered and clearly above hybrid
        _row("r256_s50_x0", 10.65, 0.25),
        _row("r256_s50_x0", 10.2, 0.22, seed=1),
        _row("r256_s50_x0", 10.9, 0.28, seed=2),
        # hybrid@50, three draws
        _row("r256_s50_hyb4", 8.09, 0.30),
        _row("r256_s50_hyb4", 7.5, 0.25, seed=1),
        _row("r256_s50_hyb4", 8.4, 0.33, seed=2),
        # full-grad comparator (single round-4 draw)
        _row("r256_s50_eta2.5e-4", 2.52, 0.16),
        # hybrid@25 draws well above the +1.42 collapse
        _row("r256_s25_hyb4", 6.36, 0.23),
        _row("r256_s25_hyb4", 5.9, 0.20, seed=1),
        _row("r256_s25_hyb4", 6.7, 0.25, seed=2),
        _row("r256_s25_ddpm", 1.42, 0.28),
        # x0@100 vs x0@50: within noise
        _row("r256_s100_x0", 10.59, 0.22),
        _row("r256_s100_x0", 10.4, 0.20, seed=1),
        _row("r256_s100_x0", 10.8, 0.24, seed=2),
    ]
    s = SR.summarize(rows)
    c = s["cells"]["r256_s50_x0"]
    assert c["n_draws"] == 3 and c["seeds"] == [0, 1, 2]
    assert abs(c["gain_mean"] - 10.58) < 0.01
    assert c["gain_std"] is not None and 0.3 < c["gain_std"] < 0.4

    chk = s["checks"]
    assert chk["mode_ranking_256px_50steps"]["survives"] is True
    assert chk["mode_ranking_256px_50steps"]["full_grad_gain"].startswith("2.52")
    assert chk["knee_25steps_hyb4_above_collapse"]["survives"] is True
    assert chk["x0_100_vs_50_256px"]["within_noise"] is True


def test_summarize_detects_ranking_collapse():
    """If replication pulls x0 down into hybrid's band, survives=False."""
    rows = [
        _row("r256_s50_x0", 10.65, 0.25),
        _row("r256_s50_x0", 7.0, 0.1, seed=1),   # huge seed noise
        _row("r256_s50_x0", 8.0, 0.15, seed=2),
        _row("r256_s50_hyb4", 8.09, 0.30),
        _row("r256_s50_hyb4", 8.0, 0.28, seed=1),
        _row("r256_s50_hyb4", 8.2, 0.31, seed=2),
    ]
    s = SR.summarize(rows)
    assert s["checks"]["mode_ranking_256px_50steps"]["survives"] is False


def test_single_draw_cells_have_null_std():
    s = SR.summarize([_row("r128_s100_x0", 10.43, 0.398)])
    c = s["cells"]["r128_s100_x0"]
    assert c["n_draws"] == 1 and c["gain_std"] is None


def test_have_resume_predicate():
    rows = [_row("r128_s50_x0", 10.0, 0.3, seed=1)]
    assert SR.have(rows, "r128_s50_x0", 1)
    assert not SR.have(rows, "r128_s50_x0", 2)
    assert not SR.have(rows, "r256_s50_x0", 1)


def test_cells_match_round4_grid_recipes():
    """The cell flag-sets must stay verbatim the round-4 grid recipes —
    a drifted recipe would silently measure a different operating point.
    Spot-pin the decision-relevant knobs."""
    assert "--x0-grad" in SR.CELLS["r256_s50_x0"]
    assert "--scale 8,8,8,4" in SR.CELLS["r256_s50_x0"]
    assert "--phi-eta 2.5e-4" in SR.CELLS["r256_s50_x0"]
    assert "--respacing 50" in SR.CELLS["r256_s50_x0"]
    assert "--x-prev-every 4" in SR.CELLS["r256_s25_hyb4"]
    assert "--x0-grad" not in SR.CELLS["r256_s25_hyb4"]
    assert "toy_prior256_offn.msgpack" in SR.CELLS["r256_s25_hyb4"]
    assert "--scale 4,4,4,2" in SR.CELLS["r128_s100_x0"]
    assert "--phi-eta 5e-4" in SR.CELLS["r128_s100_eta5e-4"]
    for cell in SR.CELLS.values():
        assert "--optimizer adam" in cell and "--scenes 6" in cell
