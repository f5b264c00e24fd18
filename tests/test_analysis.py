"""Analysis zoo: every thesis-figure generator produces its artefact from
synthetic campaign data (the reference's scripts/analysis equivalents)."""

import json

import numpy as np
import pytest

from nclt_slam_tpu.analysis import (
    ROUTE_GROUPS,
    gen_route_readme,
    make_route_animation,
    plot_aggregate_heatmap,
    plot_dev_history,
    plot_route_group_heatmaps,
    plot_three_way,
)

ROUTES = ["01_road", "03_south", "09_se_ne"]


def fake_route_metrics(rng, good=True):
    base = 2.0 if good else 40.0
    return {
        "cov_visited": int(80 * (0.9 if good else 0.2)),
        "cov_total": 80,
        "cov_pct": 90.0 if good else 20.0,
        "final_d": base + rng.uniform(0, 2),
        "reached_final": good,
        "return_d": base + rng.uniform(0, 3),
        "returned_spawn": good,
        "drift_mean": 0.5 if good else 3.0,
        "drift_p95": 1.0 if good else 6.0,
        "drift_max": 1.5 if good else 9.0,
        "gt_samples": 12000,
    }


@pytest.fixture()
def stacks():
    rng = np.random.RandomState(0)
    return {
        "ours": {r: fake_route_metrics(rng, good=True) for r in ROUTES},
        "stock": {r: fake_route_metrics(rng, good=False) for r in ROUTES},
    }


def test_aggregate_heatmap(tmp_path, stacks):
    p = plot_aggregate_heatmap(stacks, tmp_path / "agg.png")
    assert p.exists() and p.stat().st_size > 5000


def test_route_group_heatmaps(tmp_path, stacks):
    outs = plot_route_group_heatmaps(stacks, tmp_path / "groups")
    # every group containing one of our 3 routes gets a figure
    expected = sum(1 for _, rs in ROUTE_GROUPS
                   if any(r in rs for r in ROUTES))
    assert len(outs) == expected
    assert all(p.exists() for p in outs)


class _RV:
    name = "03_south"
    spawn = (0.0, 0.0)
    turnaround = (30.0, 0.0)


class _Scene:
    xy = np.array([[10.0, 3.0], [20.0, -3.0]])
    radius = np.array([0.5, 0.5])
    valid = np.array([True, True])
    drop_mask = np.array([False, True])


def _fake_trace(n=300):
    t = np.linspace(0, 1, n)
    gt = np.stack([30 * t, np.sin(6 * t)], -1).astype(np.float32)
    return {
        "gt_xy": gt,
        "nav_xy": gt + 0.3 * np.random.RandomState(1).randn(n, 2).astype(np.float32),
        "regime": np.zeros(n, np.int32),
        "anchor_ok": np.zeros(n, bool),
        "wp_idx": np.minimum((t * 8).astype(np.int32), 7),
        "done": np.zeros(n, bool),
        "fired": t > 0.5,
    }


def test_three_way(tmp_path):
    traces = {"ours": _fake_trace(), "stock": _fake_trace()}
    wps = np.zeros((8, 2), np.float32)
    wps[:, 0] = np.arange(8) * 4.0
    p = plot_three_way(_Scene, _RV, traces, wps, 8, tmp_path / "3w.png")
    assert p.exists() and p.stat().st_size > 5000


def test_route_readme(tmp_path, stacks):
    p = gen_route_readme("03_south", stacks, tmp_path / "rt",
                         route_view=_RV, figures=["three_way.png"])
    text = p.read_text()
    assert "# Route 03_south" in text
    assert "| ours |" in text and "| stock |" in text
    assert "three_way" in text


def test_route_animation(tmp_path):
    wps = np.zeros((8, 2), np.float32)
    wps[:, 0] = np.arange(8) * 4.0
    p = make_route_animation(_Scene, _RV, _fake_trace(), wps, 8,
                             tmp_path / "replay.gif", stride=60, fps=5)
    assert p.exists() and p.stat().st_size > 10000


def test_dev_history(tmp_path):
    hist = [
        ("r1", {"routes": 15, "reach": 13, "return": 6, "full_success": 6,
                "avg_coverage_pct": 88.0, "avg_drift_mean": 0.9}),
        ("r2", {"routes": 15, "reach": 15, "return": 15, "full_success": 15,
                "avg_coverage_pct": 99.0, "avg_drift_mean": 0.4}),
    ]
    p = plot_dev_history(hist, tmp_path / "hist.png")
    assert p.exists() and p.stat().st_size > 5000


def test_analyze_cli_end_to_end(tmp_path, stacks):
    """cli.analyze --campaigns regenerates the comparison set from dirs."""
    from nclt_slam_tpu.cli.analyze import main

    for stack, per in stacks.items():
        d = tmp_path / stack
        d.mkdir()
        agg = {"routes": len(ROUTES), "reach": 3, "return": 2,
               "full_success": 2, "avg_coverage_pct": 80.0,
               "avg_drift_mean": 1.0}
        (d / "metrics.json").write_text(
            json.dumps({"per_route": per, "aggregate": agg}))
    out = tmp_path / "figs"
    rc = main(["--campaigns",
               f"ours={tmp_path / 'ours'},stock={tmp_path / 'stock'}",
               "--history",
               f"r1={tmp_path / 'stock'},r2={tmp_path / 'ours'}",
               "--out", str(out)])
    assert rc == 0
    assert (out / "heatmap_aggregate.png").exists()
    assert (out / "dev_history.png").exists()
    assert any((out / "route_groups").glob("heatmap_*.png"))
