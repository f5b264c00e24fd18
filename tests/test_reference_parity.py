"""Replay parity harness (SURVEY.md hard part #6): feed the reference's own
recorded run data through OUR implementations and diff against the values
the reference itself computed and stored.

Skipped when the reference checkout isn't mounted."""

from pathlib import Path

import json

import numpy as np
import pytest

REF = Path("/root/reference/simulation/isaac")
ROAD_TEACH = REF / "routes/01_road/teach/teach/road"

needs_ref = pytest.mark.skipif(not ROAD_TEACH.is_dir(),
                               reason="reference checkout not mounted")


@needs_ref
def test_procrustes_drift_matches_reference_exactly():
    """Our 4-flip Procrustes on the reference's recorded teach run must
    reproduce the drift values the reference computed for that run
    (routes/01_road/.../metrics.json: max 0.6935, mean 0.4488)."""
    from nclt_slam_tpu.eval.metrics import procrustes_drift_2d

    raw = np.loadtxt(ROAD_TEACH / "vio_pose_dense.csv", delimiter=",",
                     skiprows=1, ndmin=2)
    vio = raw[:, 2:5]        # vio_x, vio_y, vio_z
    gt = raw[:, 9:11]        # gt_x, gt_y
    d_max, d_mean = procrustes_drift_2d(vio, gt)

    ref = json.loads((ROAD_TEACH / "metrics.json").read_text())
    assert abs(d_max - ref["drift_max"]) < 1e-3, (d_max, ref["drift_max"])
    assert abs(d_mean - ref["drift_mean"]) < 1e-3, (d_mean, ref["drift_mean"])


@needs_ref
def test_ate_on_reference_world_trajectories():
    """Our Umeyama ATE on the reference's world-aligned VIO/GT pair lands
    on the same error level as its stored drift_mean."""
    from nclt_slam_tpu.eval.metrics import ate_rmse

    vw = np.loadtxt(ROAD_TEACH / "traj_vio_world.csv", delimiter=",",
                    skiprows=1, ndmin=2)
    gw = np.loadtxt(ROAD_TEACH / "traj_gt_world.csv", delimiter=",",
                    skiprows=1, ndmin=2)
    n = min(len(vw), len(gw))
    ate = ate_rmse(vw[:n, :2], gw[:n, :2])
    ref = json.loads((ROAD_TEACH / "metrics.json").read_text())
    assert abs(ate - ref["drift_mean"]) < 0.1, (ate, ref["drift_mean"])


@needs_ref
def test_our_pgm_loader_reads_reference_teach_map():
    """Format parity: the reference's real teach_map.pgm decodes through our
    native codec AND the artefact loader, with the expected trinary values."""
    from nclt_slam_tpu.io.native import pgm_decode

    img = pgm_decode((ROAD_TEACH / "teach_map.pgm").read_bytes())
    assert img.shape == (250, 1850)
    vals = set(np.unique(img).tolist())
    assert vals <= {0, 205, 254}
    assert (img == 0).sum() > 1000       # occupied cells present

    from nclt_slam_tpu.io.artifacts import load_teach_map

    grid, res, origin = load_teach_map(ROAD_TEACH / "teach_map")
    assert grid.shape == (250, 1850)
    assert set(np.unique(grid).tolist()) <= {0, 1, 2}
    assert res == 0.1


@needs_ref
def test_endpoint_metrics_on_reference_stock_run():
    """Our endpoint metric flags on the recorded exp-74 stock run reproduce
    the published qualitative outcome for 09_se_ne (reached the turnaround,
    failed the return — routes/_common/metrics.json)."""
    from nclt_slam_tpu.eval.metrics import endpoint_metrics
    from nclt_slam_tpu.io.artifacts import load_traj_gt

    run = REF / "experiments/74_pure_stock_nav2_baseline/results/run_09"
    if not run.is_dir():
        pytest.skip("exp74 run_09 not present")
    gt = load_traj_gt(run / "traj_gt.csv")
    assert len(gt) > 1000
    spawn, turn = (65.0, -35.0), (65.0, 35.0)
    final_d, return_d, reached, returned = endpoint_metrics(gt, spawn, turn)
    pub = json.loads(
        (REF / "routes/_common/metrics.json").read_text())["09_se_ne"][
        "exp 74 stock"]
    assert reached == pub["reached_final"]
    assert returned == pub["returned_spawn"]


@needs_ref
def test_subsample_matches_reference_teach_wps():
    """Our 4 m WP subsample on the reference's dense teach poses produces a
    plausible WP list spanning the recorded route."""
    from nclt_slam_tpu.eval.metrics import subsample_wps
    from nclt_slam_tpu.io.artifacts import load_vio_pose_dense

    gt = load_vio_pose_dense(ROAD_TEACH / "vio_pose_dense.csv")
    wps = subsample_wps(gt, 4.0)
    assert 30 < len(wps) < 120
    gaps = np.hypot(*np.diff(wps, axis=0).T)
    assert gaps.min() >= 4.0 - 1e-6
