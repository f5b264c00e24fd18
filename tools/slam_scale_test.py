#!/usr/bin/env python3
"""LiDAR SLAM scale test: a km-scale synthetic session with seasonal-noise
variants, reporting the ATE ladder the reference publishes for NCLT
(datasets/nclt/CHANGELOG.md:172-175: ICP 30.2 m winter / 151-188 m other
seasons over 7.3 km).

    python tools/slam_scale_test.py --scans 2000 --out runs/slam_scale.json

Builds a forest world, drives a closed loop (so real loop closures exist),
simulates range-limited scans with per-season jitter/dropout, and runs the
full pipeline (device-resident scanned ICP odometry -> two-stage ScanContext
loop detection -> FPFH-RANSAC+ICP loop registration -> 2-D PGO) at three
degradation levels.  Prints a markdown ATE ladder + writes JSON.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_world(rng, n_trees=900, extent=260.0):
    """Forest world: point clusters on vertical trunks (structure the ICP
    and ScanContext can latch onto)."""
    pts = []
    xy = rng.uniform(-extent, extent, (n_trees, 2))
    for i in range(n_trees):
        m = 14
        ang = rng.uniform(0, 2 * np.pi, m)
        r = 0.25 + 0.3 * rng.rand()
        z = rng.uniform(0.2, 6.0, m)
        pts.append(np.column_stack([xy[i, 0] + r * np.cos(ang),
                                    xy[i, 1] + r * np.sin(ang), z]))
    return np.concatenate(pts).astype(np.float32)


def loop_trajectory(n_scans, radius=180.0, laps=2.0):
    """Closed loop (laps > 1 -> guaranteed revisits) with gentle wobble."""
    s = np.linspace(0, laps * 2 * np.pi, n_scans)
    x = radius * np.cos(s)
    y = radius * np.sin(s) * 0.7
    yaw = np.arctan2(np.gradient(y), np.gradient(x))
    return np.column_stack([x, y]).astype(np.float32), yaw.astype(np.float32)


def make_scans(world, traj_xy, traj_yaw, rng, n_pts=1024, max_range=45.0,
               jitter=0.02, dropout=0.0):
    """Range-limited scans in the sensor frame + validity masks."""
    T = len(traj_xy)
    scans = np.zeros((T, n_pts, 3), np.float32)
    valid = np.zeros((T, n_pts), bool)
    for t in range(T):
        d = np.linalg.norm(world[:, :2] - traj_xy[t], axis=1)
        near = np.flatnonzero(d < max_range)
        if dropout > 0:
            near = near[rng.rand(len(near)) > dropout]
        take = near[np.argsort(d[near])[:n_pts]]
        k = len(take)
        rel = world[take] - np.array([*traj_xy[t], 0.0], np.float32)
        c, s = np.cos(-traj_yaw[t]), np.sin(-traj_yaw[t])
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        scans[t, :k] = rel @ R.T + rng.normal(0, jitter, (k, 3))
        valid[t, :k] = True
    return scans, valid


def noisy_odom(traj_xy, traj_yaw, rng, t_std=0.03, yaw_std=0.004):
    """Relative wheel-odometry predictions with drifty noise."""
    T = len(traj_xy)
    rel = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    for t in range(1, T):
        dyaw = traj_yaw[t] - traj_yaw[t - 1] + rng.normal(0, yaw_std)
        c, s = np.cos(traj_yaw[t - 1]), np.sin(traj_yaw[t - 1])
        d_world = traj_xy[t] - traj_xy[t - 1]
        dx = c * d_world[0] + s * d_world[1] + rng.normal(0, t_std)
        dy = -s * d_world[0] + c * d_world[1] + rng.normal(0, t_std)
        cr, sr = np.cos(dyaw), np.sin(dyaw)
        rel[t, :3, :3] = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
        rel[t, :3, 3] = (dx, dy, 0.0)
    return rel


def ate(poses2d, gt_xy):
    """ATE RMSE after 2-D alignment (odometry lives in the first-sensor
    frame; the GT trajectory in world — alignment removes the gauge)."""
    from nclt_slam_tpu.eval.metrics import ate_rmse

    return float(ate_rmse(np.asarray(poses2d)[:, :2], np.asarray(gt_xy)))


SEASONS = [
    ("winter (crisp)", dict(jitter=0.02, dropout=0.0)),
    ("summer (canopy)", dict(jitter=0.05, dropout=0.2)),
    ("storm (degraded)", dict(jitter=0.10, dropout=0.4)),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scans", type=int, default=2000)
    ap.add_argument("--pts", type=int, default=1024)
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from nclt_slam_tpu.datasets.slam.pipeline import run_slam

    rng = np.random.RandomState(11)
    world = build_world(rng)
    traj_xy, traj_yaw = loop_trajectory(args.scans)
    path_km = np.hypot(*np.diff(traj_xy, axis=0).T).sum() / 1000.0
    print(f"[scale] {args.scans} scans, {path_km:.2f} km path, "
          f"{len(world)} world points", flush=True)

    rows = []
    for name, noise in SEASONS:
        srng = np.random.RandomState(17)
        scans, valid = make_scans(world, traj_xy, traj_yaw, srng,
                                  n_pts=args.pts, **noise)
        odom = noisy_odom(traj_xy, traj_yaw, srng)
        t0 = time.perf_counter()
        out = run_slam(scans, valid, odom_pred=odom,
                       loop_min_gap=args.scans // 8, sc_thresh=0.35,
                       max_loops=64, sc_max_range=50.0)
        wall = time.perf_counter() - t0
        li, lj, found = out["loops"]
        row = {
            "season": name, **noise,
            "ate_open_m": round(ate(out["poses_open"], traj_xy), 2),
            "ate_optimized_m": round(ate(out["poses_optimized"], traj_xy), 2),
            "loops_accepted": int(np.asarray(found).sum()),
            "icp_rmse_mean": round(float(np.mean(out["rmses"][1:])), 3),
            "wall_s": round(wall, 1),
        }
        rows.append(row)
        print(f"[scale] {name}: open {row['ate_open_m']} m -> "
              f"optimized {row['ate_optimized_m']} m "
              f"({row['loops_accepted']} loops, {wall:.0f}s)", flush=True)

    print("\n| season | jitter | dropout | ATE open | ATE optimized | "
          "loops | wall |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['season']} | {r['jitter']} | {r['dropout']} | "
              f"{r['ate_open_m']} m | {r['ate_optimized_m']} m | "
              f"{r['loops_accepted']} | {r['wall_s']}s |")

    if args.out:
        p = Path(args.out)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(
            {"scans": args.scans, "path_km": round(path_km, 2),
             "ladder": rows}, indent=2))
        print(f"\n[scale] -> {p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
