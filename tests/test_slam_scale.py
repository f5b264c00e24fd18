"""Device-resident scanned ICP odometry + two-stage loop detection
(CI-scale versions of tools/slam_scale_test.py)."""

import sys
from pathlib import Path

import pytest
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from slam_scale_test import (  # noqa: E402
    build_world,
    loop_trajectory,
    make_scans,
    noisy_odom,
    ate,
)

from nclt_slam_tpu.datasets.slam.loop_closure import (  # noqa: E402
    detect_loops,
    detect_loops_scalable,
    scan_context,
)
from nclt_slam_tpu.datasets.slam.pipeline import (  # noqa: E402
    run_icp_odometry,
    run_icp_odometry_scan,
    run_slam,
)

pytestmark = pytest.mark.slow


def small_session(n_scans=40, n_pts=192):
    rng = np.random.RandomState(3)
    centers, radii, heights = build_world(rng, n_trees=160, extent=60.0)
    traj_xy, traj_yaw = loop_trajectory(n_scans, radius=35.0, laps=1.3)
    scans, valid = make_scans(centers, radii, heights, traj_xy, traj_yaw,
                              rng, n_pts=n_pts, max_range=30.0, jitter=0.02)
    world = centers
    odom = noisy_odom(traj_xy, traj_yaw, rng)
    return world, traj_xy, traj_yaw, scans, valid, odom


def test_scanned_odometry_matches_host_loop():
    """run_icp_odometry_scan (one lax.scan) == the host-loop version."""
    _, traj_xy, _, scans, valid, odom = small_session(n_scans=15)
    p_host, r_host = run_icp_odometry(scans, valid, odom, local_map_scans=8)
    p_dev, r_dev = run_icp_odometry_scan(scans, valid, odom,
                                         local_map_scans=8)
    assert np.allclose(p_host, p_dev, atol=5e-3), \
        np.abs(p_host - p_dev).max()
    assert np.allclose(r_host, r_dev, atol=1e-4)


def test_scanned_odometry_tracks_loop():
    _, traj_xy, _, scans, valid, odom = small_session(n_scans=40)
    poses, rmses = run_icp_odometry_scan(scans, valid, odom,
                                         local_map_scans=10)
    path = np.hypot(*np.diff(traj_xy, axis=0).T).sum()
    # odometry is expressed in the first-sensor frame: compare aligned
    assert ate(poses[:, :2, 3], traj_xy) < 0.01 * path


def test_scalable_detector_agrees_with_dense():
    """Two-stage ring-key search finds the same loops as the dense sweep."""
    _, traj_xy, traj_yaw, scans, valid, _ = small_session(n_scans=40)
    descs = jax.jit(jax.vmap(scan_context))(
        jnp.asarray(scans), jnp.asarray(valid))
    pos = jnp.asarray(traj_xy)
    v = jnp.ones(40, bool)
    kw = dict(min_gap=10, gps_radius=12.0, sc_thresh=0.4, max_loops=8)
    i1, j1, f1 = detect_loops(descs, pos, v, **kw)
    i2, j2, f2 = detect_loops_scalable(descs, pos, v, shortlist=128, **kw)
    s1 = {(int(a), int(b)) for a, b, f in zip(i1, j1, f1) if f}
    s2 = {(int(a), int(b)) for a, b, f in zip(i2, j2, f2) if f}
    assert s1, "dense detector found no loops — fixture broken"
    assert s1 == s2, (s1, s2)


def test_full_slam_improves_with_loops():
    """End-to-end mini session: PGO with registered loop edges improves (or
    at least does not worsen) the open-loop ATE."""
    _, traj_xy, _, scans, valid, odom = small_session(n_scans=40)
    out = run_slam(scans, valid, odom_pred=odom, loop_min_gap=10,
                   sc_thresh=0.4, max_loops=8, local_map_scans=10,
                   device_resident=True)
    a_open = ate(out["poses_open"], traj_xy)
    a_opt = ate(out["poses_optimized"], traj_xy)
    li, lj, found = out["loops"]
    assert np.asarray(found).any(), "no loops accepted"
    assert a_opt <= a_open * 1.2 + 0.05, (a_open, a_opt)
    assert np.isfinite(out["poses_optimized"]).all()
