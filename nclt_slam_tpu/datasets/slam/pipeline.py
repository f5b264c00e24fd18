"""LiDAR odometry + SLAM pipeline driver.

Capability match for the reference's NCLT runner scripts
(run_week2_icp.py / run_week3_imu_localmap.py): chain scan-to-local-map ICP
over a session with wheel-odometry prediction, maintain the sliding voxel
local map, detect loop closures (ScanContext + GPS gate), and optimize the
2-D pose graph.  The per-scan step is jitted; the sequence loop runs on the
host (sessions are IO-bound streams, exactly like the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nclt_slam_tpu.datasets.slam.icp import (
    icp_point_to_point,
    init_local_map,
    local_map_flat,
    local_map_insert,
)
from nclt_slam_tpu.datasets.slam.loop_closure import (
    PoseGraph2D,
    detect_loops,
    optimize_pose_graph,
    scan_context,
)


def run_icp_odometry(scans, scan_valid, odom_pred=None, local_map_scans=20,
                     icp_iters=15, max_corr=1.0):
    """Scan-to-local-map ICP odometry.

    scans: (T, N, 3) downsampled scans in the sensor frame.
    odom_pred: optional (T, 4, 4) wheel-odometry relative predictions.
    Returns (poses (T, 4, 4) world<-sensor, rmses (T,)).
    """
    T_n, N = scans.shape[0], scans.shape[1]

    step = jax.jit(lambda src, sv, dst, dv, R0, t0: icp_point_to_point(
        src, sv, dst, dv, R0=R0, t0=t0, iters=icp_iters, max_corr=max_corr))

    lm = init_local_map(local_map_scans, N)
    pose = np.eye(4)
    poses = [pose.copy()]
    rmses = [0.0]

    # seed the map with the first scan at the origin
    lm = local_map_insert(lm, jnp.asarray(scans[0]), jnp.asarray(scan_valid[0]))

    for t in range(1, T_n):
        pred = np.eye(4) if odom_pred is None else np.asarray(odom_pred[t])
        guess = pose @ pred
        dst, dv = local_map_flat(lm)
        res = step(jnp.asarray(scans[t]), jnp.asarray(scan_valid[t]),
                   dst, dv, jnp.asarray(guess[:3, :3], jnp.float32),
                   jnp.asarray(guess[:3, 3], jnp.float32))
        pose = np.eye(4)
        pose[:3, :3] = np.asarray(res.R)
        pose[:3, 3] = np.asarray(res.t)
        poses.append(pose.copy())
        rmses.append(float(res.rmse))
        world_scan = scans[t] @ pose[:3, :3].T + pose[:3, 3]
        lm = local_map_insert(lm, jnp.asarray(world_scan, jnp.float32),
                              jnp.asarray(scan_valid[t]))
    return np.stack(poses), np.asarray(rmses)


def run_icp_odometry_scan(scans, scan_valid, odom_rel=None,
                          local_map_scans=20, icp_iters=15, max_corr=1.0):
    """Device-resident ICP odometry: the whole session as ONE lax.scan.

    Unlike run_icp_odometry (host loop, one jit round trip per scan — the
    streaming/IO-bound shape), this keeps scans, the sliding local map, and
    the pose chain on-device, so a 2k-scan session is a single XLA program
    with no per-scan host synchronization.  Memory: T x N x 3 floats.

    odom_rel: optional (T, 4, 4) relative wheel-odometry predictions.
    Returns (poses (T, 4, 4), rmses (T,)).
    """
    T_n, N = scans.shape[0], scans.shape[1]
    scans = jnp.asarray(scans, jnp.float32)
    scan_valid = jnp.asarray(scan_valid)
    if odom_rel is None:
        odom_rel = jnp.tile(jnp.eye(4), (T_n, 1, 1))
    else:
        odom_rel = jnp.asarray(odom_rel, jnp.float32)

    lm0 = init_local_map(local_map_scans, N)
    lm0 = local_map_insert(lm0, scans[0], scan_valid[0])

    def body(carry, inp):
        lm, R, t = carry
        scan, sv, rel = inp
        Rg = R @ rel[:3, :3]
        tg = R @ rel[:3, 3] + t
        dst, dv = local_map_flat(lm)
        res = icp_point_to_point(scan, sv, dst, dv, R0=Rg, t0=tg,
                                 iters=icp_iters, max_corr=max_corr)
        world = scan @ res.R.T + res.t
        lm = local_map_insert(lm, world, sv)
        return (lm, res.R, res.t), (res.R, res.t, res.rmse)

    run = jax.jit(lambda sc, sv, od: jax.lax.scan(
        body, (lm0, jnp.eye(3), jnp.zeros(3)), (sc, sv, od)))
    (_, _, _), (Rs, ts, rmses) = run(scans[1:], scan_valid[1:], odom_rel[1:])

    poses = jnp.tile(jnp.eye(4), (T_n, 1, 1))
    poses = poses.at[1:, :3, :3].set(Rs).at[1:, :3, 3].set(ts)
    rmses = jnp.concatenate([jnp.zeros(1), rmses])
    return np.asarray(poses), np.asarray(rmses)


def run_slam(scans, scan_valid, odom_pred=None, gps_xy=None,
             loop_min_gap=20, sc_thresh=0.3, register_loops=True,
             seed=0, device_resident=None, max_loops=32,
             sc_max_range=80.0, **icp_kw):
    """Full LiDAR SLAM: ICP odometry + loop closure + pose-graph optimize.

    ``register_loops``: estimate each loop edge's relative transform with
    FPFH-RANSAC global registration + ICP refine (the reference's
    loop_closure.py chain); candidates whose registration fails its
    consensus/rmse gates are dropped.  With False, loop edges assume an
    exact revisit (identity) — only correct for strictly repeated paths.

    ``device_resident``: run the whole odometry chain as one on-device
    lax.scan instead of a host loop (auto: sessions >= 300 scans).

    Returns dict(poses_open, poses_optimized, loops, rmses)."""
    T_n = scans.shape[0]
    if device_resident is None:
        device_resident = T_n >= 300
    if device_resident:
        poses, rmses = run_icp_odometry_scan(scans, scan_valid, odom_pred,
                                             **icp_kw)
    else:
        poses, rmses = run_icp_odometry(scans, scan_valid, odom_pred,
                                        **icp_kw)

    descs = jax.jit(jax.vmap(
        lambda s, v: scan_context(s, v, max_range=sc_max_range)))(
        jnp.asarray(scans, jnp.float32), jnp.asarray(scan_valid))
    positions = jnp.asarray(
        gps_xy if gps_xy is not None else poses[:, :2, 3], jnp.float32)
    if T_n >= 300:
        from nclt_slam_tpu.datasets.slam.loop_closure import (
            detect_loops_scalable,
        )
        li, lj, found = jax.jit(lambda d, p: detect_loops_scalable(
            d, p, jnp.ones(T_n, bool), min_gap=loop_min_gap,
            sc_thresh=sc_thresh, max_loops=max_loops))(descs, positions)
    else:
        li, lj, found = detect_loops(descs, positions,
                                     jnp.ones(T_n, bool),
                                     min_gap=loop_min_gap,
                                     sc_thresh=sc_thresh,
                                     max_loops=max_loops)

    # 2-D graph from the open-loop chain
    yaw = np.arctan2(poses[:, 1, 0], poses[:, 0, 0])
    poses2d = np.column_stack([poses[:, 0, 3], poses[:, 1, 3], yaw])
    odo = []
    for k in range(T_n - 1):
        c, s = np.cos(yaw[k]), np.sin(yaw[k])
        dx = poses2d[k + 1, :2] - poses2d[k, :2]
        odo.append((c * dx[0] + s * dx[1], -s * dx[0] + c * dx[1],
                    yaw[k + 1] - yaw[k]))
    odo = np.asarray(odo, np.float32)

    L = int(found.shape[0])
    loop_meas = np.zeros((L, 3), np.float32)
    found_np = np.asarray(found).copy()
    li_np, lj_np = np.asarray(li), np.asarray(lj)
    if register_loops and found_np.any():
        from nclt_slam_tpu.datasets.slam.registration import register_loop

        reg = jax.jit(lambda s, sv, d, dv, k: register_loop(s, sv, d, dv, k))
        key = jax.random.PRNGKey(seed)
        for e in np.flatnonzero(found_np):
            i, j = int(li_np[e]), int(lj_np[e])
            key, k = jax.random.split(key)
            # T_i<-j: align scan j (src) into scan i's sensor frame (dst)
            r = reg(jnp.asarray(scans[j], jnp.float32),
                    jnp.asarray(scan_valid[j]),
                    jnp.asarray(scans[i], jnp.float32),
                    jnp.asarray(scan_valid[i]), k)
            if not bool(r.ok):
                found_np[e] = False   # registration gate failed -> drop loop
                continue
            R, t = np.asarray(r.R), np.asarray(r.t)
            loop_meas[e] = (t[0], t[1], np.arctan2(R[1, 0], R[0, 0]))
        found = jnp.asarray(found_np)
    graph = PoseGraph2D(
        poses=jnp.asarray(poses2d, jnp.float32),
        odo_meas=jnp.asarray(odo),
        loop_i=jnp.asarray(li, jnp.int32),
        loop_j=jnp.asarray(lj, jnp.int32),
        loop_meas=jnp.asarray(loop_meas),
        loop_valid=jnp.asarray(found))
    if T_n >= 400:
        # km-scale: junction-reduced PGO as one fused device program
        # (the dense jacfwd path materializes a ~(6K, 3K) Jacobian per GN
        # iteration — 145 MB at 2000 poses)
        from nclt_slam_tpu.datasets.slam.loop_closure import (
            optimize_pose_graph_fast,
        )
        optimized = np.asarray(optimize_pose_graph_fast(graph, iters=15))
    else:
        optimized = np.asarray(jax.jit(
            lambda g: optimize_pose_graph(g, iters=15))(graph))
    return {
        "poses_open": poses2d,
        "poses_optimized": optimized,
        "loops": (np.asarray(li), np.asarray(lj), np.asarray(found)),
        "rmses": rmses,
    }
