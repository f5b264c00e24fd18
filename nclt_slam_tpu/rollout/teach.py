"""Teach pass: one jitted scan that drives the route and builds artefacts.

Replaces the reference's 6-process teach graph (run_teach.sh: Isaac sim +
VIO + GT relay + drift monitor + depth mapper + landmark recorder) with one
pure function.  The chase controller reproduces the sim driver's auto-route
pure pursuit (run_husky_forest.py:942-1058: 2 m lookahead within the next
10 WPs, arrive at < 1 m, three-tier speed/steer schedule); the depth mapper
accumulates the log-odds teach map; the landmark recorder snapshots feature
observations every 2 m; per-tick GT poses become the ``vio_pose_dense``
artefact the repeat pass subsamples into waypoints.

When ``cfg.teach.run_vio`` is set (default), the full VIO also runs during
teach — as ORB-SLAM3 does in the reference — and the live drift monitor
(vio/drift_monitor.py, the vio_drift_monitor.py:88-129 gate) aborts the
teach run online when the Procrustes drift exceeds the threshold.  The raw
VIO track is traced (``vio_xy``) so the repeat waypoints can be derived from
aligned VIO poses, matching the reference's vio_pose_dense.csv flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nclt_slam_tpu.config import Config
from nclt_slam_tpu.dynamics.diffdrive import RobotState, init_robot, nav_substeps, robot_pose3d
from nclt_slam_tpu.landmarks.store import LandmarkStore, init_store, record_tick
from nclt_slam_tpu.mapping.occupancy import empty_grid, integrate_depth, occupancy_trinary
from nclt_slam_tpu.rollout.scene_pack import PackedRoute, PackedScene
from nclt_slam_tpu.sensors.depth import camera_pose, render_depth
from nclt_slam_tpu.sensors.features import SceneFeatures, observe
from nclt_slam_tpu.sensors.imu import ImuState, imu_block, init_imu
from nclt_slam_tpu.vio.drift_monitor import (
    DriftMonitorState,
    check_drift,
    init_drift_monitor,
    push_sample,
)
from nclt_slam_tpu.vio.tracker import VioState, emit_body_pos, init_vio, vio_frame

CHASE_WINDOW = 16  # WP lookahead window (reference scans next 10)
GRAVITY = jnp.array([0.0, 0.0, -9.81])


class TeachCarry(NamedTuple):
    robot: RobotState
    grid: jax.Array        # log-odds teach map
    store: LandmarkStore   # landmark recorder state
    chase_idx: jax.Array   # () int32 current dense WP
    key: jax.Array
    done: jax.Array        # () bool — route complete
    imu: ImuState          # teach-time VIO (run_vio)
    vio: VioState
    drift: DriftMonitorState


class TeachTrace(NamedTuple):
    gt_xy: jax.Array       # (T, 2)
    gt_yaw: jax.Array      # (T,)
    done: jax.Array        # (T,) bool
    cmd_v: jax.Array       # (T,)
    vio_xy: jax.Array      # (T, 2) raw VIO xy (VIO frame); zeros if no VIO
    vio_tracked: jax.Array  # (T,) VIO match count (teach starvation diag)
    drift_max: jax.Array   # (T,) last monitor drift_max
    aborted: jax.Array     # (T,) bool — drift gate fired


class TeachResult(NamedTuple):
    trace: TeachTrace
    teach_grid: jax.Array  # trinary int8 map
    store: LandmarkStore   # landmarks.pkl artefact pytree
    n_ticks: jax.Array     # () int32 valid tick count
    final: "TeachCarry"    # carry for chunked continuation


def _scene_features(scene: PackedScene) -> SceneFeatures:
    return SceneFeatures(xyz=scene.feat_xyz, desc=scene.feat_desc,
                         owner=scene.feat_owner, valid=scene.feat_valid,
                         pkeep=scene.feat_pkeep,
                         view_thr=scene.feat_view_thr,
                         view_alpha=scene.feat_view_alpha)


def _chase_cmd(robot: RobotState, route: PackedRoute, chase_idx, cfg: Config):
    """Sim-driver auto-route pure pursuit (2 m lookahead, 3-tier steering)."""
    t = cfg.teach
    # committed-goal semantics (run_husky_forest.py:943-1031): drive at WP
    # ``chase_idx`` until within arrive_dist, then jump to the first WP in
    # the next window that is >= lookahead away.
    goal = route.dense_xy[jnp.minimum(chase_idx, route.n_dense - 1)]
    d_goal = jnp.linalg.norm(goal - robot.xy)
    arrived = d_goal < t.chase_arrive_dist

    offs = jnp.arange(CHASE_WINDOW)
    idxs = jnp.minimum(chase_idx + 1 + offs, route.n_dense - 1)
    d = jnp.linalg.norm(route.dense_xy[idxs] - robot.xy[None, :], axis=-1)
    far = d >= t.chase_lookahead
    next_idx = jnp.where(jnp.any(far), chase_idx + 1 + jnp.argmax(far),
                         chase_idx + 1)
    new_idx = jnp.where(arrived, jnp.minimum(next_idx, route.n_dense), chase_idx)
    tgt = route.dense_xy[jnp.minimum(new_idx, route.n_dense - 1)]

    err = jnp.arctan2(tgt[1] - robot.xy[1], tgt[0] - robot.xy[0]) - robot.yaw
    err = jnp.arctan2(jnp.sin(err), jnp.cos(err))

    # 3-tier schedule scaled to the effective max speed
    scale = t.max_speed / 0.25
    big = jnp.abs(err) > 0.5
    med = (~big) & (jnp.abs(err) > 0.15)
    v = jnp.where(big, 0.10, jnp.where(med, 0.18, 0.25)) * scale
    w = jnp.where(big, jnp.clip(err * 1.8, -0.5, 0.5),
                  jnp.where(med, jnp.clip(err * 1.5, -0.35, 0.35),
                            jnp.clip(err * 1.2, -0.2, 0.2)))
    done = (chase_idx >= route.n_dense - 1) & arrived
    return v, w, new_idx, done


def teach_step(carry: TeachCarry, tick, scene: PackedScene, route: PackedRoute,
               cfg: Config):
    key, k_dyn, k_obs, k_imu, k_vio = jax.random.split(carry.key, 5)

    v, w, chase_idx, done = _chase_cmd(carry.robot, route, carry.chase_idx, cfg)
    halted = carry.done | carry.drift.aborted
    v = jnp.where(halted, 0.0, v)
    w = jnp.where(halted, 0.0, w)

    # drops are not present during teach
    valid_teach = scene.valid & ~scene.drop_mask
    robot, (pos_traj, quat_traj) = nav_substeps(
        carry.robot, v, w, scene.xy, scene.radius, valid_teach, k_dyn, cfg.sim)
    pos3, _ = robot_pose3d(robot)

    # --- live VIO + drift monitor (vio_drift_monitor gate) ---
    if cfg.teach.run_vio:
        imu, imu_meas = imu_block(carry.imu, pos_traj, quat_traj,
                                  1.0 / cfg.sim.physics_hz, k_imu, cfg.imu)
        obs = observe(pos3, robot.yaw, _scene_features(scene), valid_teach,
                      k_obs, cfg.camera, cfg.landmarks, yaw_rate=w)
        # the same stress-gated backend-event model runs in teach — the
        # reference teaches with the identical ORB-SLAM3 — but the smooth
        # feature-rich chase keeps it nearly event-free (teach drift band)
        vio, _, _vaux = vio_frame(carry.vio, obs, imu_meas,
                           cfg.sim.nav_decimation / cfg.sim.physics_hz,
                           GRAVITY, cfg.camera, cfg.vio, True, key=k_vio)
        drift = jax.lax.cond(
            tick % cfg.teach.drift_sample_period == 0,
            lambda d: push_sample(d, emit_body_pos(vio)[:2], robot.xy),
            lambda d: d, carry.drift)
        drift = jax.lax.cond(
            tick % cfg.teach.drift_check_period == cfg.teach.drift_check_period - 1,
            lambda d: check_drift(d, tick, cfg.teach),
            lambda d: d, drift)
        vio_xy = emit_body_pos(vio)[:2]
    else:
        imu, vio, drift = carry.imu, carry.vio, carry.drift
        obs = None
        vio_xy = jnp.zeros(2)

    # depth mapping + landmark recording at the costmap cadence (2 Hz) —
    # uniform predicate so the heavy branch stays a real cond under vmap
    def do_sense(args):
        grid, store = args
        depth, pts, dvalid = render_depth(
            pos3, robot.yaw, scene.xy, scene.radius, scene.base_z,
            scene.height, valid_teach, cfg.camera)
        grid = integrate_depth(grid, robot.xy, pts.reshape(-1, 3),
                               dvalid.reshape(-1), cfg.map)
        obs_l = obs if obs is not None else observe(
            pos3, robot.yaw, _scene_features(scene), valid_teach, k_obs,
            cfg.camera, cfg.landmarks, yaw_rate=w)
        cam_p, _ = camera_pose(pos3, robot.yaw, cfg.camera)
        store = record_tick(store, obs_l, cam_p, robot.yaw, cfg.camera,
                            cfg.landmarks)
        return grid, store

    grid, store = jax.lax.cond(
        tick % cfg.map.update_period == 0, do_sense, lambda a: a,
        (carry.grid, carry.store))

    trace = TeachTrace(gt_xy=robot.xy, gt_yaw=robot.yaw,
                       done=halted | done, cmd_v=v,
                       vio_xy=vio_xy,
                       vio_tracked=(vio.n_tracked if cfg.teach.run_vio
                                    else jnp.int32(-1)),
                       drift_max=drift.drift_max,
                       aborted=drift.aborted)
    return TeachCarry(robot=robot, grid=grid, store=store,
                      chase_idx=chase_idx, key=key,
                      done=carry.done | done,
                      imu=imu, vio=vio, drift=drift), trace


def init_teach_carry(route: PackedRoute, cfg: Config,
                     seed: int = 0) -> TeachCarry:
    robot = init_robot(route.spawn[0], route.spawn[1], route.spawn_yaw)
    key = jax.random.PRNGKey(seed)
    k_imu, key = jax.random.split(key)
    return TeachCarry(
        robot=robot,
        grid=empty_grid(cfg.map),
        store=init_store(cfg.landmarks),
        chase_idx=jnp.int32(0),
        key=key,
        done=jnp.array(False),
        imu=init_imu(k_imu, cfg.imu),
        vio=init_vio(cfg.landmarks.desc_words, cfg.vio.window_kf),
        drift=init_drift_monitor(cfg.teach),
    )


def run_teach(scene: PackedScene, route: PackedRoute, cfg: Config,
              n_ticks: int, seed: int = 0, carry: TeachCarry | None = None,
              tick0: int = 0) -> TeachResult:
    """Roll the teach pass.  ``n_ticks`` is static (scan length);
    ``carry``/``tick0`` allow chunked execution (long single XLA programs
    can trip device watchdogs — see rollout/campaign.run_chunked)."""
    if carry is None:
        carry = init_teach_carry(route, cfg, seed)

    def body(c, t):
        return teach_step(c, t, scene, route, cfg)

    carry, trace = jax.lax.scan(body, carry, tick0 + jnp.arange(n_ticks))
    n_valid = (~trace.done).sum().astype(jnp.int32)
    return TeachResult(
        trace=trace,
        teach_grid=occupancy_trinary(carry.grid, cfg.map),
        store=carry.store,
        n_ticks=n_valid,
        final=carry,
    )
