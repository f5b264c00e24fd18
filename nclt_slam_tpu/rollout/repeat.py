"""Repeat pass: the full navigation inner loop as one jitted scan.

Replaces the reference's 9-process repeat graph (run_repeat_ours.sh: Isaac +
ORB-SLAM3 + v55 relay + landmark matcher + Nav2 map_server/planner + pure
pursuit + supervisor + dispatcher + loggers).  Stage cadences match the
reference: dynamics at 200 Hz (substeps), IMU at 200 Hz, VIO + control at
10 Hz, matcher at 2 Hz, costmap + planner at 2 Hz, supervisor continuous.

The localization source is selected by ``cfg.mode``:
- ``use_gt``            GT pose straight through (debug / speed-of-light)
- ``use_slam=False``    encoder+compass dead-reckoning only
- ``use_slam``          full stack: VIO (optionally inertial) + visual
                        anchors (optional) fused by the v55 relay

Within a tick, the dataflow mirrors the reference's steady-state loop
(SURVEY.md §3.2): dynamics advances with the previous command; sensors
observe the new true state; VIO/matcher/relay produce the nav pose; the
planner/dispatcher/follower produce the next command.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nclt_slam_tpu.config import Config
from nclt_slam_tpu.control.pure_pursuit import CtrlState, follower_tick, init_ctrl
from nclt_slam_tpu.control.rpp import init_rpp, rpp_tick
from nclt_slam_tpu.control.supervisor import SupervisorState, init_supervisor, supervisor_tick
from nclt_slam_tpu.dynamics.diffdrive import RobotState, init_robot, nav_substeps, robot_pose3d
from nclt_slam_tpu.fusion.relay import FusionState, anchor_update, fusion_tick, init_fusion
from nclt_slam_tpu.landmarks.matcher import match_tick
from nclt_slam_tpu.landmarks.store import LandmarkStore, init_store
from nclt_slam_tpu.mapping.occupancy import (
    crop_window,
    empty_grid,
    inflate_cost,
    integrate_depth,
    occupancy_trinary,
    world_to_cell,
)
from nclt_slam_tpu.planning.dispatcher import (
    DispatchState,
    dispatch_move,
    dispatch_plan,
    init_dispatch,
)
from nclt_slam_tpu.rollout.scene_pack import PackedRoute, PackedScene
from nclt_slam_tpu.sensors.depth import (
    cam_points_to_world,
    depth_to_cam_points,
    render_depth,
)
from nclt_slam_tpu.sensors.features import SceneFeatures, observe
from nclt_slam_tpu.sensors.imu import ImuState, imu_block, init_imu
from nclt_slam_tpu.vio.tracker import (
    VioState,
    emit_body_pos,
    emit_slam_pose,
    init_vio,
    vio_frame,
)

GRAVITY = jnp.array([0.0, 0.0, -9.81])


class RepeatCarry(NamedTuple):
    robot: RobotState
    ctrl: CtrlState
    dispatch: DispatchState
    sup: SupervisorState
    imu: ImuState
    vio: VioState
    fusion: FusionState
    grid_live: jax.Array    # live obstacle-layer log-odds
    cost_win: jax.Array     # cached inflated costmap window
    win_r0: jax.Array
    win_c0: jax.Array
    coarse_phi: jax.Array   # level-1 full-map cost-to-goal potential
    coarse_goal: jax.Array  # (2,) the goal coarse_phi was computed for
    gt_hist: jax.Array      # (18, 2) GT ring buffer (baseline watchdog)
    cmd: jax.Array          # (2,) v, w applied next tick
    key: jax.Array


class RepeatTrace(NamedTuple):
    gt_xy: jax.Array
    gt_yaw: jax.Array
    nav_xy: jax.Array       # localization output fed to nav
    regime: jax.Array       # fusion regime code
    anchor_ok: jax.Array    # anchor published this tick
    anchor_reason: jax.Array   # matcher outcome code; -1 = no attempt tick
    anchor_shift: jax.Array    # |anchor - nav| on publish (anchor_matches.csv)
    anchor_inliers: jax.Array  # best-candidate inlier count
    vio_xy: jax.Array       # raw VIO base xy (VIO frame); zeros if no VIO
    vio_tracked: jax.Array  # VIO match count
    vio_ndesc: jax.Array    # VIO descriptor matches pre-projection-gate
    vio_nins: jax.Array     # VIO map insertions this frame
    vio_flags: jax.Array    # VioAux.flags bitfield (enough/finite/plaus/lost)
    wp_idx: jax.Array
    cmd_v: jax.Array
    done: jax.Array
    fired: jax.Array
    goal_blocked: jax.Array   # stock diag: NavFn goal-disc failure this tick
    plan_fails: jax.Array     # consecutive window-plan failures
    recovery_phase: jax.Array  # RPP BT recovery phase (-1 = thesis follower)


class RepeatResult(NamedTuple):
    trace: RepeatTrace
    final: RepeatCarry


def _active_valid(scene: PackedScene, fired):
    """Collider validity with drops masked out after supervisor FIRE."""
    return scene.valid & (~(scene.drop_mask & fired))


def _scene_features(scene: PackedScene) -> SceneFeatures:
    return SceneFeatures(xyz=scene.feat_xyz, desc=scene.feat_desc,
                         owner=scene.feat_owner, valid=scene.feat_valid,
                         pkeep=scene.feat_pkeep,
                         view_thr=scene.feat_view_thr,
                         view_alpha=scene.feat_view_alpha)


def repeat_step(carry: RepeatCarry, tick, scene: PackedScene,
                route: PackedRoute, teach_grid, store: LandmarkStore,
                cfg: Config):
    key, k_dyn, k_obs, k_match, k_fuse, k_vio = jax.random.split(carry.key, 6)
    t_now = tick.astype(jnp.float32) * 0.1
    mode = cfg.mode

    # --- supervisor decides current collider set (GT-based poll) ---
    sup = supervisor_tick(carry.sup, carry.robot.xy, route.turnaround,
                          cfg.supervisor)
    valid_now = _active_valid(scene, sup.fired)

    # --- dynamics: apply the previous tick's command ---
    robot, (pos_traj, quat_traj) = nav_substeps(
        carry.robot, carry.cmd[0], carry.cmd[1], scene.xy, scene.radius,
        valid_now, k_dyn, cfg.sim)
    gt_yaw = robot.yaw
    pos3, _ = robot_pose3d(robot)

    # --- localization ---
    if mode.use_gt:
        imu, vio, fusion = carry.imu, carry.vio, carry.fusion
        nav_xy, nav_yaw = robot.xy, gt_yaw
        regime = jnp.int32(-1)
        anchor_ok = jnp.array(False)
        anchor_reason = jnp.int32(-1)
        anchor_shift = jnp.float32(0.0)
        anchor_inliers = jnp.int32(0)
    else:
        # 200 Hz synthetic IMU over this tick's substep trajectory
        imu, imu_meas = imu_block(carry.imu, pos_traj, quat_traj,
                                  1.0 / cfg.sim.physics_hz, k_fuse, cfg.imu)
        # dropped obstacles block the line of sight to teach-time features
        occluders = (scene.xy, scene.radius, scene.base_z, scene.height,
                     valid_now & scene.drop_mask,
                     jnp.arange(scene.xy.shape[0], dtype=jnp.int32))
        obs = observe(pos3, robot.yaw, _scene_features(scene), valid_now,
                      k_obs, cfg.camera, cfg.landmarks,
                      yaw_rate=carry.cmd[1], occluders=occluders,
                      px_session_amp=cfg.camera.px_bias_session_amp)

        if mode.use_slam:
            vio, slam_ok, vio_aux = vio_frame(
                carry.vio, obs, imu_meas,
                cfg.sim.nav_decimation / cfg.sim.physics_hz, GRAVITY,
                cfg.camera, cfg.vio, mode.use_imu, key=k_vio)
            # local sliding-window BA at 1 Hz (ORB-SLAM3 local mapping)
            if cfg.vio.enable_local_ba:
                from nclt_slam_tpu.vio.tracker import local_ba
                vio = jax.lax.cond(
                    tick % 10 == 3,
                    lambda v: local_ba(v, cfg.camera, cfg.vio),
                    lambda v: v, vio)
            slam_t, slam_q = emit_slam_pose(vio, cfg.camera)
            slam_ok = slam_ok & jnp.isfinite(slam_t).all() & \
                jnp.isfinite(slam_q).all()
        else:
            vio = carry.vio
            vio_aux = None
            slam_ok = jnp.array(False)
            slam_t = jnp.zeros(3)
            slam_q = jnp.array([0.0, 0.0, 0.0, 1.0])

        # --- visual anchor matcher at 2 Hz ---
        fusion = carry.fusion
        if mode.use_anchors:
            # The reference matcher reads /tmp/isaac_pose.txt for its query
            # pose (visual_landmark_matcher.py:266-272) — and that file is
            # written by the SIM as ground truth (run_husky_forest.py:1081:
            # "Write GT pose for tf_wall_clock_relay").  Candidate gating,
            # the heading gate, and the 5 m consistency gate therefore all
            # run on GT in the reference — which is also the physically
            # right proxy for "which teach landmarks can the camera see":
            # visibility is set by the TRUE camera pose, not the drifted
            # estimate.  Structurally this means the reference's anchor
            # pipeline can never starve under drift (no drift → gate-miss
            # → more-drift feedback loop); gating on the fused estimate
            # instead produced exactly that spiral on high-drift routes.
            vio_nav = jnp.array([robot.xy[0], robot.xy[1], gt_yaw])

            def try_anchor(f):
                # drought-scaled consistency relaxation (see LandmarkConfig)
                drought_s = jnp.maximum(
                    tick - f.anchor_tick, 0).astype(jnp.float32) * 0.1
                extra = jnp.minimum(
                    cfg.landmarks.consistency_relax_per_s * drought_s,
                    cfg.landmarks.consistency_relax_max_m)
                res = match_tick(
                    store, obs, vio_nav[:2], vio_nav[2],
                    jnp.array([vio_nav[0], vio_nav[1], 0.0]), k_match,
                    cfg.camera, cfg.landmarks, consistency_extra_m=extra)
                f2 = anchor_update(f, res.xy, res.std, tick, cfg.fusion)
                f2 = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(res.ok, new, old), f2, f)
                shift = jnp.linalg.norm(res.xy - vio_nav[:2])
                return f2, res.ok, res.reason, shift, res.n_inliers

            fusion, anchor_ok, anchor_reason, anchor_shift, anchor_inliers = \
                jax.lax.cond(
                    tick % cfg.landmarks.tick_period == 0, try_anchor,
                    lambda f: (f, jnp.array(False), jnp.int32(-1),
                               jnp.float32(0.0), jnp.int32(0)), fusion)
        else:
            anchor_ok = jnp.array(False)
            anchor_reason = jnp.int32(-1)
            anchor_shift = jnp.float32(0.0)
            anchor_inliers = jnp.int32(0)

        # --- v55 relay fusion tick ---
        fusion, nav_x, nav_y, nav_yaw, regime = fusion_tick(
            fusion, robot.xy[0], robot.xy[1], gt_yaw, slam_t, slam_q,
            slam_ok, tick, k_fuse, cfg.encoder, cfg.fusion)
        nav_xy = jnp.stack([nav_x, nav_y])

    # --- sensing + costmap at 2 Hz; replanning at its own (slower)
    # cadence.  The reference's costmap updates at 2 Hz but the dispatcher
    # only replans every 5 s (send_goals_hybrid follow_waypoint): coupling
    # them made plan_fails/skip policies 10x tighter than the reference's
    # and let 2 Hz homotopy flips (around obstacle clusters) thrash the
    # follower into place-oscillation.
    def update_costmap(grid_live):
        # the camera senses reality (true pose) ...
        depth, _, dvalid = render_depth(
            pos3, robot.yaw, scene.xy, scene.radius, scene.base_z,
            scene.height, valid_now, cfg.camera)
        # ... but points are placed in the map through the NAV pose, like
        # Nav2 transforming /depth_points with the relay's TF
        p_cam = depth_to_cam_points(depth, cfg.camera)
        from nclt_slam_tpu.scene.terrain import terrain_height
        nav_pos3 = jnp.array([nav_xy[0], nav_xy[1],
                              terrain_height(nav_xy[0], nav_xy[1]) + 0.13])
        pts = cam_points_to_world(p_cam, nav_pos3, nav_yaw, cfg.camera)
        grid_live = integrate_depth(grid_live, nav_xy, pts.reshape(-1, 3),
                                    dvalid.reshape(-1), cfg.map)
        live_tri = occupancy_trinary(grid_live, cfg.map)
        combined = jnp.maximum(live_tri, teach_grid)
        r, c = world_to_cell(nav_xy[0], nav_xy[1], cfg.map)
        occ_win, r0, c0 = crop_window(combined, r, c, cfg.planner.window)
        cost_win = inflate_cost(occ_win, cfg.map)
        return grid_live, cost_win, r0, c0

    grid_live, cost_win, win_r0, win_c0 = jax.lax.cond(
        tick % cfg.map.update_period == 0, update_costmap,
        lambda g: (g, carry.cost_win, carry.win_r0, carry.win_c0),
        carry.grid_live)

    # level-1 plan: full-map coarse potential toward the current target,
    # refreshed at the replan cadence (uniform predicate — a real cond
    # under vmap); it seeds the fine window's border so bypasses longer
    # than the window route correctly (the reference's full-map NavFn)
    if cfg.planner.coarse_seed:
        from nclt_slam_tpu.planning.wavefront import coarse_potential, coarse_traversal

        # static per rollout: XLA hoists it out of the scan (teach_grid is
        # a loop invariant), so the cond branch only pays the relaxation
        tc_coarse = coarse_traversal(teach_grid, cfg.map, cfg.planner)

        def update_coarse(_):
            return (coarse_potential(tc_coarse, carry.dispatch.target,
                                     cfg.map, cfg.planner),
                    carry.dispatch.target)

        coarse_phi, coarse_goal = jax.lax.cond(
            tick % cfg.planner.replan_period == 1, update_coarse,
            lambda _: (carry.coarse_phi, carry.coarse_goal), None)
    else:
        coarse_phi, coarse_goal = carry.coarse_phi, carry.coarse_goal

    dispatch = jax.lax.cond(
        tick % cfg.map.update_period == 0,
        lambda d: dispatch_plan(d, nav_xy, cost_win, win_r0, win_c0,
                                scene.xy, scene.radius,
                                scene.drop_mask & valid_now,
                                cfg.map, cfg.planner, tick,
                                coarse_phi=coarse_phi if
                                cfg.planner.coarse_seed else None,
                                coarse_goal=coarse_goal),
        lambda d: d, carry.dispatch)

    # --- dispatcher cheap phase ---
    dispatch = dispatch_move(dispatch, nav_xy, scene.xy, scene.radius,
                             scene.drop_mask & valid_now, cfg.planner)

    # --- baseline GT-stall watchdog (_baselines_common/watchdog.py) ---
    # The reference kills an exp-74/76 run when GROUND TRUTH moves less
    # than 1.5 m inside a 180 s window: a baseline wedged in inflation
    # ends its run at the first sustained stall instead of crawling
    # through the remaining tier timeout.  Ring-sampled GT bbox over the
    # window; fires only after the 240 s warmup (bring-up hold parks the
    # robot legitimately).
    gt_hist = carry.gt_hist
    if cfg.planner.gt_stall_abort:
        W_h = gt_hist.shape[0]
        period = cfg.planner.gt_stall_window_ticks // W_h
        slot = (tick // period) % W_h
        gt_hist = jax.lax.cond(
            tick % period == 0,
            lambda h: h.at[slot].set(robot.xy), lambda h: h, gt_hist)
        window_full = tick >= cfg.planner.gt_stall_window_ticks
        span = jnp.linalg.norm(gt_hist.max(0) - gt_hist.min(0))
        stalled = (tick >= cfg.planner.gt_stall_warmup_ticks) & \
            window_full & (span < cfg.planner.gt_stall_min_m)
        dispatch = dispatch._replace(done=dispatch.done | stalled)

    # --- follower (thesis pure-pursuit stack or stock RPP baseline) ---
    if cfg.control.use_rpp:
        ctrl, v, w = rpp_tick(
            carry.ctrl, nav_xy, nav_yaw, dispatch.path_xy, dispatch.n_path,
            dispatch.has_path & ~dispatch.done, t_now, cfg.rpp)
    else:
        ctrl, v, w = follower_tick(
            carry.ctrl, nav_xy, nav_yaw, dispatch.path_xy, dispatch.n_path,
            dispatch.has_path & ~dispatch.done, dispatch.plan_version,
            cost_win, win_r0, win_c0, t_now, cfg.map, cfg.control,
            cfg.planner.window)
    v = jnp.where(dispatch.done, 0.0, v)
    w = jnp.where(dispatch.done, 0.0, w)

    # --- stack bring-up hold (run_repeat_ours.sh phases 2-3) ---
    # The reference launcher starts Nav2 / goal-sending only after the v55
    # relay has committed its one-time 50-sample SLAM alignment; the robot
    # sits at spawn through bring-up.  Driving pre-commit would publish the
    # relay's naive per-tick fallback — which equals GT by construction
    # (tf_wall_clock_relay_v55.py:396-404) and so silently hides all VIO
    # drift from the fused output.  Bounded so a never-committing alignment
    # (VIO can't init) still times out into the drive rather than deadlock.
    if mode.use_slam and not mode.use_gt:
        hold = (~fusion.committed) & \
            (tick < cfg.fusion.startup_hold_ticks)
        v = jnp.where(hold, 0.0, v)
        w = jnp.where(hold, 0.0, w)

    has_aux = (not mode.use_gt) and mode.use_slam
    trace = RepeatTrace(
        gt_xy=robot.xy, gt_yaw=gt_yaw, nav_xy=nav_xy,
        regime=regime, anchor_ok=anchor_ok, anchor_reason=anchor_reason,
        anchor_shift=anchor_shift, anchor_inliers=anchor_inliers,
        vio_xy=emit_body_pos(vio)[:2] if mode.use_slam else jnp.zeros(2),
        vio_tracked=vio.n_tracked if not mode.use_gt else jnp.int32(-1),
        vio_ndesc=vio_aux.n_desc if has_aux else jnp.int32(-1),
        vio_nins=vio_aux.n_ins if has_aux else jnp.int32(-1),
        vio_flags=vio_aux.flags if has_aux else jnp.int32(0),
        wp_idx=dispatch.idx, cmd_v=v, done=dispatch.done, fired=sup.fired,
        goal_blocked=dispatch.goal_blocked,
        plan_fails=dispatch.plan_fails,
        recovery_phase=(ctrl.phase if cfg.control.use_rpp else jnp.int32(-1)))
    new_carry = RepeatCarry(
        robot=robot, ctrl=ctrl, dispatch=dispatch, sup=sup,
        imu=imu, vio=vio, fusion=fusion,
        grid_live=grid_live, cost_win=cost_win,
        win_r0=win_r0, win_c0=win_c0,
        coarse_phi=coarse_phi, coarse_goal=coarse_goal,
        gt_hist=gt_hist,
        cmd=jnp.stack([v, w]), key=key)
    return new_carry, trace


def init_repeat_carry(route: PackedRoute, wps, n_wps, cfg: Config,
                      seed: int = 1) -> RepeatCarry:
    robot = init_robot(route.spawn[0], route.spawn[1], route.spawn_yaw)
    W = cfg.planner.window
    f = cfg.planner.coarse_factor
    Rc = -(-cfg.map.rows // f)
    Cc = -(-cfg.map.cols // f)
    key = jax.random.PRNGKey(seed)
    k_imu, key = jax.random.split(key)
    return RepeatCarry(
        robot=robot,
        ctrl=init_rpp() if cfg.control.use_rpp else init_ctrl(),
        dispatch=init_dispatch(wps, n_wps, cfg.planner),
        sup=init_supervisor(),
        imu=init_imu(k_imu, cfg.imu),
        vio=init_vio(cfg.landmarks.desc_words, cfg.vio.window_kf),
        fusion=init_fusion(cfg.fusion),
        grid_live=empty_grid(cfg.map),
        cost_win=jnp.zeros((W, W), jnp.float32),
        win_r0=jnp.int32(0),
        win_c0=jnp.int32(0),
        coarse_phi=jnp.full((Rc, Cc), 1e9, jnp.float32),
        coarse_goal=jnp.full(2, 1e9, jnp.float32),
        gt_hist=jnp.zeros((18, 2), jnp.float32),
        cmd=jnp.zeros(2),
        key=key,
    )


def run_repeat(scene: PackedScene, route: PackedRoute, teach_grid, wps, n_wps,
               cfg: Config, n_ticks: int, seed: int = 1,
               store: LandmarkStore | None = None,
               carry: RepeatCarry | None = None,
               tick0: int = 0) -> RepeatResult:
    """Roll the repeat pass with teach artefacts (map + waypoints +
    landmark store).  ``carry``/``tick0`` allow chunked execution (the final
    carry is in ``result.final``)."""
    if store is None:
        store = init_store(cfg.landmarks)
    if carry is None:
        carry = init_repeat_carry(route, wps, n_wps, cfg, seed)

    def body(c, t):
        return repeat_step(c, t, scene, route, teach_grid, store, cfg)

    carry, trace = jax.lax.scan(body, carry, tick0 + jnp.arange(n_ticks))
    return RepeatResult(trace=trace, final=carry)
