"""Stock Nav2 baseline stack tests: RPP controller, recovery cycling,
FollowWaypoints dispatcher semantics, one-time WP projection.

Reference behavior being modeled: nav2_stock_params.yaml:26-81 (RPP +
progress checker), waypoint_follower_client.py:66-163 (client-side WP
projection), routes/README.md:229-242 (stall failure modes)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nclt_slam_tpu.baselines import stock_nav2
from nclt_slam_tpu.config import DEFAULT, MapConfig, RppConfig
from nclt_slam_tpu.control.rpp import (
    PHASE_NONE,
    init_rpp,
    rpp_tick,
)
from nclt_slam_tpu.planning.dispatcher import (
    dispatch_move,
    init_dispatch,
    stock_project_waypoints,
)

pytestmark = pytest.mark.slow

CFG = RppConfig()


def straight_path(n=32, step=0.5):
    xy = np.zeros((64, 2), np.float32)
    xy[:n, 0] = np.arange(n) * step
    xy[n:] = xy[n - 1]
    return jnp.asarray(xy), jnp.int32(n)


def test_rpp_drives_straight():
    path, n = straight_path()
    st = init_rpp()
    pos = jnp.array([0.0, 0.0])
    v_hist = []
    for t in range(20):
        st, v, w = rpp_tick(st, pos, jnp.float32(0.0), path, n,
                            jnp.array(True), jnp.float32(t * 0.1), CFG)
        pos = pos + jnp.array([v * 0.1, 0.0])
        v_hist.append(float(v))
    assert v_hist[-1] > 0.5          # near desired_linear_vel on straight
    assert abs(float(w)) < 0.1       # no turn commanded


def test_rpp_curvature_regulation():
    """A carrot 90 degrees to the side -> tight radius -> regulated slowdown."""
    path = jnp.zeros((64, 2)).at[:, 1].set(2.0)  # all points at (0, 2)
    st = init_rpp()
    st = st._replace(prev_v=jnp.float32(0.8))
    st, v, w = rpp_tick(st, jnp.zeros(2), jnp.float32(0.0), path,
                        jnp.int32(8), jnp.array(True), jnp.float32(0.0), CFG)
    # kappa = 2 sin(pi/2) / 2 = 1.0 -> radius 1.0 > 0.9 -> barely regulated;
    # but the approach scaling (d_end = 2.0 > 1.5) leaves v at desired.
    assert float(v) > 0.2
    assert float(w) > 0.3            # turning toward the carrot


def test_rpp_no_recovery_while_progressing():
    path, n = straight_path()
    st = init_rpp()
    pos = jnp.zeros(2)
    for t in range(400):
        st, v, w = rpp_tick(st, pos, jnp.float32(0.0), path, n,
                            jnp.array(True), jnp.float32(t * 0.1), CFG)
        pos = pos + jnp.array([v * 0.1, 0.0]) * 0.5  # half-speed progress
    assert int(st.recovery_count) == 0


def test_rpp_stall_triggers_recovery_cycle():
    """Pinned robot -> progress checker fires at 30 s -> recoveries cycle."""
    path, n = straight_path()
    st = init_rpp()
    pos = jnp.zeros(2)  # never moves (wedged against a collider)
    phases_seen = set()
    for t in range(1200):  # 120 s
        st, v, w = rpp_tick(st, pos, jnp.float32(0.0), path, n,
                            jnp.array(True), jnp.float32(t * 0.1), CFG)
        phases_seen.add(int(st.phase))
    assert int(st.recovery_count) >= 2
    # all three behavior types appear over the cycling
    assert phases_seen >= {0, 1, 2, 3}


def test_rpp_recovery_commands():
    """During spin: w>0, v=0; during backup: v<0."""
    path, n = straight_path()
    st = init_rpp()
    pos = jnp.zeros(2)
    cmds = []
    for t in range(1200):
        st, v, w = rpp_tick(st, pos, jnp.float32(0.0), path, n,
                            jnp.array(True), jnp.float32(t * 0.1), CFG)
        cmds.append((int(st.phase), float(v), float(w)))
    spin = [c for c in cmds if c[0] == 1]
    backup = [c for c in cmds if c[0] == 2]
    assert spin and all(c[1] == 0.0 and c[2] > 0.5 for c in spin)
    assert backup and all(c[1] < 0.0 for c in backup)


def test_stock_dispatch_no_timeout_skip():
    """Stock FollowWaypoints has no per-WP timeout: an unreachable WP blocks
    forever (the reference baseline's stall mode)."""
    cfg = stock_nav2().planner
    wps = np.zeros((cfg.max_waypoints, 2), np.float32)
    wps[:4] = [[0, 0], [10, 0], [20, 0], [30, 0]]
    st = init_dispatch(jnp.asarray(wps), 4, cfg)
    st = st._replace(idx=jnp.int32(1), target=jnp.array([10.0, 0.0]))
    robot = jnp.array([0.0, 0.0])  # never gets within tolerance
    zero = jnp.zeros(1)
    for _ in range(5):
        # simulate many accumulated ticks directly
        st = st._replace(ticks_on_wp=jnp.int32(10 ** 5))
        st = dispatch_move(st, robot, zero[:, None].repeat(2, 1), zero,
                           jnp.zeros(1, bool), cfg)
    assert int(st.idx) == 1          # still stuck on the same WP


def test_stock_dispatch_plan_fail_advances():
    """NavigateToPose aborts on repeated plan failure; stop_on_failure=false
    moves to the next WP."""
    cfg = stock_nav2().planner
    wps = np.zeros((cfg.max_waypoints, 2), np.float32)
    wps[:4] = [[0, 0], [10, 0], [20, 0], [30, 0]]
    st = init_dispatch(jnp.asarray(wps), 4, cfg)
    st = st._replace(idx=jnp.int32(1), target=jnp.array([10.0, 0.0]),
                     plan_fails=jnp.int32(cfg.max_plan_fails))
    zero = jnp.zeros(1)
    st = dispatch_move(st, jnp.array([0.0, 0.0]),
                       zero[:, None].repeat(2, 1), zero,
                       jnp.zeros(1, bool), cfg)
    assert int(st.idx) == 2
    assert int(st.skipped_count) == 1


def test_ours_dispatch_still_times_out():
    """The hybrid dispatcher keeps its per-WP timeout (regression guard)."""
    cfg = DEFAULT.planner
    wps = np.zeros((cfg.max_waypoints, 2), np.float32)
    wps[:20, 0] = np.arange(20) * 10.0
    st = init_dispatch(jnp.asarray(wps), 20, cfg)
    st = st._replace(idx=jnp.int32(1), target=jnp.array([10.0, 0.0]),
                     ticks_on_wp=jnp.int32(cfg.goal_timeout_ticks))
    zero = jnp.zeros(1)
    st = dispatch_move(st, jnp.array([0.0, 0.0]),
                       zero[:, None].repeat(2, 1), zero,
                       jnp.zeros(1, bool), cfg)
    assert int(st.idx) == 2


def _grid_with_block(map_cfg, r0, r1, c0, c1):
    g = np.zeros((map_cfg.rows, map_cfg.cols), np.int8)
    g[r0:r1, c0:c1] = 2
    return g


def test_stock_projection_moves_blocked_wp():
    map_cfg = MapConfig()
    # obstacle block around world (0, 0): origin (-105, -50) -> r=500, c=1050
    g = _grid_with_block(map_cfg, 495, 506, 1045, 1056)
    wps = np.zeros((8, 2), np.float32)
    wps[0] = [0.0, 0.0]      # inside the block -> must project out
    wps[1] = [30.0, 30.0]    # free -> untouched
    out, n = stock_project_waypoints(g, wps, 2, map_cfg)
    assert n == 2
    assert np.hypot(*(out[0] - wps[0])) > 0.01   # moved
    assert np.hypot(*(out[0] - wps[0])) <= 2.1   # within projection radius
    assert np.allclose(out[1], wps[1])


def test_stock_projection_drops_unreachable_wp():
    map_cfg = MapConfig()
    # huge lethal block: no free cell within 2 m of its center
    g = _grid_with_block(map_cfg, 440, 560, 990, 1110)
    wps = np.zeros((8, 2), np.float32)
    wps[0] = [0.0, 0.0]      # deep inside -> dropped
    wps[1] = [30.0, 30.0]
    out, n = stock_project_waypoints(g, wps, 2, map_cfg)
    assert n == 1
    assert np.allclose(out[0], wps[1])


def test_stock_config_shape():
    cfg = stock_nav2()
    assert cfg.control.use_rpp
    assert cfg.planner.stock_follow
    assert not cfg.planner.enable_detour
    assert not cfg.mode.use_anchors
    assert cfg.mode.use_slam and cfg.mode.use_imu


def test_stock_goal_blocked_recovery_crawl_then_abort():
    """A planner-failed goal (NavFn tolerance disc all lethal) holds the BT
    in recovery rounds — NO advance — for stock_abort_ticks, then
    NavigateToPose aborts and stop_on_failure=false moves on
    (routes/README.md:179-185's crawl-stall); hard planner failures on a
    plannable goal still advance via the retry budget."""
    cfg = stock_nav2().planner
    wps = np.zeros((cfg.max_waypoints, 2), np.float32)
    wps[:4] = [[0, 0], [10, 0], [20, 0], [30, 0]]
    st = init_dispatch(jnp.asarray(wps), 4, cfg)
    st = st._replace(idx=jnp.int32(1), target=jnp.array([10.0, 0.0]),
                     goal_blocked=jnp.array(True),
                     plan_fails=jnp.int32(10 ** 4),
                     blocked_ticks=jnp.int32(cfg.stock_abort_ticks - 5))
    robot = jnp.array([0.0, 0.0])
    zero = jnp.zeros(1)
    for k in range(4):
        st = dispatch_move(st, robot, zero[:, None].repeat(2, 1), zero,
                           jnp.zeros(1, bool), cfg)
        st = st._replace(plan_fails=jnp.int32(10 ** 4))
        assert int(st.idx) == 1      # recovery rounds: no advance yet
    # crosses the abort budget -> next move advances
    for _ in range(4):
        st = dispatch_move(st, robot, zero[:, None].repeat(2, 1), zero,
                           jnp.zeros(1, bool), cfg)
    assert int(st.idx) == 2

    # same accumulated failures with a plannable goal -> moves on at once
    st2 = init_dispatch(jnp.asarray(wps), 4, cfg)
    st2 = st2._replace(idx=jnp.int32(1), target=jnp.array([10.0, 0.0]),
                       goal_blocked=jnp.array(False),
                       plan_fails=jnp.int32(10 ** 4))
    st2 = dispatch_move(st2, robot, zero[:, None].repeat(2, 1), zero,
                        jnp.zeros(1, bool), cfg)
    assert int(st2.idx) == 2


def test_start_lethal_fails_planning_stock():
    """Nav2 NavFn refuses a lethal START: drift putting the believed pose
    inside inflation makes ComputePathToPose fail — for stock, the BT sits
    path-less (goal_blocked) through the recovery crawl."""
    import dataclasses

    from nclt_slam_tpu.planning.dispatcher import dispatch_plan

    cfg = stock_nav2()
    pcfg = dataclasses.replace(cfg.planner, enable_projection=False)
    map_cfg = cfg.map
    W = pcfg.window
    wps = np.zeros((pcfg.max_waypoints, 2), np.float32)
    wps[:2] = [[0, 0], [10, 0]]
    st = init_dispatch(jnp.asarray(wps), 2, pcfg)
    st = st._replace(idx=jnp.int32(1), target=jnp.array([10.0, 0.0]))
    # window centered on origin; lethal blob under the robot only
    r0 = int((0.0 - map_cfg.origin_y) / map_cfg.resolution) - W // 2
    c0 = int((0.0 - map_cfg.origin_x) / map_cfg.resolution) - W // 2
    cost = np.zeros((W, W), np.float32)
    cost[W // 2 - 3: W // 2 + 3, W // 2 - 3: W // 2 + 3] = 99.0
    zero = jnp.zeros(1)
    out = dispatch_plan(st, jnp.array([0.0, 0.0]), jnp.asarray(cost),
                        jnp.int32(r0), jnp.int32(c0),
                        zero[:, None].repeat(2, 1), zero,
                        jnp.zeros(1, bool), map_cfg, pcfg)
    assert bool(out.goal_blocked)       # BT action errored -> no path
    assert not bool(out.has_path)
    assert int(out.plan_fails) == 1

    # same scene with a clear start plans fine
    cost2 = np.zeros((W, W), np.float32)
    out2 = dispatch_plan(st, jnp.array([0.0, 0.0]), jnp.asarray(cost2),
                         jnp.int32(r0), jnp.int32(c0),
                         zero[:, None].repeat(2, 1), zero,
                         jnp.zeros(1, bool), map_cfg, pcfg)
    assert bool(out2.has_path)
    assert not bool(out2.goal_blocked)


def test_gt_stall_watchdog_kills_baseline_run():
    """_baselines_common/watchdog.py parity: GT moving < 1.5 m inside the
    180 s window (after warmup) ends the run; the ours stack carries no
    watchdog and keeps going."""
    import dataclasses

    from nclt_slam_tpu.rollout.repeat import init_repeat_carry, repeat_step
    from tests.test_rollout_e2e import (
        pack_test_route, small_config, straight_route, tiny_scene)
    from nclt_slam_tpu.landmarks.store import init_store

    base = small_config()
    cfg = base.replace(planner=dataclasses.replace(
        base.planner, gt_stall_abort=True, gt_stall_warmup_ticks=200,
        gt_stall_window_ticks=180, gt_stall_min_m=1.5))
    route = straight_route()
    scene = tiny_scene(drop_on_path=False)
    packed, wps, n_wps = pack_test_route(route, cfg)
    store = init_store(cfg.landmarks)
    teach_grid = jnp.zeros((cfg.map.rows, cfg.map.cols), jnp.int8)
    carry = init_repeat_carry(packed, jnp.asarray(wps), n_wps, cfg)
    # pin the robot: dispatcher never gets a path (empty target far away
    # is fine — we just zero the command by keeping has_path False); the
    # cleanest pin is to never give the controller a path via done-free
    # stall: drive commands zeroed by a lethal start every plan tick.
    # Simpler: force v=0 by replacing the path with nothing and relying on
    # the watchdog to fire on an unmoving GT.
    step = jax.jit(lambda c, t: repeat_step(
        c, t, scene, packed, teach_grid, store, cfg))
    done_tick = None
    c = carry
    for t in range(0, 480, 1):
        c, tr = step(c, jnp.int32(t))
        # hold the robot in place (wedged): zero the applied command
        c = c._replace(cmd=jnp.zeros(2))
        if bool(tr.done):
            done_tick = t
            break
    assert done_tick is not None and done_tick >= 200, done_tick

    # ours config (no watchdog): same pin, no abort
    cfg2 = base.replace(planner=dataclasses.replace(
        base.planner, gt_stall_abort=False))
    carry2 = init_repeat_carry(packed, jnp.asarray(wps), n_wps, cfg2)
    step2 = jax.jit(lambda c, t: repeat_step(
        c, t, scene, packed, teach_grid, store, cfg2))
    c = carry2
    fired = False
    for t in range(0, 480, 1):
        c, tr = step2(c, jnp.int32(t))
        c = c._replace(cmd=jnp.zeros(2))
        fired = fired or bool(tr.done)
    assert not fired
