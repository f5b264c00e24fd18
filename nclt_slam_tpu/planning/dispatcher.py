"""Waypoint dispatcher — the send_goals_hybrid.py state machine, maskable.

Ports the reference's goal dispatcher behavior (send_goals_hybrid.py):
teach WPs subsampled at 4 m; per-costmap-update projection of unsafe WPs to
the nearest low-cost cell (cap 3 m search / 1 m shift); look-ahead skip at
cost >= 60 with a detour ring fallback (24 samples x radii 4/5/6/7 m, accept
cost < 30, pick lowest); replan through the wavefront planner; REACH at 3 m
tolerance; per-WP timeout; plan-fail SKIP after 5 tries; and the
final-5-WP no-skip/2x-timeout policy.

Divergence control (vmap over routes): the state machine is split into
``dispatch_move`` (cheap, every tick, all-``where``) and ``dispatch_plan``
(planner + WP projection + detour, called at a *globally uniform* cadence so
the expensive branch stays a real ``lax.cond``, not a vmapped select).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nclt_slam_tpu.config import MapConfig, PlannerConfig
from nclt_slam_tpu.planning.wavefront import plan_world


class DispatchState(NamedTuple):
    wps: jax.Array            # (W, 2) original teach waypoints
    wps_proj: jax.Array       # (W, 2) current projected targets
    n_wps: jax.Array          # () int32
    skip: jax.Array           # (W,) bool — projection failed
    idx: jax.Array            # () int32 current WP
    target: jax.Array         # (2,) current nav target (WP or detour)
    ticks_on_wp: jax.Array    # () int32
    plan_fails: jax.Array     # () int32
    path_xy: jax.Array        # (P, 2) current plan
    n_path: jax.Array         # () int32
    has_path: jax.Array       # () bool
    plan_version: jax.Array   # () int32 — bumps when a new path is accepted
    plan_tick: jax.Array      # () int32 — tick of the last accepted path
    planned_target: jax.Array  # (2,) target of the last accepted path
    reached_count: jax.Array  # () int32
    skipped_count: jax.Array  # () int32
    done: jax.Array           # () bool — all WPs consumed
    goal_blocked: jax.Array   # () bool — stock: NavFn planning fails (all
    #   cells within the 1 m goal tolerance lethal); the BT then cycles
    #   recovery rounds with no path until NavigateToPose aborts after
    #   stock_abort_ticks and stop_on_failure=false moves on — the
    #   reference baseline's crawl-stall (see dispatch_move)
    blocked_ticks: jax.Array  # () int32 — consecutive goal_blocked ticks


def subsample_waypoints(dense_xy: np.ndarray, n_dense: int, cfg: PlannerConfig):
    """Offline 4 m subsample of the teach path (numpy; feeds fixed arrays).

    Mirrors send_goals_hybrid's subsample(): keep a point when it is >=
    spacing from the last kept point."""
    pts = dense_xy[:n_dense]
    keep = [pts[0]]
    for p in pts[1:]:
        if np.hypot(*(p - keep[-1])) >= cfg.wp_spacing_m:
            keep.append(p)
    keep = np.asarray(keep, np.float32)
    n = min(len(keep), cfg.max_waypoints)
    out = np.zeros((cfg.max_waypoints, 2), np.float32)
    out[:n] = keep[:n]
    out[n:] = keep[n - 1]
    return out, n


def stock_project_waypoints(teach_grid: np.ndarray, wps: np.ndarray,
                            n_wps: int, map_cfg,
                            proj_radius_m: float = 2.0,
                            lethal: float = 70.0,
                            free: float = 50.0):
    """One-time client-side WP projection, the stock baseline's only costmap
    awareness (waypoint_follower_client.py:66-163): peek the static teach-map
    costmap at every WP; cost >= LETHAL_INFLATED (70) -> move to the nearest
    cell < 50 within 2 m, or DROP the WP if none exists.  Runs on the host
    before the rollout, like the reference client before sending the action.

    teach_grid: (R, C) trinary int8.  Returns (wps', n') with dropped WPs
    compacted out and tail-padded like subsample_waypoints.
    """
    from scipy import ndimage

    occ = np.asarray(teach_grid) == 2
    dist = ndimage.distance_transform_edt(~occ) * map_cfg.resolution
    cost = 98.0 * np.exp(-map_cfg.cost_scaling
                         * np.maximum(dist - map_cfg.inscribed_radius, 0.0))
    cost = np.where(dist <= map_cfg.inscribed_radius, 99.0, cost)
    cost = np.where(dist <= map_cfg.inflation_radius + map_cfg.inscribed_radius,
                    cost, 0.0)

    res = map_cfg.resolution
    rad_cells = int(proj_radius_m / res) + 1

    def cost_at(x, y):
        c = int((x - map_cfg.origin_x) / res)
        r = int((y - map_cfg.origin_y) / res)
        if not (0 <= r < cost.shape[0] and 0 <= c < cost.shape[1]):
            return 100.0
        return float(cost[r, c])

    kept = []
    for x, y in np.asarray(wps)[: int(n_wps)]:
        if cost_at(x, y) < lethal:
            kept.append((x, y))
            continue
        best, best_d = None, None
        for dr in range(-rad_cells, rad_cells + 1):
            for dc in range(-rad_cells, rad_cells + 1):
                if dr * dr + dc * dc > rad_cells * rad_cells:
                    continue
                nx, ny = x + dc * res, y + dr * res
                if cost_at(nx, ny) < free:
                    d = np.hypot(nx - x, ny - y)
                    if best_d is None or d < best_d:
                        best, best_d = (nx, ny), d
        if best is not None:
            kept.append(best)
        # else: dropped altogether (client "skipped_n")

    kept = np.asarray(kept if kept else [np.asarray(wps)[0]], np.float32)
    n = min(len(kept), int(wps.shape[0]))
    out = np.zeros_like(np.asarray(wps, np.float32))
    out[:n] = kept[:n]
    out[n:] = kept[n - 1]
    return out, n


def init_dispatch(wps, n_wps, cfg: PlannerConfig) -> DispatchState:
    W = cfg.max_waypoints
    P = cfg.path_len
    wps = jnp.asarray(wps, jnp.float32)
    return DispatchState(
        wps=wps,
        wps_proj=wps,
        n_wps=jnp.int32(n_wps),
        skip=jnp.zeros(W, bool),
        idx=jnp.int32(0),
        target=wps[0],
        ticks_on_wp=jnp.int32(0),
        plan_fails=jnp.int32(0),
        path_xy=jnp.zeros((P, 2), jnp.float32),
        n_path=jnp.int32(0),
        has_path=jnp.array(False),
        plan_version=jnp.int32(0),
        plan_tick=jnp.int32(-10 ** 6),
        planned_target=jnp.full(2, jnp.float32(1e9)),
        reached_count=jnp.int32(0),
        skipped_count=jnp.int32(0),
        done=jnp.array(False),
        goal_blocked=jnp.array(False),
        blocked_ticks=jnp.int32(0),
    )


def _cost_at(cost_win, win_r0, win_c0, xy, map_cfg: MapConfig, W: int):
    """Costmap cost at world point; 0 outside the window (unknown = free,
    same as Nav2 beyond the rolling costmap)."""
    c = (xy[..., 0] - map_cfg.origin_x) / map_cfg.resolution - win_c0
    r = (xy[..., 1] - map_cfg.origin_y) / map_cfg.resolution - win_r0
    ri = jnp.clip(r, 0, W - 1).astype(jnp.int32)
    ci = jnp.clip(c, 0, W - 1).astype(jnp.int32)
    inside = (r >= 0) & (r < W) & (c >= 0) & (c < W)
    return jnp.where(inside, cost_win[ri, ci], 0.0)


def _cost_peak_3x3(cost_win, win_r0, win_c0, xy, map_cfg: MapConfig, W: int):
    """Max cost in the 3x3 neighborhood (send_goals _lookahead_cost)."""
    offs = jnp.array([[dr, dc] for dr in (-1, 0, 1) for dc in (-1, 0, 1)],
                     jnp.float32) * map_cfg.resolution
    pts = xy[None, :] + offs[:, [1, 0]]
    return _cost_at(cost_win, win_r0, win_c0, pts, map_cfg, W).max()


def project_waypoints(state: DispatchState, cost_win, win_r0, win_c0,
                      map_cfg: MapConfig, cfg: PlannerConfig) -> DispatchState:
    """Re-project every future WP to the nearest free cell (vectorized BFS
    replacement: brute-force nearest low-cost cell within the search disc).

    send_goals_hybrid.costmap_cb + _project_wp semantics, incl. the v56-B
    rule: if the free cell is further than proj_max_shift, keep the original
    WP; if no free cell within proj_max_search, mark the WP skipped.
    """
    W = cfg.window
    res = map_cfg.resolution

    rows = jnp.arange(W)
    cols = jnp.arange(W)
    cell_x = map_cfg.origin_x + (cols[None, :] + win_c0 + 0.5) * res
    cell_y = map_cfg.origin_y + (rows[:, None] + win_r0 + 0.5) * res
    free = cost_win < cfg.proj_cost_thresh

    half = W / 2 * res
    win_cx = map_cfg.origin_x + (win_c0 + W / 2) * res
    win_cy = map_cfg.origin_y + (win_r0 + W / 2) * res

    def project_one(wp, currently_skipped, active):
        d2 = (cell_x - wp[0]) ** 2 + (cell_y - wp[1]) ** 2
        own_cost = _cost_at(cost_win, win_r0, win_c0, wp, map_cfg, W)
        inside = (jnp.abs(wp[0] - win_cx) < half) & (jnp.abs(wp[1] - win_cy) < half)
        needs = inside & active & (own_cost >= cfg.proj_cost_thresh)

        d2_free = jnp.where(free, d2, jnp.inf)
        k = jnp.argmin(d2_free)
        best_d = jnp.sqrt(d2_free.reshape(-1)[k])
        br, bc = k // W, k % W
        bx = map_cfg.origin_x + (bc + win_c0 + 0.5) * res
        by = map_cfg.origin_y + (br + win_r0 + 0.5) * res

        found = best_d <= cfg.proj_max_search_m
        keep_orig = best_d > cfg.proj_max_shift_m  # v56-B: keep original
        new_wp = jnp.where(needs & found & ~keep_orig,
                           jnp.array([bx, by]), wp)
        new_skip = jnp.where(needs, ~found, currently_skipped & active)
        return new_wp, new_skip

    active = (jnp.arange(cfg.max_waypoints) >= state.idx) & \
             (jnp.arange(cfg.max_waypoints) < state.n_wps)
    new_wp, new_skip = jax.vmap(project_one)(state.wps, state.skip, active)
    return state._replace(wps_proj=new_wp, skip=new_skip)


def find_detour(cost_win, win_r0, win_c0, wp, map_cfg: MapConfig,
                cfg: PlannerConfig):
    """Detour ring: 24 samples per radius, accept cost < detour_max_cost,
    return lowest-cost candidate (prefer smaller radii like the reference's
    radius-ordered search)."""
    angles = 2.0 * jnp.pi * jnp.arange(cfg.detour_samples) / cfg.detour_samples
    radii = jnp.asarray(cfg.detour_radii)
    dx = radii[:, None] * jnp.cos(angles)[None, :]
    dy = radii[:, None] * jnp.sin(angles)[None, :]
    cand = wp[None, None, :] + jnp.stack([dx, dy], -1)       # (R, S, 2)
    costs = _cost_at(cost_win, win_r0, win_c0, cand, map_cfg, cfg.window)
    ring_pen = jnp.arange(len(cfg.detour_radii), dtype=jnp.float32)[:, None] * 1000.0
    score = jnp.where(costs < cfg.detour_max_cost, costs + ring_pen, jnp.inf)
    k = jnp.argmin(score)
    ok = jnp.isfinite(score.reshape(-1)[k])
    best = cand.reshape(-1, 2)[k]
    return best, ok


def too_close_to_known(xy, known_xy, known_r, known_active,
                       clearance: float = 0.9):
    """send_goals _wp_too_close_to_known: costmap-independent clearance
    check against a-priori known dropped obstacles (KNOWN_CLEARANCE_M 0.9)."""
    d = jnp.linalg.norm(xy[None, :] - known_xy, axis=-1)
    return jnp.any(known_active & (d < known_r + clearance))


def dispatch_plan(state: DispatchState, robot_xy, cost_win, win_r0, win_c0,
                  known_xy, known_r, known_active,
                  map_cfg: MapConfig, cfg: PlannerConfig,
                  tick=0, coarse_phi=None, coarse_goal=None) -> DispatchState:
    """Heavy phase — run at a uniform cadence (costmap update ticks):
    reproject WPs, pick target (WP or detour), run the wavefront planner.

    Path COMMITMENT: a good new plan replaces the committed path only when
    the target changed, the committed path is older than ``replan_period``,
    or there is no path yet.  The reference gets this for free from its
    5 s replan loop (send_goals follow_waypoint) vs the 2 Hz costmap; at a
    2 Hz replan rate without commitment, homotopy flips around obstacle
    clusters thrash the follower into place-oscillation."""
    if cfg.enable_projection:
        state = project_waypoints(state, cost_win, win_r0, win_c0, map_cfg, cfg)

    idx = jnp.minimum(state.idx, state.n_wps - 1)
    is_final = idx >= state.n_wps - cfg.final_wp_count
    wp = state.wps_proj[idx]

    known_hit = too_close_to_known(wp, known_xy, known_r, known_active) \
        if cfg.enable_known_obstacle_gate else jnp.array(False)
    if cfg.enable_lookahead_skip:
        wp_cost = _cost_peak_3x3(cost_win, win_r0, win_c0, wp, map_cfg,
                                 cfg.window)
        unsafe = (~is_final) & (known_hit | (wp_cost >= cfg.lookahead_skip_cost))
    else:
        # stock FollowWaypoints: no live cost lookahead — the client only
        # projected/dropped WPs once before the run
        unsafe = known_hit & ~is_final

    def detour_clear(cand):
        d = jnp.linalg.norm(cand[None, :] - known_xy, axis=-1)
        return ~jnp.any(known_active & (d < known_r + 0.9))

    detour_xy, detour_ok = find_detour(cost_win, win_r0, win_c0, wp,
                                       map_cfg, cfg)
    detour_ok = detour_ok & detour_clear(detour_xy) & cfg.enable_detour
    target = jnp.where(unsafe & detour_ok, detour_xy, wp)
    # unsafe with no detour -> mark skip (consumed by dispatch_move)
    skip = state.skip.at[idx].set(state.skip[idx] | (unsafe & ~detour_ok))

    # Two-level escape hatch: the full-map coarse potential seeds the
    # window border ONLY after sustained window-plan failure (the target is
    # unreachable within 19.2 m — a bypass longer than the window).  An
    # always-available coarse route suppressed the dispatcher's skip
    # machinery and sent robots on map-scale detours (coverage 73 -> 53 %,
    # r4 measurement, PlannerConfig.coarse_seed note); gating on
    # plan_fails engages it exactly where the reference's full-map NavFn
    # is the behavioral difference — when the window says "no path".
    if coarse_phi is not None:
        escape = state.plan_fails >= cfg.coarse_escape_fails
        coarse_goal = jnp.where(escape, coarse_goal, jnp.full(2, 1e9))
    plan = plan_world(cost_win, win_r0, win_c0, robot_xy, target, map_cfg,
                      cfg, coarse_phi=coarse_phi, coarse_goal=coarse_goal)
    # Lethal-start semantics.  Nav2's NavFn CLEARS the start cell before
    # planning ("we know it can't be an obstacle"), so the hybrid stack's
    # planner keeps planning with the believed pose inside inflation —
    # gating ours-mode plan_good on start_lethal is parity-wrong (and,
    # measured r5, behaviorally inert for ours: the anchored believed
    # pose lands within the inscribed radius of a mapped cell so rarely
    # that the full campaign is bit-identical with and without the gate).
    # For the STOCK baseline, start_lethal stands in for the reference's
    # physical wedge-stall: a believed pose inside mapped inflation means
    # the TRUE pose is wedged against the real obstacle a drift-offset
    # away; stock has no prox limiter/wedge reversal, so the BT loops
    # recoveries in place ("recovery behaviors loop endlessly in
    # tree-dense costmap inflation; robot barely moves",
    # routes/README.md:179-185) until the GT-stall watchdog kills the
    # run — exp-74's 3-10 % coverages with near-zero integrated drift.
    start_cost = _cost_at(cost_win, win_r0, win_c0, robot_xy, map_cfg,
                          cfg.window)
    start_lethal = start_cost >= 99.0
    plan_good = plan.ok & (plan.n_path > 1)
    if cfg.stock_follow:
        plan_good = plan_good & ~start_lethal

    # stock: NavFn planning FAILS when every cell within the goal
    # tolerance (1 m, nav2_stock_params.yaml v3c) is lethal — evaluated at
    # plan cadence like Nav2's planner_server peeking the global costmap.
    # The hybrid stack never planned to such goals in the first place
    # (projection/skip moved them), so the tighter 3x3 peak stays its gate.
    if cfg.stock_follow:
        tol = cfg.stock_goal_tolerance_m
        ang = 2.0 * jnp.pi * jnp.arange(8) / 8
        rads = jnp.asarray([0.0, 0.5 * tol, tol])
        disc = target[None, None, :] + rads[:, None, None] * jnp.stack(
            [jnp.cos(ang), jnp.sin(ang)], -1)[None, :, :]
        disc_cost = _cost_at(cost_win, win_r0, win_c0, disc, map_cfg,
                             cfg.window)
        # start-lethal joins the goal-disc failure: either way the BT's
        # ComputePathToPose action errors and the controller sits path-less
        # through the recovery crawl (see start_lethal above)
        goal_blocked = (disc_cost.min() >= 99.0) | start_lethal
    else:
        goal_cost = _cost_peak_3x3(cost_win, win_r0, win_c0, target,
                                   map_cfg, cfg.window)
        goal_blocked = goal_cost >= 99.0

    # path-commitment acceptance gate.  Stock: a planner-failed (blocked)
    # goal leaves the BT with NO path — the controller publishes zero and
    # the progress checker drives the recovery cycle (spin/backup/wait)
    # until the abort in dispatch_move.
    target_changed = jnp.linalg.norm(target - state.planned_target) > 0.5
    stale = (tick - state.plan_tick) >= cfg.replan_period
    accept = plan_good & (target_changed | stale | (~state.has_path))
    if cfg.stock_follow:
        accept = accept & ~goal_blocked

    return state._replace(
        target=target,
        skip=skip,
        path_xy=jnp.where(accept, plan.path_xy, state.path_xy),
        n_path=jnp.where(accept, plan.n_path, state.n_path),
        has_path=jnp.where(cfg.stock_follow & goal_blocked,
                           jnp.array(False), accept | state.has_path),
        plan_version=state.plan_version + jnp.where(accept, 1, 0),
        plan_tick=jnp.where(accept, tick, state.plan_tick),
        planned_target=jnp.where(accept, target, state.planned_target),
        plan_fails=jnp.where(plan_good, 0, state.plan_fails + 1),
        goal_blocked=goal_blocked,
    )


def dispatch_move(state: DispatchState, robot_xy, known_xy, known_r,
                  known_active, cfg: PlannerConfig) -> DispatchState:
    """Cheap phase — every tick: reach / skip / timeout / advance."""
    idx = jnp.minimum(state.idx, state.n_wps - 1)
    is_final = idx >= state.n_wps - cfg.final_wp_count

    d = jnp.linalg.norm(state.target - robot_xy)
    reached = d < cfg.tolerance_m

    # v59 late-detect: abandon a target that sits on a known obstacle once
    # we are close (send_goals follow_waypoint d < 3.0 check)
    if cfg.enable_known_obstacle_gate:
        late_detect = (~is_final) & (d < 3.0) & too_close_to_known(
            state.target, known_xy, known_r, known_active)
    else:
        late_detect = jnp.array(False)

    if cfg.stock_follow:
        # stock Nav2 WaypointFollower: no per-WP timeout exists — a goal
        # the goal_checker never declares reached blocks forever.  A
        # planner-FAILED goal (all cells within the NavFn tolerance
        # lethal — drift pushed the WP into static-map inflation) leaves
        # the BT path-less: the progress checker stalls, recovery rounds
        # cycle (spin/backup/wait — each spin blurring the VIO, each
        # backup corrupting the unsigned encoder), and after
        # stock_abort_ticks NavigateToPose aborts; stop_on_failure=false
        # then moves to the next — usually equally blocked — WP.  This
        # crawl is the reference's stall: 'recovery behaviors loop
        # endlessly ... robot barely moves' (routes/README.md:179-185),
        # runs ending at 30-100 m by the tier timeout.
        skip_now = state.skip[idx]
        aborted = state.goal_blocked & \
            (state.blocked_ticks >= cfg.stock_abort_ticks)
        fail_skip = aborted | ((~state.goal_blocked) &
                               (state.plan_fails >= cfg.max_plan_fails))
    else:
        skip_now = (state.skip[idx] | late_detect) & ~is_final
        max_fails = jnp.where(is_final, 10 ** 6, cfg.max_plan_fails)
        timeout = jnp.where(is_final, 2 * cfg.goal_timeout_ticks,
                            cfg.goal_timeout_ticks)
        fail_skip = (state.plan_fails >= max_fails) | \
            (state.ticks_on_wp >= timeout)

    advance = (reached | skip_now | fail_skip) & ~state.done
    new_idx = jnp.minimum(state.idx + jnp.where(advance, 1, 0), state.n_wps)
    done = state.done | (new_idx >= state.n_wps)

    # on advance, aim at the next projected WP until the next plan phase
    next_wp = state.wps_proj[jnp.minimum(new_idx, state.n_wps - 1)]
    return state._replace(
        idx=new_idx,
        target=jnp.where(advance, next_wp, state.target),
        ticks_on_wp=jnp.where(advance, 0, state.ticks_on_wp + 1),
        plan_fails=jnp.where(advance, 0, state.plan_fails),
        blocked_ticks=jnp.where(advance | ~state.goal_blocked, 0,
                                state.blocked_ticks + 1),
        reached_count=state.reached_count
        + jnp.where(reached & advance, 1, 0),
        skipped_count=state.skipped_count
        + jnp.where((skip_now | fail_skip) & ~reached & advance, 1, 0),
        done=done,
    )
