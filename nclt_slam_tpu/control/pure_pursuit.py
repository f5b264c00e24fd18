"""Pure-pursuit path follower with the reference's full recovery stack.

Behavior-for-behavior port of pure_pursuit_path_follower.py: 2.0 m lookahead
target on the current plan, v = 0.8·max(0.3, 1−|err|/1.57),
ω = clamp(1.2·err, ±0.8); the v53/v55 proximity limiter (3×3 ego-tube
forward samples at 0.3/0.7/1.1 m × ±0.15 m; cost ≥ 50 → 0.4 m/s, ≥ 99 →
0.15); the v9 anti-spin monitor (spin > 5 s with < 0.5 m progress → 3 s
cooldown crawling at 0.15); and the v55 wedge recovery (displacement
< 0.15 m over 4 s while commanding v > 0 → reverse at −0.25 for 2.5 s).
All branches are ``where``-masked for vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nclt_slam_tpu.config import ControlConfig, MapConfig

HIST = 64  # pos-history ring (6.4 s at 10 Hz; covers both 4 s and 5 s windows)


class CtrlState(NamedTuple):
    pos_hist: jax.Array        # (HIST, 2)
    hist_n: jax.Array          # () int32
    path_idx: jax.Array        # () int32 — monotonic progress along the plan
    path_version: jax.Array    # () int32 — plan id the progress refers to
    spin_accum: jax.Array      # () float32 seconds
    cooldown_until: jax.Array  # () float32 sim-time
    wedge_until: jax.Array     # () float32 sim-time
    prox_activations: jax.Array
    spin_activations: jax.Array
    wedge_activations: jax.Array


def init_ctrl() -> CtrlState:
    z = jnp.float32(0.0)
    return CtrlState(
        pos_hist=jnp.zeros((HIST, 2)),
        hist_n=jnp.int32(0),
        path_idx=jnp.int32(0),
        path_version=jnp.int32(-1),
        spin_accum=z, cooldown_until=z, wedge_until=z,
        prox_activations=jnp.int32(0),
        spin_activations=jnp.int32(0),
        wedge_activations=jnp.int32(0),
    )


def _disp_over(state: CtrlState, pos, window_ticks):
    """Displacement between now and ``window_ticks`` ago (ring lookup)."""
    past_slot = (state.hist_n - window_ticks) % HIST
    past = state.pos_hist[past_slot]
    have = state.hist_n >= window_ticks
    return jnp.where(have, jnp.linalg.norm(pos - past), jnp.inf)


def _prox_cost(cost_win, win_r0, win_c0, pos, yaw, map_cfg: MapConfig,
               cfg: ControlConfig, window: int):
    """Max cost over the forward ego-tube samples."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    d = jnp.asarray(cfg.prox_sample_dist)
    lat = jnp.asarray(cfg.prox_sample_lat)
    px = pos[0] + d[:, None] * c - lat[None, :] * s
    py = pos[1] + d[:, None] * s + lat[None, :] * c
    cc = (px - map_cfg.origin_x) / map_cfg.resolution - win_c0
    rr = (py - map_cfg.origin_y) / map_cfg.resolution - win_r0
    ri = jnp.clip(rr, 0, window - 1).astype(jnp.int32)
    ci = jnp.clip(cc, 0, window - 1).astype(jnp.int32)
    inside = (rr >= 0) & (rr < window) & (cc >= 0) & (cc < window)
    return jnp.where(inside, cost_win[ri, ci], 0.0).max()


def follower_tick(state: CtrlState, pos, yaw, path_xy, n_path, path_active,
                  plan_version, cost_win, win_r0, win_c0, t_now,
                  map_cfg: MapConfig, cfg: ControlConfig, window: int):
    """One 10 Hz follower tick.  Returns (new_state, cmd_v, cmd_w)."""
    P = path_xy.shape[0]
    dt = 0.1

    # --- monotonic path progress (reference path_cb resets path_idx on a
    #     new plan; tick() only ever advances it) ---
    path_idx = jnp.where(plan_version != state.path_version, 0, state.path_idx)
    d = jnp.linalg.norm(path_xy - pos[None, :], axis=-1)
    idxs = jnp.arange(P)
    ahead = (idxs >= path_idx) & (idxs < n_path)
    closest = jnp.argmin(jnp.where(ahead, d, jnp.inf))
    path_idx = jnp.maximum(path_idx, closest)

    # --- lookahead target: first point past path_idx >= LOOKAHEAD away ---
    eligible = (idxs >= path_idx) & (idxs < n_path)
    far = eligible & (d >= cfg.lookahead)
    any_far = jnp.any(far)
    first_far = jnp.argmax(far)
    last_valid = jnp.maximum(n_path - 1, 0)
    tgt_idx = jnp.where(any_far, first_far, last_valid)
    tgt = path_xy[tgt_idx]

    err = jnp.arctan2(tgt[1] - pos[1], tgt[0] - pos[0]) - yaw
    err = jnp.arctan2(jnp.sin(err), jnp.cos(err))

    v = cfg.max_vel * jnp.maximum(0.3, 1.0 - jnp.abs(err) / 1.57)
    w = jnp.clip(cfg.gain_ang * err, -cfg.max_ang, cfg.max_ang)

    # --- proximity limiter ---
    prox = _prox_cost(cost_win, win_r0, win_c0, pos, yaw, map_cfg, cfg, window)
    v_cap = jnp.where(prox >= cfg.prox_cost_lethal, cfg.v_lethal,
                      jnp.where(prox >= cfg.prox_cost_slow, cfg.v_slow,
                                cfg.max_vel))
    prox_hit = (v_cap < v) & cfg.enable_prox
    v = jnp.where(cfg.enable_prox, jnp.minimum(v, v_cap), v)

    # --- anti-spin accounting ---
    is_spinning = (jnp.abs(w) >= cfg.spin_w_thresh) & \
                  (jnp.abs(v) <= cfg.spin_v_thresh * 2)
    spin_accum = jnp.where(is_spinning, state.spin_accum + dt,
                           jnp.maximum(0.0, state.spin_accum - 2 * dt))

    # --- wedge recovery ---
    wedge_ticks = jnp.int32(cfg.wedge_window_s / dt)
    wedge_disp = _disp_over(state, pos, wedge_ticks)
    in_wedge_backup = t_now < state.wedge_until
    trigger_wedge = (~in_wedge_backup) & (wedge_disp < cfg.wedge_min_disp_m) & \
                    (v > 0.05) & (state.hist_n > 30) & cfg.enable_wedge
    wedge_until = jnp.where(trigger_wedge, t_now + cfg.wedge_backup_s,
                            state.wedge_until)
    backing = in_wedge_backup | trigger_wedge
    v = jnp.where(backing, cfg.wedge_backup_v, v)
    w = jnp.where(backing, 0.0, w)

    # --- anti-spin cooldown (after wedge so wedge takes precedence) ---
    prog_ticks = jnp.int32(cfg.progress_window_s / dt)
    progress = _disp_over(state, pos, prog_ticks)
    in_cooldown = t_now < state.cooldown_until
    trigger_spin = (~backing) & (~in_cooldown) & \
                   (spin_accum >= cfg.spin_limit_s) & \
                   (progress < cfg.min_progress_m) & cfg.enable_antispin
    cooldown_until = jnp.where(trigger_spin, t_now + cfg.spin_cooldown_s,
                               state.cooldown_until)
    crawling = (~backing) & (in_cooldown | trigger_spin)
    v = jnp.where(crawling, 0.15, v)
    w = jnp.where(crawling, 0.0, w)
    spin_accum = jnp.where(trigger_spin, 0.0, spin_accum)

    # no path → stop (reference publishes zero Twist)
    v = jnp.where(path_active, v, 0.0)
    w = jnp.where(path_active, w, 0.0)

    # history ring update (reset on wedge trigger, like the reference)
    slot = state.hist_n % HIST
    pos_hist = state.pos_hist.at[slot].set(pos)
    hist_n = jnp.where(trigger_wedge, 1, state.hist_n + 1)
    pos_hist = jnp.where(trigger_wedge,
                         jnp.zeros_like(pos_hist).at[0].set(pos), pos_hist)

    new_state = CtrlState(
        pos_hist=pos_hist,
        hist_n=hist_n,
        path_idx=path_idx,
        path_version=plan_version,
        spin_accum=spin_accum,
        cooldown_until=cooldown_until,
        wedge_until=wedge_until,
        prox_activations=state.prox_activations + jnp.where(prox_hit, 1, 0),
        spin_activations=state.spin_activations + jnp.where(trigger_spin, 1, 0),
        wedge_activations=state.wedge_activations + jnp.where(trigger_wedge, 1, 0),
    )
    return new_state, v, w
