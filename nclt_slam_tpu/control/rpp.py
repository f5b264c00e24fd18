"""Stock Nav2 controller stack: RegulatedPurePursuit + BT recovery behaviors.

The reference's exp-74 baseline drives with the full stock Nav2 stack
(nav2_stock_params.yaml:26-81): controller_server running
RegulatedPurePursuitController (velocity-scaled lookahead, curvature
regulation, approach scaling, forward-only, no rotate-to-heading), a
SimpleProgressChecker (0.3 m / 30 s), and the behavior_server recovery
suite the BT cycles through when progress stalls (spin -> backup -> wait).
None of the thesis stack's additions exist here: no proximity limiter, no
anti-spin monitor, no wedge reversal (those live in
control/pure_pursuit.py and are what the ablation measures).

The reference baseline's characteristic failure mode — "recovery behaviors
loop endlessly in tree-dense costmap inflation; robot barely moves"
(routes/README.md:229-235) — emerges here for the same structural reasons:
the controller has no obstacle-aware speed governor, the progress checker
is the only fault detector, and each recovery hands control straight back
to the same controller in the same costmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nclt_slam_tpu.config import RppConfig

# recovery phases (BT round-robin: spin, backup, wait — behavior_server)
PHASE_NONE = 0
PHASE_SPIN = 1
PHASE_BACKUP = 2
PHASE_WAIT = 3


class RppState(NamedTuple):
    prev_v: jax.Array            # () float32 — velocity-scaled lookahead input
    anchor_xy: jax.Array         # (2,) progress-checker anchor
    anchor_t: jax.Array          # () float32
    anchor_set: jax.Array        # () bool
    phase: jax.Array             # () int32 recovery phase
    phase_until: jax.Array       # () float32
    recovery_count: jax.Array    # () int32 — total recoveries triggered


def init_rpp() -> RppState:
    return RppState(
        prev_v=jnp.float32(0.0),
        anchor_xy=jnp.zeros(2),
        anchor_t=jnp.float32(0.0),
        anchor_set=jnp.array(False),
        phase=jnp.int32(PHASE_NONE),
        phase_until=jnp.float32(0.0),
        recovery_count=jnp.int32(0),
    )


def rpp_tick(state: RppState, pos, yaw, path_xy, n_path, path_active,
             t_now, cfg: RppConfig):
    """One 10 Hz stock-controller tick.  Returns (new_state, v, w)."""
    P = path_xy.shape[0]
    idxs = jnp.arange(P)
    d = jnp.linalg.norm(path_xy - pos[None, :], axis=-1)
    on_path = idxs < n_path

    # --- carrot: velocity-scaled lookahead (use_velocity_scaled_lookahead) ---
    L = jnp.clip(state.prev_v * cfg.lookahead_time,
                 cfg.min_lookahead, cfg.max_lookahead)
    # RPP walks forward from the closest path point to the first point >= L
    closest = jnp.argmin(jnp.where(on_path, d, jnp.inf))
    far = on_path & (idxs >= closest) & (d >= L)
    any_far = jnp.any(far)
    tgt_idx = jnp.where(any_far, jnp.argmax(far), jnp.maximum(n_path - 1, 0))
    carrot = path_xy[tgt_idx]

    # --- pure-pursuit arc ---
    alpha = jnp.arctan2(carrot[1] - pos[1], carrot[0] - pos[0]) - yaw
    alpha = jnp.arctan2(jnp.sin(alpha), jnp.cos(alpha))
    L_eff = jnp.maximum(jnp.linalg.norm(carrot - pos), 0.1)
    kappa = 2.0 * jnp.sin(alpha) / L_eff

    v = jnp.float32(cfg.desired_linear_vel)

    # regulated curvature scaling (use_regulated_linear_velocity_scaling)
    radius = 1.0 / jnp.maximum(jnp.abs(kappa), 1e-6)
    v_reg = jnp.maximum(cfg.regulated_min_speed,
                        v * radius / cfg.regulated_min_radius)
    v = jnp.where(radius < cfg.regulated_min_radius, v_reg, v)

    # approach velocity scaling near the path end
    d_end = jnp.linalg.norm(path_xy[jnp.maximum(n_path - 1, 0)] - pos)
    v_app = jnp.maximum(cfg.min_approach_vel,
                        v * d_end / cfg.approach_scaling_dist)
    v = jnp.where(d_end < cfg.approach_scaling_dist, jnp.minimum(v, v_app), v)

    # forward-only (allow_reversing: false, use_rotate_to_heading: false)
    v = jnp.maximum(v, 0.0)
    w = jnp.clip(v * kappa, -cfg.max_angular_vel, cfg.max_angular_vel)

    # --- SimpleProgressChecker: movement anchor ---
    moved = jnp.linalg.norm(pos - state.anchor_xy) > cfg.required_movement_radius
    reset_anchor = moved | (~state.anchor_set)
    anchor_xy = jnp.where(reset_anchor, pos, state.anchor_xy)
    anchor_t = jnp.where(reset_anchor, t_now, state.anchor_t)
    stalled = state.anchor_set & (~moved) & \
        (t_now - anchor_t > cfg.movement_time_allowance) & path_active

    # --- recovery state machine (BT: spin -> backup -> wait, cycling) ---
    in_recovery = state.phase != PHASE_NONE
    phase_over = in_recovery & (t_now >= state.phase_until)

    # enter recovery on stall (round-robin start phase, like the BT
    # RoundRobin recovery node)
    start_phase = (state.recovery_count % 3) + 1
    enter = stalled & (~in_recovery)
    phase = jnp.where(enter, start_phase, state.phase)
    dur = jnp.where(phase == PHASE_SPIN, cfg.spin_duration_s,
                    jnp.where(phase == PHASE_BACKUP, cfg.backup_duration_s,
                              cfg.wait_duration_s))
    phase_until = jnp.where(enter, t_now + dur, state.phase_until)
    # phase expiry -> hand control back to the controller (PHASE_NONE) and
    # reset the progress anchor so the checker gets a fresh allowance
    phase = jnp.where(phase_over, PHASE_NONE, phase)
    exiting = phase_over
    anchor_xy = jnp.where(exiting | enter, pos, anchor_xy)
    anchor_t = jnp.where(exiting | enter, t_now, anchor_t)

    rec_v = jnp.where(phase == PHASE_BACKUP, cfg.backup_vel, 0.0)
    rec_w = jnp.where(phase == PHASE_SPIN, cfg.spin_vel, 0.0)
    active_recovery = phase != PHASE_NONE
    v = jnp.where(active_recovery, rec_v, v)
    w = jnp.where(active_recovery, rec_w, w)

    # no path -> controller_server publishes zero Twist
    v = jnp.where(path_active | active_recovery, v, 0.0)
    w = jnp.where(path_active | active_recovery, w, 0.0)

    new_state = RppState(
        prev_v=v,
        anchor_xy=anchor_xy,
        anchor_t=anchor_t,
        anchor_set=jnp.array(True),
        phase=phase,
        phase_until=phase_until,
        recovery_count=state.recovery_count + jnp.where(enter, 1, 0),
    )
    return new_state, v, w
