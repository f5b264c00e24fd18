"""The v55 pose-fusion relay as a pure scanned state machine.

Behavior-for-behavior port of tf_wall_clock_relay_v55.py's
``--slam-encoder`` mode — THE core algorithm of the reference stack:

- simulated encoder+compass dead-reckoning from GT diffs (0.5 % distance
  noise, 0.05 rad compass noise, :489-501)
- one-time SE(3)->SE(2) SLAM alignment over a 50-sample averaged window with
  GT-motion restart and yaw-jitter gate (``_slam_se3_to_nav``, :345-467),
  OpenCV-camera -> FLU frame conversion included
- SLAM freeze detection (60 ticks of no camera-plane motion while the
  encoder moves, :512-526)
- four fusion regimes (:534-584): ``strong`` 0.40 anchor/0.55 SLAM/0.05 enc
  (needs std <= 0.1 with a 2-streak), ``ok`` 0.20/0.75/0.05, ``no_anchor``
  adaptive alpha 0.95/0.70/0.40/0.10 by SLAM-vs-encoder disagreement, and
  encoder fallback when SLAM is lost/stale; jump rejection on top
- yaw always from the encoder compass (:585)

Regime codes in the trace: 0 no_anchor, 1 ok, 2 strong, 3 encoder-fallback.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nclt_slam_tpu.config import EncoderConfig, FusionConfig

# OpenCV camera (x right, y down, z fwd) -> FLU nav frame (v55.py:361-366)
T_FLU_FROM_CAM = jnp.array(
    [[0.0, 0.0, 1.0, 0.0],
     [-1.0, 0.0, 0.0, 0.0],
     [0.0, -1.0, 0.0, 0.0],
     [0.0, 0.0, 0.0, 1.0]]
)

ALIGN_FIELDS = 10  # sx sy sz qx qy qz qw gt_x gt_y gt_yaw

REGIME_NO_ANCHOR = 0
REGIME_OK = 1
REGIME_STRONG = 2
REGIME_ENCODER = 3


class FusionState(NamedTuple):
    # encoder dead-reckoning
    enc_xy: jax.Array          # (2,)
    enc_yaw: jax.Array
    enc_total_dist: jax.Array
    prev_gt_xy: jax.Array      # (2,)
    initialized: jax.Array     # bool
    # alignment
    T_nav_slam: jax.Array      # (4, 4)
    committed: jax.Array       # bool
    align_buf: jax.Array       # (align_window, ALIGN_FIELDS)
    align_n: jax.Array         # int32
    align_gt0: jax.Array       # (2,)
    align_gt0_set: jax.Array   # bool
    # freeze detection
    prev_slam_xz: jax.Array    # (2,)
    have_prev_slam: jax.Array  # bool
    frozen_count: jax.Array    # int32
    # anchor
    anchor_xy: jax.Array       # (2,)
    anchor_std: jax.Array
    anchor_tick: jax.Array     # int32 (tick the anchor arrived)
    has_anchor: jax.Array      # bool
    strong_streak: jax.Array   # int32
    # jump rejection (raw aligned-SLAM pose delta, not the blended output)
    prev_nav: jax.Array        # (3,) last aligned SLAM x, y, yaw
    have_prev_nav: jax.Array   # bool
    # last published pose — what the matcher reads as its query pose, like
    # the reference matcher reading the relay's /tmp/isaac_pose.txt
    pub_nav: jax.Array         # (3,) x, y, yaw
    # degraded-compass drift accumulator (0 with the absolute-compass model)
    compass_bias: jax.Array    # ()


def init_fusion(cfg: FusionConfig) -> FusionState:
    z2 = jnp.zeros(2)
    return FusionState(
        enc_xy=z2, enc_yaw=jnp.float32(0.0), enc_total_dist=jnp.float32(0.0),
        prev_gt_xy=z2, initialized=jnp.array(False),
        T_nav_slam=jnp.eye(4), committed=jnp.array(False),
        align_buf=jnp.zeros((cfg.align_window, ALIGN_FIELDS)),
        align_n=jnp.int32(0), align_gt0=z2, align_gt0_set=jnp.array(False),
        prev_slam_xz=z2, have_prev_slam=jnp.array(False),
        frozen_count=jnp.int32(0),
        anchor_xy=z2, anchor_std=jnp.float32(999.0),
        anchor_tick=jnp.int32(-10 ** 6), has_anchor=jnp.array(False),
        strong_streak=jnp.int32(0),
        prev_nav=jnp.zeros(3), have_prev_nav=jnp.array(False),
        pub_nav=jnp.zeros(3),
        compass_bias=jnp.float32(0.0),
    )


def anchor_update(state: FusionState, anchor_xy, anchor_std, tick,
                  cfg: FusionConfig) -> FusionState:
    """Ingest an /anchor_correction message (v55 _anchor_cb:235-256)."""
    streak = jnp.where(anchor_std <= cfg.anchor_strong_std,
                       state.strong_streak + 1,
                       jnp.maximum(0, state.strong_streak - 1))
    # DR reference reset toward the anchor (FusionConfig.anchor_enc_feedback)
    enc_xy = state.enc_xy + cfg.anchor_enc_feedback * \
        (anchor_xy - state.enc_xy)
    return state._replace(anchor_xy=anchor_xy, anchor_std=anchor_std,
                          anchor_tick=tick, has_anchor=jnp.array(True),
                          strong_streak=streak, enc_xy=enc_xy)


def _tick_alignment(T_slam, gt_x, gt_y, gt_yaw):
    """Naive single-sample alignment used while buffering (:382-399)."""
    c, s = jnp.cos(gt_yaw), jnp.sin(gt_yaw)
    T_nav_origin = jnp.array(
        [[c, -s, 0.0, gt_x],
         [s, c, 0.0, gt_y],
         [0.0, 0.0, 1.0, 0.0],
         [0.0, 0.0, 0.0, 1.0]])
    T = T_nav_origin @ T_FLU_FROM_CAM @ jnp.linalg.inv(T_slam)
    T_nav = T @ T_slam
    return T_nav[0, 3], T_nav[1, 3], gt_yaw


def _quat_to_mat(q):
    from nclt_slam_tpu.core.quat import quat_to_mat
    return quat_to_mat(q)


def _slam_to_nav(state: FusionState, T_slam, slam_quat, slam_t, gt_x, gt_y,
                 gt_yaw, cfg: FusionConfig):
    """SE(3)->SE(2) with the one-time averaged alignment window."""
    W = cfg.align_window

    # GT displacement since buffering started → restart if the robot moved
    gt0 = jnp.where(state.align_gt0_set, state.align_gt0,
                    jnp.array([gt_x, gt_y]))
    disp = jnp.linalg.norm(jnp.array([gt_x, gt_y]) - gt0)
    moved = disp > cfg.align_max_gt_disp

    # append sample (only meaningful pre-commit)
    sample = jnp.concatenate([slam_t, slam_quat,
                              jnp.array([gt_x, gt_y, gt_yaw])])
    n = jnp.where(moved, 0, state.align_n)
    buf = jnp.where(moved, jnp.zeros_like(state.align_buf), state.align_buf)
    buf = buf.at[jnp.minimum(n, W - 1)].set(sample)
    n = jnp.minimum(n + 1, W)

    full = n >= W

    # averaged alignment from the buffer
    idx = jnp.arange(W)
    valid = (idx < n)[:, None]
    cnt = jnp.maximum(n, 1).astype(jnp.float32)
    avg_t = (buf[:, 0:3] * valid).sum(0) / cnt
    quats = buf[:, 3:7]
    ref = buf[0, 3:7]
    dots = quats @ ref
    quats_aligned = jnp.where((dots < 0)[:, None], -quats, quats) * valid
    avg_q = quats_aligned.sum(0) / cnt
    avg_q = avg_q / (jnp.linalg.norm(avg_q) + 1e-9)
    avg_gt_x = (buf[:, 7] * valid[:, 0]).sum() / cnt
    avg_gt_y = (buf[:, 8] * valid[:, 0]).sum() / cnt
    yaws = buf[:, 9]
    sin_m = (jnp.sin(yaws) * valid[:, 0]).sum() / cnt
    cos_m = (jnp.cos(yaws) * valid[:, 0]).sum() / cnt
    avg_yaw = jnp.arctan2(sin_m, cos_m)
    yaw_res = jnp.angle(jnp.exp(1j * (yaws - avg_yaw))) * valid[:, 0]
    yaw_std_deg = jnp.degrees(jnp.sqrt((yaw_res ** 2).sum() / cnt))
    jittery = yaw_std_deg > cfg.align_max_yaw_std_deg

    # jittery full window → drop oldest half and keep buffering (:430-441)
    half = W // 2
    rolled = jnp.roll(buf, -half, axis=0)
    buf = jnp.where(full & jittery, rolled, buf)
    n = jnp.where(full & jittery, jnp.int32(W - half), n)

    # commit the averaged alignment
    R_slam_avg = _quat_to_mat(avg_q)
    T_slam_avg = jnp.eye(4).at[:3, :3].set(R_slam_avg).at[:3, 3].set(avg_t)
    c, s = jnp.cos(avg_yaw), jnp.sin(avg_yaw)
    T_nav_origin = jnp.array(
        [[c, -s, 0.0, avg_gt_x],
         [s, c, 0.0, avg_gt_y],
         [0.0, 0.0, 1.0, 0.0],
         [0.0, 0.0, 0.0, 1.0]])
    T_commit = T_nav_origin @ T_FLU_FROM_CAM @ jnp.linalg.inv(T_slam_avg)
    commit_now = full & (~jittery) & (~state.committed)

    T_nav_slam = jnp.where(commit_now, T_commit, state.T_nav_slam)
    committed = state.committed | commit_now

    new_state = state._replace(
        T_nav_slam=T_nav_slam, committed=committed,
        align_buf=jnp.where(state.committed, state.align_buf, buf),
        align_n=jnp.where(state.committed, state.align_n, n),
        align_gt0=jnp.where(state.committed, state.align_gt0,
                            jnp.where(moved, jnp.array([gt_x, gt_y]), gt0)),
        align_gt0_set=state.align_gt0_set | (~state.committed),
    )

    # output: committed transform if available, else per-tick fallback.
    # The SLAM body frame is the camera (RDF) frame; right-multiply by the
    # inverse convention rotation so the body frame is FLU again — without
    # it the extracted yaw carries the CAM->FLU yaw component (-pi/2).
    T_nav = T_nav_slam @ T_slam @ jnp.linalg.inv(T_FLU_FROM_CAM)
    nav_c = (T_nav[0, 3], T_nav[1, 3],
             jnp.arctan2(T_nav[1, 0], T_nav[0, 0]))
    fx, fy, fyaw = _tick_alignment(T_slam, gt_x, gt_y, gt_yaw)
    nav_x = jnp.where(committed, nav_c[0], fx)
    nav_y = jnp.where(committed, nav_c[1], fy)
    nav_yaw = jnp.where(committed, nav_c[2], fyaw)
    return new_state, nav_x, nav_y, nav_yaw


def fusion_tick(state: FusionState, gt_x, gt_y, gt_yaw, slam_t, slam_quat,
                slam_ok, tick, key, enc_cfg: EncoderConfig,
                cfg: FusionConfig):
    """One relay tick.  Returns (state, nav_x, nav_y, nav_yaw, regime)."""
    k1, k2, k3 = jax.random.split(key, 3)

    # ---- encoder+compass dead-reckoning (always running fallback) ----
    first = ~state.initialized
    # optional rate-gyro degradation: heading bias random-walks over time
    compass_bias = state.compass_bias + enc_cfg.compass_drift * 0.1 * \
        jax.random.normal(k3)
    noisy_yaw = gt_yaw + compass_bias + \
        enc_cfg.compass_noise * jax.random.normal(k1)
    d = jnp.array([gt_x, gt_y]) - state.prev_gt_xy
    displacement = jnp.linalg.norm(d)
    # v55 parity: UNSIGNED displacement along the noisy heading
    # (v55.py:494-498) — reversals integrate forward, so recovery backups
    # and wedge reversals corrupt the dead-reckoning by their full length.
    # This runaway is load-bearing for the reference's stock-Nav2 collapse
    # (recovery loops -> unbounded encoder error -> goal_checker never
    # REACHes; routes/README.md:179-185).  EncoderConfig.signed_disp=True
    # selects the physically-correct signed-wheel model instead.
    if enc_cfg.signed_disp:
        base_disp = d[0] * jnp.cos(gt_yaw) + d[1] * jnp.sin(gt_yaw)
    else:
        base_disp = displacement
    noisy_disp = base_disp * (1.0 + enc_cfg.dist_noise * jax.random.normal(k2))
    move = (~first) & (displacement > 0.001)
    enc_xy = jnp.where(
        first, jnp.array([gt_x, gt_y]),
        state.enc_xy + jnp.where(
            move,
            noisy_disp * jnp.array([jnp.cos(noisy_yaw), jnp.sin(noisy_yaw)]),
            jnp.zeros(2)))
    enc_yaw = jnp.where(first, gt_yaw, noisy_yaw)
    enc_total = state.enc_total_dist + jnp.where(move, displacement, 0.0)

    state = state._replace(
        enc_xy=enc_xy, enc_yaw=enc_yaw, enc_total_dist=enc_total,
        prev_gt_xy=jnp.array([gt_x, gt_y]), initialized=jnp.array(True),
        compass_bias=compass_bias)

    # ---- freeze detection (camera xz plane, v55:512-526) ----
    slam_xz = jnp.array([slam_t[0], slam_t[2]])
    slam_motion = jnp.linalg.norm(slam_xz - state.prev_slam_xz)
    frozen_inc = state.have_prev_slam & (displacement > cfg.freeze_enc_min_disp) & \
        (slam_motion < cfg.freeze_slam_max_motion)
    frozen_count = jnp.where(
        slam_ok, jnp.where(frozen_inc, state.frozen_count + 1, 0),
        state.frozen_count)
    state = state._replace(
        prev_slam_xz=jnp.where(slam_ok, slam_xz, state.prev_slam_xz),
        have_prev_slam=state.have_prev_slam | slam_ok,
        frozen_count=frozen_count)
    slam_ok = slam_ok & (frozen_count <= cfg.freeze_ticks)

    # ---- SE(3)->SE(2) alignment ----
    R_slam = _quat_to_mat(slam_quat)
    T_slam = jnp.eye(4).at[:3, :3].set(R_slam).at[:3, 3].set(slam_t)
    align_state, slam_nx, slam_ny, slam_nyaw = _slam_to_nav(
        state, T_slam, slam_quat, slam_t, gt_x, gt_y, gt_yaw, cfg)
    # only advance alignment machinery while SLAM is tracking
    state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(slam_ok, new, old), align_state, state)

    # ---- regime selection + blend ----
    tick_f = tick.astype(jnp.float32) * 0.1
    anchor_age = tick_f - state.anchor_tick.astype(jnp.float32) * 0.1
    anchor_fresh = state.has_anchor & (anchor_age <= cfg.anchor_stale_s) & \
        (state.anchor_std <= cfg.anchor_ok_std)
    anchor_strong = anchor_fresh & (state.anchor_std <= cfg.anchor_strong_std) & \
        (state.strong_streak >= cfg.anchor_hysteresis_n)

    regime = jnp.where(anchor_strong, REGIME_STRONG,
                       jnp.where(anchor_fresh, REGIME_OK, REGIME_NO_ANCHOR))

    ax, ay = state.anchor_xy[0], state.anchor_xy[1]
    ex, ey = state.enc_xy[0], state.enc_xy[1]

    strong_x = cfg.strong_w_anchor * ax + cfg.strong_w_slam * slam_nx + cfg.strong_w_enc * ex
    strong_y = cfg.strong_w_anchor * ay + cfg.strong_w_slam * slam_ny + cfg.strong_w_enc * ey
    ok_x = cfg.ok_w_anchor * ax + cfg.ok_w_slam * slam_nx + cfg.ok_w_enc * ex
    ok_y = cfg.ok_w_anchor * ay + cfg.ok_w_slam * slam_ny + cfg.ok_w_enc * ey

    # adaptive no-anchor alpha (exp 54 ladder)
    slam_enc_d = jnp.hypot(slam_nx - ex, slam_ny - ey)
    a0, a1, a2, a3 = cfg.noanchor_alpha_steps
    d0, d1, d2 = cfg.noanchor_dist_steps
    alpha_ladder = jnp.where(slam_enc_d < d0, a0,
                             jnp.where(slam_enc_d < d1, a1,
                                       jnp.where(slam_enc_d < d2, a2, a3)))
    anchor_recent = state.has_anchor & (anchor_age <= cfg.noanchor_anchor_age_s)
    alpha = jnp.where(anchor_recent, a0, alpha_ladder)
    na_x = alpha * slam_nx + (1.0 - alpha) * ex
    na_y = alpha * slam_ny + (1.0 - alpha) * ey

    nav_x = jnp.where(regime == REGIME_STRONG, strong_x,
                      jnp.where(regime == REGIME_OK, ok_x, na_x))
    nav_y = jnp.where(regime == REGIME_STRONG, strong_y,
                      jnp.where(regime == REGIME_OK, ok_y, na_y))

    # encoder fallback when SLAM lost/stale/frozen
    nav_x = jnp.where(slam_ok, nav_x, ex)
    nav_y = jnp.where(slam_ok, nav_y, ey)
    regime = jnp.where(slam_ok, regime, REGIME_ENCODER)
    # yaw source: encoder compass (v55:585) unless fuse_slam_yaw — then the
    # aligned SLAM heading while tracking (rate-gyro compass model)
    if cfg.fuse_slam_yaw:
        nav_yaw = jnp.where(slam_ok & state.committed, slam_nyaw, enc_yaw)
    else:
        nav_yaw = enc_yaw

    # ---- jump rejection (v55:771-797, JUMP_THRESHOLD 0.5 m /
    # YAW_JUMP_THRESHOLD 0.3 rad).  Measured on the raw aligned-SLAM pose
    # delta between ticks — a relocalization snap — NOT on the blended
    # output: position jump → trust the encoder this tick; yaw jump → skip
    # the SLAM yaw correction this tick (only live under fuse_slam_yaw).
    # Gated on a committed alignment: pre-commit per-tick fallback poses
    # churn by construction.  prev_nav holds the last aligned SLAM pose.
    from nclt_slam_tpu.core.lie import wrap_angle

    gate = state.have_prev_nav & slam_ok & state.committed
    pos_jump = gate & (
        jnp.hypot(slam_nx - state.prev_nav[0], slam_ny - state.prev_nav[1])
        > cfg.jump_threshold_m)
    yaw_jump = gate & (
        jnp.abs(wrap_angle(slam_nyaw - state.prev_nav[2]))
        > cfg.yaw_jump_threshold)
    nav_x = jnp.where(pos_jump, ex, nav_x)
    nav_y = jnp.where(pos_jump, ey, nav_y)
    if cfg.fuse_slam_yaw:
        nav_yaw = jnp.where(yaw_jump, enc_yaw, nav_yaw)

    state = state._replace(
        prev_nav=jnp.where(slam_ok & state.committed,
                           jnp.array([slam_nx, slam_ny, slam_nyaw]),
                           state.prev_nav),
        have_prev_nav=state.have_prev_nav | (slam_ok & state.committed),
        pub_nav=jnp.array([nav_x, nav_y, nav_yaw]))
    return state, nav_x, nav_y, nav_yaw, regime
