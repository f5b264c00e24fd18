"""v55 relay fusion behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nclt_slam_tpu.config import DEFAULT
from nclt_slam_tpu.core.quat import quat_from_yaw, quat_mul
from nclt_slam_tpu.fusion import (
    REGIME_ENCODER,
    REGIME_NO_ANCHOR,
    REGIME_OK,
    REGIME_STRONG,
    anchor_update,
    fusion_tick,
    init_fusion,
)
from nclt_slam_tpu.fusion.relay import T_FLU_FROM_CAM

CFG = DEFAULT

# camera-convention SLAM pose for a robot at FLU pose (x, y, yaw):
# ORB-SLAM3's world frame is the first camera frame (camera axes), so the
# camera pose in the SLAM world is the conjugation
# T_slam = FLU_FROM_CAM^-1 @ T_nav @ FLU_FROM_CAM  (identity at startup).
_FLU_FROM_CAM = np.asarray(T_FLU_FROM_CAM)
_T_CAM_FROM_FLU = np.linalg.inv(_FLU_FROM_CAM)


def slam_pose_for(x, y, yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    T_nav = np.array([[c, -s, 0, x], [s, c, 0, y], [0, 0, 1, 0], [0, 0, 0, 1]])
    T_slam = _T_CAM_FROM_FLU @ T_nav @ _FLU_FROM_CAM
    from scipy.spatial.transform import Rotation
    q = Rotation.from_matrix(T_slam[:3, :3]).as_quat()
    return jnp.asarray(T_slam[:3, 3], jnp.float32), jnp.asarray(q, jnp.float32)


# parity tests run against the reference's absolute-compass encoder model
# (compass_drift=0); the campaign default is the degraded rate-gyro model
import dataclasses as _dc

_ENC_ABS = _dc.replace(CFG.encoder, compass_drift=0.0)
_tick = jax.jit(lambda st, gx, gy, gyaw, t, q, ok, tk, k: fusion_tick(
    st, gx, gy, gyaw, t, q, ok, tk, k, _ENC_ABS, CFG.fusion))


def run_track(xs, ys, yaws, slam_ok=True, anchors=None, seed=0):
    """Drive the relay along a trajectory with perfect SLAM; returns trace."""
    st = init_fusion(CFG.fusion)
    key = jax.random.PRNGKey(seed)
    out = []
    for i, (x, y, yaw) in enumerate(zip(xs, ys, yaws)):
        if anchors and i in anchors:
            ax, ay, std = anchors[i]
            st = anchor_update(st, jnp.array([ax, ay]), jnp.float32(std),
                               jnp.int32(i), CFG.fusion)
        t, q = slam_pose_for(x, y, yaw)
        key, k = jax.random.split(key)
        ok = jnp.array(slam_ok if np.isscalar(slam_ok) else slam_ok[i])
        st, nx, ny, nyaw, regime = _tick(
            st, jnp.float32(x), jnp.float32(y), jnp.float32(yaw), t, q, ok,
            jnp.int32(i), k)
        out.append((float(nx), float(ny), float(nyaw), int(regime)))
    return st, np.asarray(out)


def stationary_then_straight(n_still=60, n_move=100, v=0.05):
    xs = [0.0] * n_still + [v * i for i in range(n_move)]
    ys = [0.0] * (n_still + n_move)
    yaws = [0.0] * (n_still + n_move)
    return xs, ys, yaws


def test_alignment_commits_and_tracks():
    xs, ys, yaws = stationary_then_straight()
    st, out = run_track(xs, ys, yaws)
    assert bool(st.committed)          # 50-sample window filled while still
    # after commit, nav should track GT closely (perfect SLAM, no anchors)
    err = np.hypot(out[80:, 0] - np.asarray(xs)[80:],
                   out[80:, 1] - np.asarray(ys)[80:])
    assert err.max() < 0.5, err.max()
    assert (out[80:, 3] == REGIME_NO_ANCHOR).all()


def test_regimes_with_anchors():
    xs, ys, yaws = stationary_then_straight()
    n = len(xs)
    # strong anchors (std 0.05) arriving repeatedly near the end
    anchors = {i: (xs[i], 0.0, 0.05) for i in range(n - 20, n, 2)}
    st, out = run_track(xs, ys, yaws, anchors=anchors)
    # hysteresis: first anchor tick can be 'ok', then 'strong'
    tail = out[-6:, 3]
    assert (tail == REGIME_STRONG).any()
    # a stale-only anchor (arrived long ago) → no_anchor
    anchors2 = {70: (3.0, 0.0, 0.05)}
    st2, out2 = run_track(xs, ys, yaws, anchors=anchors2)
    assert out2[-1, 3] == REGIME_NO_ANCHOR


def test_ok_regime_weights():
    """With a fresh ok-grade anchor the blend must be 0.20/0.75/0.05."""
    xs, ys, yaws = stationary_then_straight()
    n = len(xs)
    ax = 99.0  # deliberately wrong anchor so its weight is visible
    anchors = {n - 2: (ax, 0.0, 0.15)}       # ok-grade (0.1 < std <= 0.2)
    st, out = run_track(xs, ys, yaws, anchors=anchors)
    assert out[-1, 3] == REGIME_OK
    gt_x = xs[-1]
    enc_x = float(st.enc_xy[0])
    # jump rejection would clamp — reconstruct expectation from regime math
    expected = 0.20 * ax + 0.75 * gt_x + 0.05 * enc_x
    # the jump gate replaces it with the encoder value if |Δ| > 0.5 m: with
    # a 99 m anchor the blend jumps → encoder fallback is the correct output
    assert abs(out[-1, 0] - enc_x) < 1.0 or abs(out[-1, 0] - expected) < 1.0


def test_freeze_falls_back_to_encoder():
    n_still, n_move = 60, 120
    # 0.12 m/tick so per-tick GT displacement clears the 0.1 m freeze gate
    xs = [0.0] * n_still + [0.12 * i for i in range(n_move)]
    ys = [0.0] * (n_still + n_move)
    yaws = [0.0] * (n_still + n_move)
    st = init_fusion(CFG.fusion)
    key = jax.random.PRNGKey(3)
    frozen_t, frozen_q = slam_pose_for(0.0, 0.0, 0.0)
    regimes = []
    for i, (x, y, yaw) in enumerate(zip(xs, ys, yaws)):
        # SLAM output freezes at the origin once the robot starts moving
        if i < n_still:
            t, q = slam_pose_for(x, y, yaw)
        else:
            t, q = frozen_t, frozen_q
        key, k = jax.random.split(key)
        st, nx, ny, nyaw, regime = _tick(
            st, jnp.float32(x), jnp.float32(y), jnp.float32(yaw), t, q,
            jnp.array(True), jnp.int32(i), k)
        regimes.append(int(regime))
    # after freeze_ticks of frozen SLAM, the relay must drop to encoder
    assert REGIME_ENCODER in regimes[n_still + CFG.fusion.freeze_ticks:]
    # and the final nav pose should track the encoder, not the frozen SLAM
    assert abs(float(st.enc_xy[0]) - float(nx)) < 1e-3


def test_encoder_drift_is_bounded():
    """Encoder-only DR over 100 m should drift but stay same-ballpark
    (reference uses it as a fallback good for tens of meters)."""
    n = 1000
    xs = [0.1 * i for i in range(n)]
    ys = [0.0] * n
    yaws = [0.0] * n
    st, out = run_track(xs, ys, yaws, slam_ok=False)
    assert (out[:, 3] == REGIME_ENCODER).all()
    err = np.hypot(out[-1, 0] - xs[-1], out[-1, 1] - ys[-1])
    assert err < 10.0  # 10 % of 100 m worst case


def test_degraded_compass_drifts():
    """compass_drift > 0 random-walks the heading source: encoder-only
    localization degrades with distance (the round-2 ablation knob)."""
    import dataclasses

    enc_bad = dataclasses.replace(CFG.encoder, compass_drift=0.02)
    tick_bad = jax.jit(lambda st, gx, gy, gyaw, t, q, ok, tk, k: fusion_tick(
        st, gx, gy, gyaw, t, q, ok, tk, k, enc_bad, CFG.fusion))
    st = init_fusion(CFG.fusion)
    key = jax.random.PRNGKey(9)
    n = 1500
    err_end = None
    for i in range(n):
        x = 0.1 * i
        t, q = slam_pose_for(x, 0.0, 0.0)
        key, k = jax.random.split(key)
        st, nx, ny, nyaw, reg = tick_bad(
            st, jnp.float32(x), jnp.float32(0.0), jnp.float32(0.0), t, q,
            jnp.array(False), jnp.int32(i), k)
    err_bad = np.hypot(float(nx) - 0.1 * (n - 1), float(ny))
    # the good (absolute-compass) encoder on the same drive
    st2 = init_fusion(CFG.fusion)
    key = jax.random.PRNGKey(9)
    for i in range(n):
        x = 0.1 * i
        t, q = slam_pose_for(x, 0.0, 0.0)
        key, k = jax.random.split(key)
        st2, nx2, ny2, _, _ = _tick(
            st2, jnp.float32(x), jnp.float32(0.0), jnp.float32(0.0), t, q,
            jnp.array(False), jnp.int32(i), k)
    err_good = np.hypot(float(nx2) - 0.1 * (n - 1), float(ny2))
    assert err_bad > 3 * err_good + 1.0, (err_bad, err_good)


def test_driving_from_tick0_never_commits_and_publishes_gt():
    """The alignment window needs < align_max_gt_disp of GT motion over 50
    samples; a robot that drives from tick 0 restarts it forever, and the
    pre-commit per-tick fallback publishes GT VERBATIM — the failure mode
    that silently hid all VIO drift from the fused output until the repeat
    rollout gained its stack bring-up hold (rollout/repeat.py)."""
    n = 200
    xs = [0.3 * i * 0.1 for i in range(n)]       # 0.3 m/s from the start
    ys = [0.0] * n
    yaws = [0.0] * n
    st, out = run_track(xs, ys, yaws)
    assert not bool(st.committed)
    # fallback output == GT up to float32 matrix roundtrip (the silent-GT
    # hazard this documents: no honest VIO channel is that accurate)
    err = np.hypot(out[:, 0] - np.asarray(xs), out[:, 1] - np.asarray(ys))
    assert err.max() < 0.02, err.max()
