"""v55 constant/branch audit, encoded as tests (docs/V55_AUDIT.md).

Each constant row pins a FusionConfig/EncoderConfig default to the value in
the reference tf_wall_clock_relay_v55.py; the branch tests drive fusion_tick
through the jump-rejection table (v55.py:40-41, 771-797).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nclt_slam_tpu.config import DEFAULT
from nclt_slam_tpu.fusion import fusion_tick, init_fusion
from tests.test_fusion import slam_pose_for, stationary_then_straight

CFG = DEFAULT

# (attr path, reference value, v55.py line)
V55_CONSTANTS = [
    ("encoder.dist_noise", 0.005, "161 ENCODER_NOISE"),
    ("encoder.compass_noise", 0.05, "491 COMPASS_NOISE"),
    ("fusion.anchor_stale_s", 3.0, "194 ANCHOR_STALE_S"),
    ("fusion.anchor_strong_std", 0.1, "195 ANCHOR_STRONG_STD"),
    ("fusion.anchor_ok_std", 0.2, "196 ANCHOR_OK_STD"),
    ("fusion.anchor_hysteresis_n", 2, "200 ANCHOR_HYSTERESIS_N"),
    ("fusion.strong_w_anchor", 0.40, "558"),
    ("fusion.strong_w_slam", 0.55, "558"),
    ("fusion.strong_w_enc", 0.05, "558"),
    ("fusion.ok_w_anchor", 0.20, "561"),
    ("fusion.ok_w_slam", 0.75, "561"),
    ("fusion.ok_w_enc", 0.05, "561"),
    ("fusion.noanchor_alpha_steps", (0.95, 0.70, 0.40, 0.10), "573-580"),
    ("fusion.noanchor_dist_steps", (2.0, 5.0, 10.0), "573-578"),
    ("fusion.noanchor_anchor_age_s", 10.0, "571"),
    ("fusion.jump_threshold_m", 0.5, "40 JUMP_THRESHOLD"),
    ("fusion.yaw_jump_threshold", 0.3, "41 YAW_JUMP_THRESHOLD"),
    ("fusion.freeze_ticks", 60, "525"),
    ("fusion.freeze_enc_min_disp", 0.1, "517"),
    ("fusion.freeze_slam_max_motion", 0.01, "517"),
    ("fusion.align_window", 50, "214 ALIGN_WINDOW_SAMPLES"),
    ("fusion.align_max_gt_disp", 0.15, "215 ALIGN_MAX_GT_DISP_M"),
    ("fusion.align_max_yaw_std_deg", 0.5, "216 ALIGN_MAX_YAW_STD_DEG"),
]


@pytest.mark.parametrize("path,ref,line", V55_CONSTANTS,
                         ids=[c[0] for c in V55_CONSTANTS])
def test_v55_constant(path, ref, line):
    obj = CFG
    for part in path.split("."):
        obj = getattr(obj, part)
    assert obj == ref, f"{path} != v55.py:{line} value {ref}"


# ---------------------------------------------------------------------------
# jump-rejection branch table (v55.py:771-797)
# ---------------------------------------------------------------------------

_ENC_ABS = dataclasses.replace(CFG.encoder, compass_drift=0.0)


def _drive(slam_offset_at, dpos=0.0, dyaw=0.0, fuse_slam_yaw=True):
    """Straight drive with perfect SLAM; from tick `slam_offset_at` on, the
    SLAM pose snaps by (dpos, dyaw) — a relocalization jump.  Returns the
    nav outputs of the tick right at the snap and the one before it."""
    fcfg = dataclasses.replace(CFG.fusion, fuse_slam_yaw=fuse_slam_yaw)
    tick = jax.jit(lambda st, gx, gy, gyaw, t, q, ok, tk, k: fusion_tick(
        st, gx, gy, gyaw, t, q, ok, tk, k, _ENC_ABS, fcfg))
    xs, ys, yaws = stationary_then_straight()
    st = init_fusion(fcfg)
    key = jax.random.PRNGKey(0)
    prev = out = None
    for i, (x, y, yaw) in enumerate(zip(xs, ys, yaws)):
        sx, syaw = (x, yaw)
        if i >= slam_offset_at:
            sx, syaw = x + dpos, yaw + dyaw
        t, q = slam_pose_for(sx, y, syaw)
        key, k = jax.random.split(key)
        st, nx, ny, nyaw, reg = tick(
            st, jnp.float32(x), jnp.float32(y), jnp.float32(yaw), t, q,
            jnp.array(True), jnp.int32(i), k)
        prev, out = out, (float(nx), float(ny), float(nyaw), int(reg))
    return st, prev, out, (xs[-1], ys[-1], yaws[-1])


def test_no_jump_tracks_slam():
    st, prev, out, gt = _drive(10 ** 9)
    assert bool(st.committed)
    assert abs(out[0] - gt[0]) < 0.3


def test_position_jump_rejected():
    """SLAM snaps 3 m sideways on the last tick → the relay must NOT follow
    (the no-jump blend would land ~2.8 m off; encoder fallback stays near GT)."""
    n = len(stationary_then_straight()[0])
    st, prev, out, gt = _drive(n - 1, dpos=3.0)
    assert abs(out[0] - gt[0]) < 1.0, f"jump not rejected: nav_x={out[0]}"


def test_small_delta_not_rejected():
    """A 0.2 m SLAM shift is below JUMP_THRESHOLD → blended normally."""
    n = len(stationary_then_straight()[0])
    st, prev, out, gt = _drive(n - 1, dpos=0.2)
    assert out[0] > gt[0] + 0.05, "sub-threshold delta wrongly rejected"


def test_yaw_jump_skips_slam_yaw():
    """SLAM yaw snaps 1 rad on the last tick → yaw correction skipped
    (encoder compass yaw ~ GT yaw, not the snapped SLAM yaw)."""
    n = len(stationary_then_straight()[0])
    st, prev, out, gt = _drive(n - 1, dyaw=1.0, fuse_slam_yaw=True)
    assert abs(out[2] - gt[2]) < 0.5, f"yaw jump followed: {out[2]}"


def test_small_yaw_delta_followed():
    n = len(stationary_then_straight()[0])
    st, prev, out, gt = _drive(n - 1, dyaw=0.1, fuse_slam_yaw=True)
    # below YAW_JUMP_THRESHOLD the SLAM yaw (gt+0.1) is taken
    assert abs(out[2] - (gt[2] + 0.1)) < 0.05
