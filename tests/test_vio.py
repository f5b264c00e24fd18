"""VIO: preintegration math + tracking accuracy on a simulated drive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nclt_slam_tpu.config import DEFAULT
from nclt_slam_tpu.core.quat import quat_from_yaw, quat_rotate, quat_to_yaw
from nclt_slam_tpu.dynamics import init_robot, nav_substeps, robot_pose3d
from nclt_slam_tpu.fusion.relay import T_FLU_FROM_CAM
from nclt_slam_tpu.sensors import imu_block, init_imu
from nclt_slam_tpu.sensors.features import build_scene_features, observe
from nclt_slam_tpu.vio import (
    emit_slam_pose,
    empty_preint,
    init_vio,
    integrate_block,
    propagate,
    vio_frame,
)

CFG = DEFAULT
GRAVITY = jnp.array([0.0, 0.0, -9.81])


def test_preintegration_constant_accel():
    """Body accelerating at 1 m/s² along x from rest, no rotation: after 1 s
    p = 0.5 m, v = 1 m/s."""
    S = 200
    dt = 1.0 / 200.0
    accel = jnp.tile(jnp.array([1.0, 0.0, 9.81]), (S, 1))  # specific force
    gyro = jnp.zeros((S, 3))
    pre = integrate_block(empty_preint(), accel, gyro, dt)
    pos, vel, q = propagate(jnp.zeros(3), jnp.zeros(3),
                            jnp.array([0.0, 0.0, 0.0, 1.0]), pre, GRAVITY)
    assert abs(float(pre.dt) - 1.0) < 1e-5
    assert abs(float(pos[0]) - 0.5) < 0.01
    assert abs(float(vel[0]) - 1.0) < 0.01
    assert abs(float(pos[2])) < 0.01          # gravity cancels
    assert abs(float(quat_to_yaw(q))) < 1e-5


def test_preintegration_rotation():
    """Pure yaw at 0.5 rad/s for 2 s -> 1 rad."""
    S = 400
    dt = 1.0 / 200.0
    accel = jnp.tile(jnp.array([0.0, 0.0, 9.81]), (S, 1))
    gyro = jnp.tile(jnp.array([0.0, 0.0, 0.5]), (S, 1))
    pre = integrate_block(empty_preint(), accel, gyro, dt)
    _, _, q = propagate(jnp.zeros(3), jnp.zeros(3),
                        jnp.array([0.0, 0.0, 0.0, 1.0]), pre, GRAVITY)
    assert abs(float(quat_to_yaw(q)) - 1.0) < 1e-3


@pytest.fixture(scope="module")
def vio_drive():
    """Drive the real dynamics+IMU through a feature-rich strip and run VIO."""
    rng = np.random.RandomState(2)
    N = 48
    # forest block around the path so features stay in view under steering
    oxy = np.zeros((N, 2), np.float32)
    for i in range(N):
        while True:
            x, y = rng.uniform(-5, 60), rng.uniform(-8, 8)
            if abs(y) > 1.5:
                break
        oxy[i] = (x, y)
    orr = np.full(N, 0.5, np.float32)
    oh = np.full(N, 6.0, np.float32)
    from nclt_slam_tpu.scene.terrain import terrain_height
    obz = np.asarray(terrain_height(oxy[:, 0], oxy[:, 1]))
    ovalid = np.ones(N, bool)
    feats = build_scene_features(oxy, orr, obz, oh, ovalid, CFG.landmarks)

    step = jax.jit(lambda s, v, w, k: nav_substeps(
        s, v, w, jnp.asarray(oxy), jnp.asarray(orr), jnp.asarray(ovalid), k,
        CFG.sim))
    iblk = jax.jit(lambda s, p, q, k: imu_block(s, p, q, 1 / 200.0, k, CFG.imu))
    vstep = jax.jit(lambda st, o, m: vio_frame(
        st, o, m, 0.1, GRAVITY, CFG.camera, CFG.vio, True)[:2])

    robot = init_robot(0.0, 0.0, 0.0)
    imu = init_imu(jax.random.PRNGKey(0), CFG.imu)
    vio = init_vio(CFG.landmarks.desc_words)
    key = jax.random.PRNGKey(1)

    gt, est, tracked = [], [], []
    for t in range(250):  # 25 s, ~16 m at ramping speed
        key, k1, k2, k3 = jax.random.split(key, 4)
        v_cmd = jnp.float32(min(0.8, 0.1 * t))
        # fast sine so the heading integral stays bounded (~0.15 rad swing)
        w_cmd = jnp.float32(0.25 * np.sin(t * 0.2))
        robot, (pos_tr, quat_tr) = step(robot, v_cmd, w_cmd, k1)
        imu, meas = iblk(imu, pos_tr, quat_tr, k2)
        pos3, q3 = robot_pose3d(robot)
        obs = observe(pos3, robot.yaw, feats, jnp.asarray(ovalid), k3,
                      CFG.camera, CFG.landmarks)
        vio, ok = vstep(vio, obs, meas)
        gt.append(np.array([*np.asarray(robot.xy), float(robot.yaw)]))
        est.append(np.array([*np.asarray(vio.pos[:2]), float(quat_to_yaw(vio.q))]))
        tracked.append(int(vio.n_tracked))
    return np.asarray(gt), np.asarray(est), np.asarray(tracked), vio


def test_vio_tracks_trajectory(vio_drive):
    gt, est, tracked, vio = vio_drive
    # tracking healthy after warmup
    assert (tracked[20:] > 15).mean() > 0.9, tracked[:40]
    path_len = np.hypot(*np.diff(gt[:, :2], axis=0).T).sum()
    err = np.hypot(*(est[:, :2] - gt[:, :2]).T)
    # final drift under 5% of path length (reference VIO best-case is
    # ~0.1 m over 150 m; ours is allowed to be sloppier at this stage)
    assert err[-1] < 0.05 * path_len + 0.5, (err[-1], path_len)
    assert err.max() < 0.1 * path_len + 1.0


def test_vio_emit_slam_convention(vio_drive):
    gt, est, tracked, vio = vio_drive
    t, q = emit_slam_pose(vio, CFG.camera)
    # converting back through the FLU<->cam conjugation recovers the
    # body pose (up to the camera lever arm handled inside)
    from nclt_slam_tpu.core.quat import quat_to_mat
    T_slam = np.eye(4)
    T_slam[:3, :3] = np.asarray(quat_to_mat(q))
    T_slam[:3, 3] = np.asarray(t)
    F = np.asarray(T_FLU_FROM_CAM)
    T_nav = F @ T_slam @ np.linalg.inv(F)
    cam_world = np.asarray(vio.pos) + np.asarray(
        quat_rotate(vio.q, jnp.array([CFG.camera.cam_offset_fwd, 0.0,
                                      CFG.camera.cam_offset_up])))
    assert np.allclose(T_nav[:3, 3], cam_world, atol=1e-4)


def test_backend_events_fire_under_stress_only():
    """The world-registration model (VioConfig snap_*): tracking stress
    triggers backend events that snap the emitted registration; a keyless
    call (unit-test / deterministic mode) keeps the registration frozen."""
    import dataclasses

    from nclt_slam_tpu.sensors.features import Observation
    from nclt_slam_tpu.vio.tracker import emit_body_pos

    vcfg = dataclasses.replace(
        CFG.vio, snap_p_stressed=1.0, snap_stress_min=2,
        snap_frac=0.5, snap_cap_m=2.0, scale_jump_std=0.02,
        # production stress is rotation-only (+ reloc); opt into the
        # match-starvation term here so featureless frames count as stress
        snap_stress_match_n=8)
    K = CFG.landmarks.max_obs_features
    W = CFG.landmarks.desc_words
    # featureless frames = maximal tracking stress (n_match == 0)
    empty = Observation(
        uv=jnp.zeros((K, 2)), p3d_cam=jnp.ones((K, 3)),
        desc=jnp.zeros((K, W), jnp.uint32),
        feat_id=jnp.zeros(K, jnp.int32), valid=jnp.zeros(K, bool))
    meas = jnp.tile(jnp.array([0.0, 0.0, 9.81, 0.0, 0.0, 0.0]), (20, 1))

    vio = init_vio(W, CFG.vio.window_kf)
    # seed some travel so the snap std (frac x dist) is nonzero even
    # without tracked motion
    vio = vio._replace(dist_since_event=jnp.float32(20.0))

    key = jax.random.PRNGKey(0)
    fired = 0
    for t in range(6):
        key, k = jax.random.split(key)
        vio, ok, aux = vio_frame(vio, empty, meas, 0.1, GRAVITY, CFG.camera,
                                 vcfg, True, key=k)
        fired += int(aux.flags) >> 5 & 1
    assert fired >= 1, "stressed frames with p=1 must fire backend events"
    off = np.asarray(vio.emit_off)
    assert np.linalg.norm(off[:2]) > 0.0
    # emitted pose goes through the registration
    emitted = np.asarray(emit_body_pos(vio))
    raw = np.asarray(vio.pos)
    assert not np.allclose(emitted, raw)

    # keyless: registration frozen even under identical stress
    vio2 = init_vio(W, CFG.vio.window_kf)
    vio2 = vio2._replace(dist_since_event=jnp.float32(20.0))
    for t in range(6):
        vio2, ok, aux = vio_frame(vio2, empty, meas, 0.1, GRAVITY,
                                  CFG.camera, vcfg, True)
        assert (int(aux.flags) >> 5 & 1) == 0
    assert float(vio2.emit_scale) == 1.0
    assert np.allclose(np.asarray(vio2.emit_off), 0.0)


def test_backend_events_quiet_when_healthy(vio_drive):
    """A healthy, feature-rich drive must stay essentially event-free even
    WITH a key (stress gating) — the reference's teach drift band shows
    ORB-SLAM3 running nearly snap-free under the smooth teach chase."""
    gt, est, tracked, vio = vio_drive
    # the fixture ran keyless; verify its match counts would never arm the
    # stress gate under the default config
    armed = (np.asarray(tracked[20:]) < CFG.vio.snap_stress_match_n)
    assert armed.mean() < 0.1, armed.mean()
