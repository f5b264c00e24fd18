"""INS->IMU synthesis + EuRoC round trip (synthesize_imu.py port).

Analytic oracle: a body driving a circle at constant speed has known gyro
(wz = omega) and body accel (centripetal, +gravity reaction), so the
differentiation chain can be checked exactly."""

import numpy as np

from nclt_slam_tpu.io.euroc import export_euroc
from nclt_slam_tpu.io.ins_imu import (
    GRAVITY,
    load_euroc_session,
    synthesize_imu_from_ins,
)


def circle_ins(rate_hz=100.0, dur=20.0, radius=10.0, speed=2.0):
    """INS stream for a circular drive in the NED horizontal plane."""
    t = np.arange(0, dur, 1.0 / rate_hz)
    omega = speed / radius
    yaw = omega * t                      # heading tangent to the circle
    vel_n = speed * np.cos(yaw)
    vel_e = speed * np.sin(yaw)
    vel = np.stack([vel_n, vel_e, np.zeros_like(t)], -1)
    rpy = np.stack([np.zeros_like(t), np.zeros_like(t), yaw], -1)
    return t, vel, rpy, omega


def test_circle_gyro_and_centripetal():
    t, vel, rpy, omega = circle_ins()
    t_mid, gyro, accel = synthesize_imu_from_ins(t, vel, rpy)
    # steady state away from the filter edges
    sl = slice(50, -50)
    assert np.allclose(gyro[sl, 2], omega, atol=1e-3)
    assert np.allclose(gyro[sl, :2], 0.0, atol=1e-3)
    # centripetal accel v*omega points to body +y (left turn in NED),
    # gravity reaction appears as -g on body z (NED z is down)
    a_c = 2.0 * omega
    assert np.allclose(accel[sl, 1], a_c, atol=0.02), accel[sl, 1].mean()
    assert np.allclose(accel[sl, 2], -GRAVITY, atol=0.02)
    assert np.allclose(accel[sl, 0], 0.0, atol=0.02)


def test_standstill_reads_gravity_only():
    t = np.arange(0, 5, 0.01)
    vel = np.zeros((len(t), 3))
    rpy = np.zeros((len(t), 3))
    _, gyro, accel = synthesize_imu_from_ins(t, vel, rpy)
    assert np.allclose(gyro, 0.0, atol=1e-9)
    assert np.allclose(accel[:, 2], -GRAVITY, atol=1e-9)


def test_pitched_standstill_projects_gravity():
    """30 deg nose-down pitch: gravity splits between body x and z."""
    t = np.arange(0, 5, 0.01)
    vel = np.zeros((len(t), 3))
    pitch = np.deg2rad(-30.0)
    rpy = np.tile([0.0, pitch, 0.0], (len(t), 1))
    _, _, accel = synthesize_imu_from_ins(t, vel, rpy)
    # at rest the accelerometer reads the upward reaction (-g_NED) projected
    # on the body axes: nose-down pitch puts body-x below the horizon, so
    # a_x = g*sin(pitch) < 0 for pitch < 0
    sl = slice(20, -20)
    assert np.allclose(accel[sl, 0], GRAVITY * np.sin(pitch), atol=1e-6)
    assert np.allclose(accel[sl, 2], -GRAVITY * np.cos(pitch), atol=1e-6)


def test_euroc_roundtrip_with_synth_imu(tmp_path):
    """Export a session with a synthesized IMU, read it back via the
    importer, and check stream integrity (the conversion direction the
    reference never closed)."""
    t, vel, rpy, omega = circle_ins(dur=5.0)
    t_mid, gyro, accel = synthesize_imu_from_ins(t, vel, rpy)
    # GT pose stream: positions on the circle
    radius, speed = 10.0, 2.0
    yaw = omega * t
    xyz = np.stack([radius * np.sin(yaw), radius * (1 - np.cos(yaw)),
                    np.zeros_like(t)], -1)
    quat = np.stack([np.zeros_like(yaw), np.zeros_like(yaw),
                     np.sin(yaw / 2), np.cos(yaw / 2)], -1)
    root = export_euroc(tmp_path / "sess", t, xyz, quat,
                        imu_t_s=t_mid, imu_gyro=gyro, imu_accel=accel)
    sess = load_euroc_session(root)
    assert np.allclose(sess["t_gt"], t, atol=1e-6)
    assert np.allclose(sess["xyz"], xyz, atol=1e-5)
    assert np.allclose(sess["quat_xyzw"], quat, atol=1e-5)
    assert np.allclose(sess["gyro"], gyro, atol=1e-5)
    assert np.allclose(sess["accel"], accel, atol=1e-5)
    assert sess["t_cam"] is not None and len(sess["t_cam"]) == len(t)


def test_imported_imu_preintegrates_to_gt(tmp_path):
    """Close the loop into OUR protocol: preintegrate the imported pseudo-
    IMU and compare against the GT displacement (FLU frame; the circle is
    flat so NED->FLU only flips y/z signs)."""
    import jax.numpy as jnp

    from nclt_slam_tpu.vio import empty_preint, integrate_block, propagate

    t, vel, rpy, omega = circle_ins(rate_hz=200.0, dur=2.0)
    t_mid, gyro, accel = synthesize_imu_from_ins(t, vel, rpy)
    # NED (x fwd, y right, z down) -> FLU (x fwd, y left, z up)
    flip = np.array([1.0, -1.0, -1.0])
    gyro_flu = gyro * flip
    accel_flu = accel * flip
    sl = slice(50, len(t_mid) - 50)     # clean interior window
    dt = float(np.mean(np.diff(t_mid)))
    pre = integrate_block(empty_preint(), jnp.asarray(accel_flu[sl]),
                          jnp.asarray(gyro_flu[sl]), dt)
    # FLU world = (north, west, up): y flips sign vs NED east, heading
    # angle flips sign.  Circle in FLU: p = (r sin(yaw), -r(1-cos(yaw)))
    # with FLU heading -yaw.
    def flu_state(tm):
        yw = omega * tm
        p = np.array([10.0 * np.sin(yw), -10.0 * (1 - np.cos(yw)), 0.0])
        v = np.array([2.0 * np.cos(yw), -2.0 * np.sin(yw), 0.0])
        q = np.array([0.0, 0.0, np.sin(-yw / 2), np.cos(-yw / 2)])
        return p, v, q

    p0, v0, q0 = flu_state(t_mid[sl.start])
    pos, _, _ = propagate(jnp.asarray(p0), jnp.asarray(v0), jnp.asarray(q0),
                          pre, jnp.array([0.0, 0.0, -9.81007]))
    p1, _, _ = flu_state(t_mid[sl.stop])
    err = np.linalg.norm(np.asarray(pos) - p1)
    assert err < 0.15, (np.asarray(pos), p1)
