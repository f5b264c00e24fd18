"""IMU preintegration as a scanned state machine.

The closest in-repo reference analog is
datasets/nclt_kaggle/src/utils/imu_utils.py:243-297 (discrete preintegration
with Rodrigues updates); ORB-SLAM3 runs the same math inside TrackRGBD's
IMU::Preintegrated.  Here the integration is a pure ``lax.scan`` over the
200 Hz sample block between vision frames, accumulating the frame-relative
deltas (ΔR as a quaternion, Δv, Δp) that the VIO propagation and the
sliding-window BA's inertial factors consume.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nclt_slam_tpu.core.quat import quat_mul, quat_rotate, so3_exp


class Preintegrated(NamedTuple):
    dq: jax.Array     # (4,) ΔR as quaternion (frame i -> current)
    dv: jax.Array     # (3,) Δ velocity in frame i coords (gravity-free)
    dp: jax.Array     # (3,) Δ position in frame i coords (gravity-free)
    dt: jax.Array     # () total time


def empty_preint() -> Preintegrated:
    return Preintegrated(
        dq=jnp.array([0.0, 0.0, 0.0, 1.0]),
        dv=jnp.zeros(3), dp=jnp.zeros(3), dt=jnp.float32(0.0))


def integrate_block(pre: Preintegrated, accel, gyro, dt, bias_acc=None,
                    bias_gyro=None) -> Preintegrated:
    """Integrate a block of IMU samples.  accel, gyro: (S, 3); dt scalar per
    sample.  Measurements are specific force (include gravity) — gravity is
    re-added at propagation time, so the deltas here integrate the raw
    measurements like the reference implementation."""
    if bias_acc is None:
        bias_acc = jnp.zeros(3)
    if bias_gyro is None:
        bias_gyro = jnp.zeros(3)

    def step(p, sample):
        a, w = sample
        a = a - bias_acc
        w = w - bias_gyro
        # rotate measurement into frame-i coords with current ΔR
        a_i = quat_rotate(p.dq, a)
        dp = p.dp + p.dv * dt + 0.5 * a_i * dt * dt
        dv = p.dv + a_i * dt
        dq = quat_mul(p.dq, so3_exp(w * dt))
        dq = dq / jnp.linalg.norm(dq)
        return Preintegrated(dq=dq, dv=dv, dp=dp, dt=p.dt + dt), None

    out, _ = jax.lax.scan(step, pre, (accel, gyro))
    return out


def propagate(pos_i, vel_i, q_i, pre: Preintegrated, gravity):
    """World-frame state propagation using a preintegrated delta.

    q_i: world_from_body quaternion at frame i.  gravity: (3,) world
    acceleration of free fall, e.g. [0, 0, -9.81] (the accelerometer
    measures specific force = a_world - g, so a_world = R·a_meas + g)."""
    dp_w = quat_rotate(q_i, pre.dp)
    dv_w = quat_rotate(q_i, pre.dv)
    pos_j = pos_i + vel_i * pre.dt + 0.5 * gravity * pre.dt ** 2 + dp_w
    vel_j = vel_i + gravity * pre.dt + dv_w
    q_j = quat_mul(q_i, pre.dq)
    return pos_j, vel_j, q_j / jnp.linalg.norm(q_j)
