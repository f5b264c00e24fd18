"""IMU utilities (datasets/nclt_kaggle/src/utils/imu_utils.py:26-297):
parsing, interpolation, bias estimation, gravity alignment, gyro
integration, and discrete preintegration (the numpy loops become one
``lax.scan`` reusing nclt_slam_tpu.vio.preintegration)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

US_TO_S = 1e-6


def parse_ms25(stream_data: np.ndarray):
    """ms25 data columns (mag 3, accel 3, gyro 3) -> (mag, accel, gyro)."""
    return stream_data[:, 0:3], stream_data[:, 3:6], stream_data[:, 6:9]


def interpolate_imu(t_us_target, t_us_src, accel, gyro):
    """Linear interpolation of IMU samples onto target timestamps."""
    t, ts = t_us_target.astype(np.float64), t_us_src.astype(np.float64)
    a = np.stack([np.interp(t, ts, accel[:, i]) for i in range(3)], -1)
    g = np.stack([np.interp(t, ts, gyro[:, i]) for i in range(3)], -1)
    return a, g


def estimate_biases(accel, gyro, still_mask=None, gravity: float = 9.80665):
    """Static bias estimation: mean gyro is the gyro bias; accel bias is the
    mean residual after removing the best-fit gravity direction."""
    if still_mask is None:
        still_mask = np.ones(len(accel), bool)
    g_bias = gyro[still_mask].mean(0)
    a_mean = accel[still_mask].mean(0)
    g_dir = a_mean / np.linalg.norm(a_mean)
    a_bias = a_mean - g_dir * gravity
    return a_bias, g_bias


def gravity_align_rotation(accel_mean, gravity_world=(0.0, 0.0, 1.0)):
    """Rotation taking the measured gravity direction onto +z (or the given
    world gravity direction)."""
    a = np.asarray(accel_mean, np.float64)
    a = a / np.linalg.norm(a)
    b = np.asarray(gravity_world, np.float64)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if np.linalg.norm(v) < 1e-9:
        return np.eye(3) if c > 0 else -np.eye(3)
    K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + K + K @ K * (1.0 / (1.0 + c))


def integrate_gyro(t_us, gyro):
    """Orientation-only integration (rodrigues chain) -> (N, 3, 3)."""
    import jax

    from nclt_slam_tpu.core.quat import quat_mul, quat_to_mat, so3_exp

    dt = jnp.diff(jnp.asarray(t_us, jnp.float64)).astype(jnp.float32) * US_TO_S
    w = jnp.asarray(gyro[:-1], jnp.float32)

    def step(q, inp):
        wi, dti = inp
        q2 = quat_mul(q, so3_exp(wi * dti))
        return q2 / jnp.linalg.norm(q2), q2

    q0 = jnp.array([0.0, 0.0, 0.0, 1.0])
    _, qs = jax.lax.scan(step, q0, (w, dt))
    qs = jnp.concatenate([q0[None], qs], 0)
    return np.asarray(quat_to_mat(qs))


def imu_preintegration(t_us, accel, gyro, gravity=(0.0, 0.0, -9.81)):
    """Discrete preintegration -> dict(positions, velocities, orientations)
    with the reference's return signature (imu_utils.py:243-297), running as
    one scan via nclt_slam_tpu.vio.preintegration."""
    import jax

    from nclt_slam_tpu.core.quat import quat_mul, quat_rotate, quat_to_mat, so3_exp

    g = jnp.asarray(gravity, jnp.float32)
    dt = jnp.diff(jnp.asarray(t_us, jnp.float64)).astype(jnp.float32) * US_TO_S
    a = jnp.asarray(accel[:-1], jnp.float32)
    w = jnp.asarray(gyro[:-1], jnp.float32)

    def step(carry, inp):
        p, v, q = carry
        ai, wi, dti = inp
        a_world = quat_rotate(q, ai) + g
        q2 = quat_mul(q, so3_exp(wi * dti))
        q2 = q2 / jnp.linalg.norm(q2)
        v2 = v + a_world * dti
        p2 = p + v * dti + 0.5 * a_world * dti * dti
        return (p2, v2, q2), (p2, v2, q2)

    init = (jnp.zeros(3), jnp.zeros(3), jnp.array([0.0, 0.0, 0.0, 1.0]))
    _, (ps, vs, qs) = jax.lax.scan(step, init, (a, w, dt))
    ps = jnp.concatenate([jnp.zeros((1, 3)), ps], 0)
    vs = jnp.concatenate([jnp.zeros((1, 3)), vs], 0)
    qs = jnp.concatenate([init[2][None], qs], 0)
    return {
        "positions": np.asarray(ps),
        "velocities": np.asarray(vs),
        "orientations": np.asarray(quat_to_mat(qs)),
    }
