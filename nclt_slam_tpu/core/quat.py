"""Quaternion / SO(3) math (xyzw convention, matching scipy + ROS).

The reference leans on ``scipy.spatial.transform.Rotation`` everywhere
(run_husky_forest.py:799-860 synthetic IMU, tf_wall_clock_relay_v55.py
SE(3)->SE(2) alignment).  These are the jnp equivalents, broadcastable and
differentiable so they can live inside scanned/jitted rollout steps.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def quat_from_yaw(yaw):
    """Quaternion [x,y,z,w] for a pure z-rotation."""
    half = 0.5 * jnp.asarray(yaw, jnp.float32)
    z = jnp.sin(half)
    w = jnp.cos(half)
    zero = jnp.zeros_like(z)
    return jnp.stack([zero, zero, z, w], axis=-1)


def quat_from_axis_angle(axis, angle):
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + _EPS)
    half = 0.5 * angle[..., None]
    return jnp.concatenate(
        [axis * jnp.sin(half), jnp.cos(half)], axis=-1
    )


def quat_mul(q1, q2):
    """Hamilton product, xyzw."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v (...,3) by quaternion(s) q (...,4)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_yaw(q):
    """Yaw extraction matching the reference's atan2(2(wz+xy), 1-2(y²+z²))
    (run_husky_forest.py, tf relay)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def quat_to_mat(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > _EPS, 2.0 / jnp.maximum(n, _EPS), 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    m = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(R):
    """Rotation matrix -> xyzw quaternion (branch-free Shepperd variant).

    Computes all four candidate constructions and selects the numerically
    best one with ``where`` so it is safe under vmap/jit.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component²
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    def safe_div(a, b):
        return a / jnp.where(jnp.abs(b) < _EPS, 1.0, b)

    sw = jnp.sqrt(qw2 + _EPS) * 2.0
    cand_w = jnp.stack(
        [safe_div(m21 - m12, sw), safe_div(m02 - m20, sw),
         safe_div(m10 - m01, sw), 0.25 * sw], axis=-1)
    sx = jnp.sqrt(qx2 + _EPS) * 2.0
    cand_x = jnp.stack(
        [0.25 * sx, safe_div(m01 + m10, sx),
         safe_div(m02 + m20, sx), safe_div(m21 - m12, sx)], axis=-1)
    sy = jnp.sqrt(qy2 + _EPS) * 2.0
    cand_y = jnp.stack(
        [safe_div(m01 + m10, sy), 0.25 * sy,
         safe_div(m12 + m21, sy), safe_div(m02 - m20, sy)], axis=-1)
    sz = jnp.sqrt(qz2 + _EPS) * 2.0
    cand_z = jnp.stack(
        [safe_div(m02 + m20, sz), safe_div(m12 + m21, sz),
         0.25 * sz, safe_div(m10 - m01, sz)], axis=-1)

    comps = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(comps, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    # Canonicalize sign (w >= 0) for stable averaging downstream.
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def so3_exp(rotvec):
    """Rotation vector -> quaternion (xyzw)."""
    angle = jnp.linalg.norm(rotvec, axis=-1)
    small = angle < 1e-8
    safe = jnp.where(small, 1.0, angle)
    axis = rotvec / safe[..., None]
    q = quat_from_axis_angle(axis, angle)
    ident = jnp.zeros_like(q).at[..., 3].set(1.0)
    # First-order fallback near zero: q ≈ [r/2, 1]
    approx = jnp.concatenate(
        [0.5 * rotvec, jnp.ones_like(angle)[..., None]], axis=-1)
    approx = approx / (jnp.linalg.norm(approx, axis=-1, keepdims=True) + _EPS)
    del ident
    return jnp.where(small[..., None], approx, q)


def so3_log(q):
    """Quaternion (xyzw) -> rotation vector."""
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    v = q[..., :3]
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    n = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(n, w)
    small = n < 1e-8
    scale = jnp.where(small, 2.0, angle / jnp.where(small, 1.0, n))
    return v * scale[..., None]
