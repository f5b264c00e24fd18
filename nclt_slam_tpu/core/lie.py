"""SE(2)/SE(3) group operations as pure array functions.

The reference stack passes poses around as ROS TF frames and 4x4 numpy
matrices (e.g. tf_wall_clock_relay_v55.py:345-467 builds T_nav_slam as a 4x4
and composes per tick).  Here every pose is a plain jnp array so the whole TF
tree collapses into explicit composition inside one jitted program.

Conventions:
- SE(2) pose = array ``[x, y, theta]``.
- SE(3) pose = 4x4 homogeneous matrix (row-major, acts on column vectors).
- All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def wrap_angle(theta):
    """Wrap angle(s) to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


# ---------------------------------------------------------------------------
# SE(2)
# ---------------------------------------------------------------------------

def se2_from_xytheta(x, y, theta):
    return jnp.stack(
        jnp.broadcast_arrays(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32),
            jnp.asarray(theta, jnp.float32),
        ),
        axis=-1,
    )


def se2_compose(a, b):
    """a ∘ b: first apply b, then a (frame composition T_a @ T_b)."""
    ax, ay, at = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bt = b[..., 0], b[..., 1], b[..., 2]
    c, s = jnp.cos(at), jnp.sin(at)
    return jnp.stack(
        [ax + c * bx - s * by, ay + s * bx + c * by, wrap_angle(at + bt)],
        axis=-1,
    )


def se2_inverse(a):
    ax, ay, at = a[..., 0], a[..., 1], a[..., 2]
    c, s = jnp.cos(at), jnp.sin(at)
    return jnp.stack(
        [-(c * ax + s * ay), -(-s * ax + c * ay), wrap_angle(-at)], axis=-1
    )


def se2_apply(a, pts):
    """Apply SE(2) pose ``a`` to point(s) ``pts`` of shape (..., 2)."""
    at = a[..., 2]
    c, s = jnp.cos(at), jnp.sin(at)
    px, py = pts[..., 0], pts[..., 1]
    return jnp.stack(
        [a[..., 0] + c * px - s * py, a[..., 1] + s * px + c * py], axis=-1
    )


# ---------------------------------------------------------------------------
# SE(3) as 4x4 homogeneous matrices
# ---------------------------------------------------------------------------

def se3_from_rt(R, t):
    """Build 4x4 from rotation (...,3,3) and translation (...,3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_compose(a, b):
    return jnp.matmul(a, b)


def se3_inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    return se3_from_rt(Rt, ti)


def se3_apply(T, pts):
    """Apply 4x4 transform(s) to points of shape (..., 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", R, pts) + t
