"""Analytic forest terrain heightfield.

The reference scene's terrain is a closed-form multi-octave sine field with a
flattened S-curve road corridor (run_husky_forest.py:521-536 and
convert_gazebo_to_isaac.py:173-196 — the two must match, and ours matches
both).  Because it is analytic we never store a heightfield: the dynamics
step and the depth raycaster just evaluate ``terrain_height(x, y)`` — ideal
for TPU since every query is pure vectorized math with zero memory traffic.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Road centreline waypoints (the S-curve the scene is built around);
# piecewise-linear y(x).  Same polyline as the reference scene model.
ROAD_WPS = np.array(
    [
        (-100, -7), (-95, -6), (-90, -4.5), (-85, -2.8), (-80, -1.5),
        (-75, -0.8), (-70, -0.5), (-65, -1), (-60, -2.2), (-55, -3.8),
        (-50, -5), (-45, -5.5), (-40, -5.2), (-35, -4), (-30, -2.5),
        (-25, -1), (-20, 0.2), (-15, 1.2), (-10, 1.8), (-5, 2), (0, 1.5),
        (5, 0.5), (10, -0.8), (15, -2.2), (20, -3.5), (25, -4.2), (30, -4),
        (35, -3), (40, -1.8), (45, -0.8), (50, -0.5), (55, -1), (60, -2),
        (65, -3.2), (70, -4.5), (75, -5),
    ],
    dtype=np.float32,
)

_ROAD_X = jnp.asarray(ROAD_WPS[:, 0])
_ROAD_Y = jnp.asarray(ROAD_WPS[:, 1])


def road_y(x):
    """Piecewise-linear road centreline y(x), clamped at the ends."""
    return jnp.interp(jnp.asarray(x, jnp.float32), _ROAD_X, _ROAD_Y)


def terrain_height(x, y):
    """Closed-form terrain height, vectorized over any batch shape.

    Multi-octave sine hills + small forest-floor bumps, quadratically
    flattened within 4 m of the road and slightly sunk (6 cm crown) within
    2 m — behaviorally identical to the reference heightfield.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    h = 0.5 * jnp.sin(x * 0.018 + 0.5) * jnp.cos(y * 0.022 + 1.2)
    h += 0.35 * jnp.sin(x * 0.035 + 2.1) * jnp.sin(y * 0.03 + 0.7)
    h += 0.18 * jnp.sin(x * 0.07 + 3.3) * jnp.cos(y * 0.065 + 2.5)
    h += 0.12 * jnp.cos(x * 0.11 + 1.0) * jnp.sin(y * 0.09 + 4.0)
    h += 0.06 * jnp.sin(x * 0.5 + 0.7) * jnp.cos(y * 0.43 + 2.1)
    h += 0.04 * jnp.cos(x * 0.7 + 3.5) * jnp.sin(y * 0.6 + 0.4)
    h += 0.03 * jnp.sin(x * 1.0 + 1.2) * jnp.cos(y * 0.83 + 3.8)

    road_dist = jnp.abs(y - road_y(x))
    flatten = jnp.where(road_dist < 4.0, (road_dist / 4.0) ** 2, 1.0)
    h = h * flatten
    h = h - jnp.where(road_dist < 2.0, 0.06 * (1.0 - road_dist / 2.0), 0.0)
    return jnp.maximum(h, -0.5)


def terrain_normal(x, y, eps: float = 0.2):
    """Finite-difference surface normal (unit vector, z-up)."""
    hx = (terrain_height(x + eps, y) - terrain_height(x - eps, y)) / (2 * eps)
    hy = (terrain_height(x, y + eps) - terrain_height(x, y - eps)) / (2 * eps)
    n = jnp.stack([-hx, -hy, jnp.ones_like(hx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def terrain_pitch_roll(x, y, yaw, eps: float = 0.3):
    """Robot pitch/roll implied by terrain slope under heading ``yaw``.

    Matches how a wheeled base settles on the surface: pitch from the
    along-track slope, roll from the cross-track slope.
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    h0 = terrain_height(x, y)
    h_fwd = terrain_height(x + eps * c, y + eps * s)
    h_lat = terrain_height(x - eps * s, y + eps * c)
    pitch = jnp.arctan2(-(h_fwd - h0), eps)   # nose-up positive
    roll = jnp.arctan2(h_lat - h0, eps)
    return pitch, roll
