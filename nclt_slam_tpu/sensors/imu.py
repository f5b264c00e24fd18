"""Synthetic Phidgets-1042 IMU as a pure scanned state machine.

Behavior-for-behavior port of the reference's GT-derived IMU
(run_husky_forest.py:769-860): body rates from quaternion differencing with
a 0.4/0.6 low-pass, specific force from double-differentiated position with
an 11-tap mean filter, gravity rotated into body frame, white noise +
constant per-run biases — and the exp-51 standstill gate (<15 mm drift over
a 100 ms window → output pure gravity) that keeps contact-solver-style
position jitter from becoming phantom acceleration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nclt_slam_tpu.config import ImuConfig
from nclt_slam_tpu.core.quat import quat_conj, quat_mul, quat_rotate, so3_log


class ImuState(NamedTuple):
    prev_pos: jax.Array       # (3,)
    prev_vel: jax.Array       # (3,) world velocity
    prev_quat: jax.Array      # (4,)
    prev_omega: jax.Array     # (3,) filtered body rate
    accel_buf: jax.Array      # (taps, 3) raw world-accel ring buffer
    accel_n: jax.Array        # () int32 — samples in ring so far
    pos_hist: jax.Array       # (window, 3) position history ring
    pos_n: jax.Array          # () int32
    bias_gyro: jax.Array      # (3,) constant per-run bias
    bias_accel: jax.Array     # (3,)
    initialized: jax.Array    # () bool


def init_imu(key, cfg: ImuConfig) -> ImuState:
    kg, ka = jax.random.split(key)
    return ImuState(
        prev_pos=jnp.zeros(3),
        prev_vel=jnp.zeros(3),
        prev_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        prev_omega=jnp.zeros(3),
        accel_buf=jnp.zeros((cfg.accel_mean_taps, 3)),
        accel_n=jnp.int32(0),
        pos_hist=jnp.zeros((cfg.standstill_window, 3)),
        pos_n=jnp.int32(0),
        bias_gyro=cfg.gyro_bias_std * jax.random.normal(kg, (3,)),
        bias_accel=cfg.accel_bias_std * jax.random.normal(ka, (3,)),
        initialized=jnp.array(False),
    )


def imu_step(state: ImuState, pos, quat, dt, key, cfg: ImuConfig):
    """One 200 Hz IMU sample from GT (pos, quat).

    Returns (new_state, measurement (6,)) with measurement =
    [ax, ay, az, gx, gy, gz] in body frame.
    """
    g_vec = jnp.array([0.0, 0.0, cfg.gravity])

    # body rate from quaternion diff + LPF
    dq = quat_mul(quat_conj(state.prev_quat), quat)
    omega_raw = so3_log(dq) / dt
    omega = cfg.omega_lpf_new * omega_raw + (1.0 - cfg.omega_lpf_new) * state.prev_omega

    # world velocity / raw world acceleration by differencing
    vel = (pos - state.prev_pos) / dt
    raw_accel = (vel - state.prev_vel) / dt

    # 11-tap mean filter over raw world accel (ring buffer)
    taps = cfg.accel_mean_taps
    slot = state.accel_n % taps
    accel_buf = state.accel_buf.at[slot].set(raw_accel)
    n_valid = jnp.minimum(state.accel_n + 1, taps)
    smooth_accel = accel_buf.sum(0) / n_valid.astype(jnp.float32)

    # standstill detection over the 100 ms position window
    win = cfg.standstill_window
    pslot = state.pos_n % win
    pos_hist = state.pos_hist.at[pslot].set(pos)
    oldest = pos_hist[(state.pos_n + 1) % win]
    max_disp = jnp.max(jnp.linalg.norm(pos_hist - oldest[None, :], axis=-1))
    window_full = state.pos_n + 1 >= win
    is_stationary = window_full & (max_disp < cfg.standstill_thresh)

    # body-frame specific force
    q_inv = quat_conj(quat)
    accel_moving = quat_rotate(q_inv, smooth_accel + g_vec)
    accel_still = quat_rotate(q_inv, g_vec)
    accel_body = jnp.where(is_stationary, accel_still, accel_moving)

    kn_a, kn_g = jax.random.split(key)
    accel_meas = (accel_body + cfg.accel_std * jax.random.normal(kn_a, (3,))
                  + state.bias_accel)
    gyro_meas = (omega + cfg.gyro_std * jax.random.normal(kn_g, (3,))
                 + state.bias_gyro)

    # First sample after init: pure gravity on z (reference returns
    # (0,0,9.81, 0,0,0) before any history exists).
    first = ~state.initialized
    accel_meas = jnp.where(first, jnp.array([0.0, 0.0, cfg.gravity]), accel_meas)
    gyro_meas = jnp.where(first, jnp.zeros(3), gyro_meas)

    new_state = ImuState(
        prev_pos=pos,
        prev_vel=jnp.where(first, jnp.zeros(3), vel),
        prev_quat=quat,
        prev_omega=jnp.where(first, jnp.zeros(3), omega),
        accel_buf=jnp.where(first, state.accel_buf, accel_buf),
        accel_n=jnp.where(first, 0, state.accel_n + 1),
        pos_hist=pos_hist,
        pos_n=state.pos_n + 1,
        bias_gyro=state.bias_gyro,
        bias_accel=state.bias_accel,
        initialized=jnp.array(True),
    )
    return new_state, jnp.concatenate([accel_meas, gyro_meas])


def imu_block(state: ImuState, positions, quats, dt, key, cfg: ImuConfig):
    """Scan the IMU over one nav tick's substep trajectory.

    positions (S,3), quats (S,4) → (new_state, measurements (S,6))."""
    keys = jax.random.split(key, positions.shape[0])

    def body(s, inp):
        p, q, k = inp
        return imu_step(s, p, q, dt, k, cfg)

    return jax.lax.scan(body, state, (positions, quats, keys))
