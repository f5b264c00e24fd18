"""Live teach drift monitor — the online abort gate.

Capability match for the reference's ``scripts/common/vio_drift_monitor.py``
(:53-128): during a teach run it samples (SLAM, GT) pose pairs, periodically
aligns the SLAM track to GT with a handedness-robust 2-D Procrustes (all
four axis flips), and aborts the teach pass when the post-alignment maximum
residual exceeds 10 m after a settling period.  Here it is a pure fixed-shape
state machine that lives inside the jitted teach scan: a ring buffer of the
most recent ``cap`` sample pairs (a windowed approximation of the
reference's full-history alignment) and a masked, flip-vectorized Procrustes
evaluated under a uniform ``lax.cond`` cadence.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from nclt_slam_tpu.config import TeachConfig


class DriftMonitorState(NamedTuple):
    buf_vio: jnp.ndarray   # (B, 2) raw VIO xy samples (VIO/nav frame)
    buf_gt: jnp.ndarray    # (B, 2) GT xy samples
    n: jnp.ndarray         # () int32 total samples pushed (ring cursor)
    drift_max: jnp.ndarray  # () f32 last computed max residual
    drift_mean: jnp.ndarray  # () f32
    aborted: jnp.ndarray   # () bool — gate fired


def init_drift_monitor(cfg: TeachConfig) -> DriftMonitorState:
    B = cfg.drift_buf_cap
    return DriftMonitorState(
        buf_vio=jnp.zeros((B, 2)), buf_gt=jnp.zeros((B, 2)),
        n=jnp.int32(0), drift_max=jnp.float32(0.0),
        drift_mean=jnp.float32(0.0), aborted=jnp.array(False))


def push_sample(st: DriftMonitorState, vio_xy, gt_xy) -> DriftMonitorState:
    B = st.buf_vio.shape[0]
    slot = st.n % B
    return st._replace(
        buf_vio=st.buf_vio.at[slot].set(vio_xy),
        buf_gt=st.buf_gt.at[slot].set(gt_xy),
        n=st.n + 1)


def procrustes_drift_masked(vio_xy, gt_xy, w):
    """Masked 4-flip 2-D Procrustes residual (max, mean).

    vio_xy, gt_xy: (B, 2); w: (B,) 0/1 sample validity.  Rotation +
    translation only (the reference monitor does not fit scale); all four
    axis-sign combinations are evaluated vectorized and the one with the
    lowest mean residual wins (handedness robustness,
    vio_drift_monitor.py:53-86).
    """
    wsum = jnp.maximum(w.sum(), 1e-6)
    xg, yg = gt_xy[:, 0], gt_xy[:, 1]
    cxg = (xg * w).sum() / wsum
    cyg = (yg * w).sum() / wsum
    dxg, dyg = xg - cxg, yg - cyg

    flips = jnp.array([[1.0, 1.0], [-1.0, 1.0], [1.0, -1.0], [-1.0, -1.0]])
    xv = vio_xy[None, :, 0] * flips[:, 0:1]          # (4, B)
    yv = vio_xy[None, :, 1] * flips[:, 1:2]
    cxv = (xv * w).sum(-1, keepdims=True) / wsum
    cyv = (yv * w).sum(-1, keepdims=True) / wsum
    dxv, dyv = xv - cxv, yv - cyv

    a = (w * (dxv * dxg + dyv * dyg)).sum(-1)        # (4,)
    b = (w * (dxv * dyg - dyv * dxg)).sum(-1)
    th = jnp.arctan2(b, a)
    c, s = jnp.cos(th)[:, None], jnp.sin(th)[:, None]
    rx = c * dxv - s * dyv + cxg
    ry = s * dxv + c * dyv + cyg
    err = jnp.hypot(rx - xg, ry - yg)                # (4, B)
    mean_err = (err * w).sum(-1) / wsum
    best = jnp.argmin(mean_err)
    best_err = err[best]
    d_max = jnp.max(jnp.where(w > 0, best_err, 0.0))
    return d_max, mean_err[best]


def check_drift(st: DriftMonitorState, tick, cfg: TeachConfig,
                nav_hz: float = 10.0) -> DriftMonitorState:
    """Periodic gate evaluation (call under a uniform cond at
    drift_check_period).  Settling: no abort before drift_settling_s."""
    B = st.buf_vio.shape[0]
    w = (jnp.arange(B) < st.n).astype(jnp.float32)
    enough = st.n >= 20
    d_max, d_mean = procrustes_drift_masked(st.buf_vio, st.buf_gt, w)
    d_max = jnp.where(enough, d_max, 0.0)
    d_mean = jnp.where(enough, d_mean, 0.0)
    settled = tick.astype(jnp.float32) >= cfg.drift_settling_s * nav_hz
    fire = settled & enough & (d_max > cfg.drift_abort_m)
    return st._replace(drift_max=d_max, drift_mean=d_mean,
                       aborted=st.aborted | fire)
