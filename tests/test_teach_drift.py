"""Live teach drift monitor: Procrustes parity + the online abort gate.

Reference behavior under test (vio_drift_monitor.py:53-128): the teach pass
runs VIO alongside the GT relay, periodically Procrustes-aligns the VIO
track to GT, and aborts the run online when drift_max exceeds the threshold
after a settling period.
"""

import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nclt_slam_tpu import config as cfg_mod
from nclt_slam_tpu.eval.metrics import procrustes_drift_2d
from nclt_slam_tpu.rollout import run_teach
from nclt_slam_tpu.vio.drift_monitor import procrustes_drift_masked

from test_rollout_e2e import pack_test_route, small_config, straight_route, tiny_scene

pytestmark = pytest.mark.slow


def test_procrustes_masked_matches_numpy():
    """JAX masked 4-flip Procrustes == eval.metrics numpy port on full mask."""
    rng = np.random.RandomState(3)
    n = 200
    t = np.linspace(0, 4 * np.pi, n)
    gt = np.stack([10 * np.cos(t), 6 * np.sin(t)], -1)
    # vio = rotated + flipped + translated gt + noise
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    vio = (gt * np.array([1.0, -1.0])) @ R.T + np.array([5.0, -3.0])
    vio += 0.3 * rng.randn(n, 2)

    ref_max, ref_mean = procrustes_drift_2d(
        np.concatenate([vio, np.zeros((n, 1))], -1), gt)
    w = jnp.ones(n)
    d_max, d_mean = jax.jit(procrustes_drift_masked)(
        jnp.asarray(vio), jnp.asarray(gt), w)
    assert abs(float(d_max) - ref_max) < 0.05, (float(d_max), ref_max)
    assert abs(float(d_mean) - ref_mean) < 0.02, (float(d_mean), ref_mean)


def test_procrustes_mask_ignores_padding():
    rng = np.random.RandomState(0)
    n, pad = 100, 60
    gt = np.cumsum(rng.randn(n, 2), 0)
    vio = gt + 0.1 * rng.randn(n, 2)
    gt_p = np.concatenate([gt, 999.0 * np.ones((pad, 2))])
    vio_p = np.concatenate([vio, -999.0 * np.ones((pad, 2))])
    w = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)])
    d_max, _ = jax.jit(procrustes_drift_masked)(
        jnp.asarray(vio_p), jnp.asarray(gt_p), w)
    assert float(d_max) < 1.0  # padding rows did not poison the fit


def _drift_cfg(**teach_kw):
    base = small_config()
    return base.replace(teach=dataclasses.replace(
        base.teach, run_vio=True, drift_settling_s=5.0,
        drift_check_period=20, drift_sample_period=2, **teach_kw))


def test_teach_healthy_vio_no_abort():
    cfg = _drift_cfg()
    route = straight_route(length=25.0)
    scene = tiny_scene(drop_on_path=False)
    packed, _, _ = pack_test_route(route, cfg)
    res = jax.jit(lambda: run_teach(scene, packed, cfg, n_ticks=600))()
    aborted = np.asarray(res.trace.aborted)
    assert not aborted.any(), "healthy teach must not trip the drift gate"
    # VIO track exists and roughly follows the route scale
    vio = np.asarray(res.trace.vio_xy)
    assert np.isfinite(vio).all()
    d_max = float(np.asarray(res.trace.drift_max)[-1])
    assert d_max < cfg.teach.drift_abort_m


def test_teach_broken_vio_aborts():
    """Descriptor noise beyond matchability -> VIO lost -> pose freezes
    while GT keeps moving -> Procrustes drift grows -> gate fires and the
    route halts (the reference's /tmp/teach_drift_abort.txt kill)."""
    base = _drift_cfg(drift_abort_m=4.0)
    cfg = base.replace(landmarks=dataclasses.replace(
        base.landmarks, desc_noise_bits=140.0))  # ~Hamming 128: unmatchable
    route = straight_route(length=30.0)
    scene = tiny_scene(drop_on_path=False)
    packed, _, _ = pack_test_route(route, cfg)
    res = jax.jit(lambda: run_teach(scene, packed, cfg, n_ticks=900))()
    aborted = np.asarray(res.trace.aborted)
    assert aborted.any(), "drift gate never fired on a lost VIO"
    # route halts at the abort: no further motion afterwards
    k = int(np.argmax(aborted))
    xy = np.asarray(res.trace.gt_xy)
    moved_after = np.hypot(*(xy[-1] - xy[min(k + 2, len(xy) - 1)]))
    assert moved_after < 0.5, f"robot kept driving {moved_after:.2f} m after abort"
    assert bool(np.asarray(res.trace.done)[-1])
