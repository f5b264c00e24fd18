"""RGB-D SLAM baseline (datasets/slam/rgbd_slam.py) — the Gazebo stack's
RTAB-Map capability row, exercised on a generated world through the
framework's own scene + sensor model (simulation/gazebo/experiments/
02_slam_comparison protocol: run RGB-D SLAM on a forest route, score ATE).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nclt_slam_tpu.config import DEFAULT
from nclt_slam_tpu.datasets.slam.rgbd_slam import (
    frame_signature,
    run_rgbd_slam,
)
from nclt_slam_tpu.eval.metrics import ate_rmse
from nclt_slam_tpu.sensors.features import build_scene_features, observe

CFG = DEFAULT


def _loop_session(T=140, R=14.0):
    """Closed-loop drive through a pillar ring; returns (obs list, gt)."""
    rng = np.random.RandomState(6)
    N = 72
    ang = rng.uniform(0, 2 * np.pi, N)
    rad = R + rng.uniform(-6.0, 6.0, N)
    oxy = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1).astype(
        np.float32)
    orr = np.full(N, 0.4, np.float32)
    oh = np.full(N, 6.0, np.float32)
    obz = np.zeros(N, np.float32)
    ovalid = np.ones(N, bool)
    feats = build_scene_features(oxy, orr, obz, oh, ovalid, CFG.landmarks)

    th = np.linspace(0, 2 * np.pi * (1 + 45 / T), T)   # loop + revisit
    gt = np.stack([R * np.cos(th), R * np.sin(th)], -1)
    yaw = th + np.pi / 2
    key = jax.random.PRNGKey(3)
    obs_seq = []
    for k in range(T):
        key, ko = jax.random.split(key)
        pos3 = jnp.asarray([*gt[k], 0.31])
        obs_seq.append(observe(pos3, jnp.float32(yaw[k]), feats,
                               jnp.asarray(ovalid), ko, CFG.camera,
                               CFG.landmarks))
    return obs_seq, gt


def test_rgbd_slam_loop_closure_reduces_ate():
    obs_seq, gt = _loop_session()
    res = run_rgbd_slam(obs_seq, CFG.camera, loop_min_gap=60,
                        sig_thresh=0.08)
    # frame-to-frame odometry tracked throughout
    assert (res.n_matches[1:] >= 8).mean() > 0.9, res.n_matches[:20]
    accepted = int(np.asarray(res.loops[2]).sum())
    assert accepted >= 1, "appearance retrieval found no verified loop"
    ate_open = ate_rmse(res.poses_open[:, :2], gt)
    ate_opt = ate_rmse(res.poses_opt[:, :2], gt)
    assert np.isfinite(ate_opt)
    # the loop-closed estimate must not be worse, and the pipeline must be
    # in a sane ATE band for a ~90 m loop (the reference's RTAB-Map posts
    # 9.23 m on its forest route; gazebo/experiments/02_slam_comparison)
    assert ate_opt <= ate_open * 1.05 + 0.02, (ate_open, ate_opt)
    assert ate_opt < 5.0, ate_opt


def test_frame_signature_is_appearance_key():
    """Signatures of the same viewpoint agree; distant viewpoints differ."""
    obs_seq, _ = _loop_session(T=80)
    s0 = np.asarray(frame_signature(obs_seq[0]))
    s0b = np.asarray(frame_signature(obs_seq[1]))      # adjacent frame
    s_far = np.asarray(frame_signature(obs_seq[40]))   # opposite side
    d_near = np.abs(s0 - s0b).mean()
    d_far = np.abs(s0 - s_far).mean()
    assert d_near < d_far, (d_near, d_far)
