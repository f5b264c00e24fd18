"""Teach-time visual landmark recorder (visual_landmark_recorder.py port).

Every >= 2 m of camera displacement, snapshot the current feature
observation: camera world pose, per-feature descriptors, pixel coords, and
3-D points in the camera frame (the reference back-projects ORB keypoints
through the depth image; our observation model yields the camera-frame
points directly, with the same below-horizon and depth-range gates).
Fixed-capacity store -> the ``landmarks.pkl`` artefact pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nclt_slam_tpu.config import CameraConfig, LandmarkConfig
from nclt_slam_tpu.core.quat import quat_from_yaw
from nclt_slam_tpu.sensors.features import Observation


class LandmarkStore(NamedTuple):
    """Fixed-capacity landmark array-of-structs (the landmarks.pkl pytree)."""

    cam_pos: jnp.ndarray     # (L, 3) camera world position at record time
    cam_yaw: jnp.ndarray     # (L,) camera yaw (FLU heading)
    desc: jnp.ndarray        # (L, F, W) uint32
    p3d_cam: jnp.ndarray     # (L, F, 3) feature points, OpenCV cam frame
    uv: jnp.ndarray          # (L, F, 2)
    feat_valid: jnp.ndarray  # (L, F)
    n_feats: jnp.ndarray     # (L,)
    count: jnp.ndarray       # () int32
    last_pos: jnp.ndarray    # (2,) last recorded camera xy
    has_last: jnp.ndarray    # () bool


def init_store(cfg: LandmarkConfig) -> LandmarkStore:
    L, F, W = cfg.max_landmarks, cfg.feats_per_landmark, cfg.desc_words
    return LandmarkStore(
        cam_pos=jnp.zeros((L, 3)),
        cam_yaw=jnp.zeros(L),
        desc=jnp.zeros((L, F, W), jnp.uint32),
        p3d_cam=jnp.zeros((L, F, 3)),
        uv=jnp.zeros((L, F, 2)),
        feat_valid=jnp.zeros((L, F), bool),
        n_feats=jnp.zeros(L, jnp.int32),
        count=jnp.int32(0),
        last_pos=jnp.zeros(2),
        has_last=jnp.array(False),
    )


def record_tick(store: LandmarkStore, obs: Observation, cam_pos, cam_yaw,
                cam: CameraConfig, cfg: LandmarkConfig) -> LandmarkStore:
    """Maybe record a landmark this tick (>= 2 m displacement trigger)."""
    disp = jnp.linalg.norm(cam_pos[:2] - store.last_pos)
    trigger = (~store.has_last) | (disp >= cfg.record_min_disp_m)
    slot_free = store.count < cfg.max_landmarks

    # reference gates: below-horizon pixels (v > 180) + depth range
    # (0.5-15 m already enforced by the observation model) + the 3x3
    # depth-patch std < 0.30 m gate (recorder :259-269).  Under the stereo
    # noise model the patch std IS the physical depth noise
    # sigma_z = rel_per_m * z^2, so with rel=0.003 and the 0.30 m cap the
    # gate drops range-noisy points (z > 10 m) exactly like the reference
    # drops high-variance patches.
    F = cfg.feats_per_landmark
    sigma_z = cam.depth_noise_rel_per_m * obs.p3d_cam[:, 2] ** 2
    gate = obs.valid & (obs.uv[:, 1] > cfg.ground_v_threshold) & \
        (sigma_z < cfg.depth_patch_std_max)
    # compact the first F gated features into the landmark slots
    order = jnp.argsort(~gate)  # gated features first, stable
    take = order[:F]
    f_valid = gate[take]
    n_ok = f_valid.sum()
    enough = n_ok >= cfg.record_min_feats  # reference gate :269, rescaled

    do = trigger & slot_free & enough
    slot = jnp.minimum(store.count, cfg.max_landmarks - 1)

    def upd(arr, new):
        return jnp.where(do, arr.at[slot].set(new), arr)

    return LandmarkStore(
        cam_pos=upd(store.cam_pos, cam_pos),
        cam_yaw=upd(store.cam_yaw, cam_yaw),
        desc=upd(store.desc, obs.desc[take]),
        p3d_cam=upd(store.p3d_cam, obs.p3d_cam[take]),
        uv=upd(store.uv, obs.uv[take]),
        feat_valid=upd(store.feat_valid, f_valid),
        n_feats=upd(store.n_feats, n_ok.astype(jnp.int32)),
        count=jnp.where(do, store.count + 1, store.count),
        last_pos=jnp.where(do, cam_pos[:2], store.last_pos),
        has_last=store.has_last | do,
    )
