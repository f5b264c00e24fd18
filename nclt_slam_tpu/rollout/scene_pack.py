"""Packing scene/route/drop data into the fixed arrays the rollouts consume."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from nclt_slam_tpu.config import Config
from nclt_slam_tpu.planning.dispatcher import subsample_waypoints
from nclt_slam_tpu.sensors.features import build_scene_features
from nclt_slam_tpu.scene.colliders import SceneColliders
from nclt_slam_tpu.scene.obstacles import RouteDrops, no_drops
from nclt_slam_tpu.scene.routes import Route
from nclt_slam_tpu.scene.terrain import terrain_height


class PackedScene(NamedTuple):
    """Static collider arrays: scene colliders followed by the route's drop
    set.  ``drop_mask`` marks the drop slots so the supervisor FIRE can mask
    them out at runtime.  Feature fields carry the persistent visual
    landmark points the ORB-replacement observation model projects."""

    xy: jnp.ndarray        # (N, 2)
    radius: jnp.ndarray    # (N,)
    base_z: jnp.ndarray    # (N,)
    height: jnp.ndarray    # (N,)
    valid: jnp.ndarray     # (N,)
    drop_mask: jnp.ndarray  # (N,) True for drop slots
    feat_xyz: jnp.ndarray   # (S, 3) scene feature points
    feat_desc: jnp.ndarray  # (S, W) uint32 descriptors
    feat_owner: jnp.ndarray  # (S,) owning collider index
    feat_valid: jnp.ndarray  # (S,)
    feat_pkeep: jnp.ndarray  # (S,) per-tick keep probability
    feat_view_thr: jnp.ndarray    # (S, 256) per-bit angular thresholds
    feat_view_alpha: jnp.ndarray  # (S,) anchor azimuths


class PackedRoute(NamedTuple):
    dense_xy: jnp.ndarray     # (DENSE_CAP, 2)
    n_dense: jnp.ndarray      # () int32
    spawn: jnp.ndarray        # (2,)
    spawn_yaw: jnp.ndarray    # ()
    turnaround: jnp.ndarray   # (2,)
    wps: jnp.ndarray          # (max_waypoints, 2) 4 m subsample
    n_wps: jnp.ndarray        # () int32


_PACK_CACHE: dict = {}


def pack_scene(scene: SceneColliders, drops: RouteDrops | None = None,
               cfg: Config | None = None, feat_seed: int = 123,
               session: int = 0) -> PackedScene:
    """``session`` selects the appearance epoch: 0 = teach.  A non-zero
    session XORs each feature descriptor with a fixed random mask of
    ~``session_shift_bits`` bits (lighting/season change between the teach
    recording and the repeat drive) — within-session matching (VIO) is
    unaffected, cross-session matching (the anchor matcher against the
    teach-time store) pays the appearance gap."""
    from nclt_slam_tpu import config as cfg_mod
    cfg = cfg or cfg_mod.DEFAULT
    if drops is None:
        drops = no_drops()
    # Content-keyed memo: a campaign build calls pack_scene 30 times and
    # the 15 teach calls (same scene, no drops) are byte-identical; repeated
    # builds across ablation modes (calibrate, bench gt-line) hit it too.
    # Feature construction depends only on the collider set, the landmark/
    # camera feature knobs, seed, and session — all in the key.
    import hashlib

    import jax

    hsh = hashlib.sha1()
    for a in (scene.xy, scene.radius, scene.height, scene.valid,
              drops.xy, drops.radius, drops.height, drops.valid):
        arr = np.ascontiguousarray(a)
        # shape/dtype delimiters kill byte-concat aliasing across arrays
        hsh.update(repr((arr.shape, arr.dtype.str)).encode())
        hsh.update(arr.tobytes())
    # the active backend is part of the key: tests switch jax_platforms
    # mid-process, and arrays committed to the old platform must not be
    # returned on the new one
    cache_key = (hsh.hexdigest(), cfg.landmarks, feat_seed, session,
                 jax.default_backend())
    hit = _PACK_CACHE.get(cache_key)
    if hit is not None:
        return hit
    # bounded: packed feature sets are ~20 MB of device arrays each
    while len(_PACK_CACHE) >= 16:
        _PACK_CACHE.pop(next(iter(_PACK_CACHE)))
    xy = np.concatenate([scene.xy, drops.xy], 0)
    radius = np.concatenate([scene.radius, drops.radius], 0)
    height = np.concatenate([scene.height, drops.height], 0)
    valid = np.concatenate([scene.valid, drops.valid], 0)
    base_z = np.asarray(terrain_height(xy[:, 0], xy[:, 1]))
    drop_mask = np.concatenate(
        [np.zeros(len(scene.xy), bool), np.ones(len(drops.xy), bool)], 0)
    feats = build_scene_features(xy, radius, base_z, height, valid,
                                 cfg.landmarks, seed=feat_seed)
    if session != 0:
        from nclt_slam_tpu.sensors.features import (resample_session,
                                                    session_shift_masks)
        # detector instability: a fraction of teach keypoints don't exist
        # in the repeat session (replaced by different corners)
        feats = resample_session(feats, cfg.landmarks,
                                 seed=feat_seed * 131 + session)
        # repeat-session detector response is weaker wholesale (changed
        # lighting: dappled shadows, different exposure) — scales the
        # per-tick keep probability without touching the teach session,
        # so the repeat VIO/matcher run feature-poorer than the teach
        # recording at identical poses (the reference's repeat-vs-teach
        # drift asymmetry needs a repeat-only starvation term; global
        # dropout knobs moved the teach drift out of its band)
        feats = feats._replace(
            pkeep=feats.pkeep * cfg.landmarks.session_pkeep_scale)
        desc = feats.desc
        if cfg.landmarks.session_shift_bits > 0:
            # appearance shift on the surviving (shared) keypoints.
            # Appearance DEATH (whole views unrecognizable in the repeat
            # session) is NOT applied here: world-keyed per-feature death
            # cannot be balanced per route (a path oversamples whichever
            # cells it runs along — the r4/r5a per-route publish
            # pathology).  Death lives in the matcher as a per-stored-
            # landmark-block low-discrepancy sequence
            # (landmarks/matcher.py _block_dead,
            # LandmarkConfig.session_dead_frac note).
            masks = session_shift_masks(
                np.asarray(desc).shape, cfg.landmarks.session_shift_bits,
                seed=feat_seed * 7919 + session)
            desc = jnp.asarray(np.asarray(desc) ^ masks)
    else:
        desc = feats.desc
    packed = PackedScene(
        xy=jnp.asarray(xy), radius=jnp.asarray(radius),
        base_z=jnp.asarray(base_z), height=jnp.asarray(height),
        valid=jnp.asarray(valid), drop_mask=jnp.asarray(drop_mask),
        feat_xyz=feats.xyz, feat_desc=desc,
        feat_owner=feats.owner, feat_valid=feats.valid,
        feat_pkeep=feats.pkeep,
        feat_view_thr=feats.view_thr,
        feat_view_alpha=feats.view_alpha,
    )
    _PACK_CACHE[cache_key] = packed
    return packed


def pack_route(route: Route, cfg: Config) -> PackedRoute:
    wps, n_wps = subsample_waypoints(route.dense_xy, route.n_dense, cfg.planner)
    return PackedRoute(
        dense_xy=jnp.asarray(route.dense_xy),
        n_dense=jnp.int32(route.n_dense),
        spawn=jnp.asarray(route.spawn, jnp.float32),
        spawn_yaw=jnp.float32(route.spawn_yaw),
        turnaround=jnp.asarray(route.turnaround, jnp.float32),
        wps=jnp.asarray(wps),
        n_wps=jnp.int32(n_wps),
    )
