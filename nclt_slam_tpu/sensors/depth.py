"""Analytic depth raycaster — the RGB-D sensor model.

TPU-native replacement for the Isaac RTX ``distance_to_image_plane``
annotator (run_husky_forest.py:453-458): rays from a D435i-like pinhole
camera are intersected analytically against (a) the closed-form terrain
heightfield (fixed-step marching, first-crossing) and (b) the packed scene
colliders as vertical cylinders (exact quadratic).  Everything is dense
vectorized math over a decimated ray grid — no BVH, no divergence — so it
vmaps over the 15-route batch and fuses into one XLA program.

Camera convention: OpenCV optical frame (x right, y down, z forward);
base_link is FLU.  Extrinsics match the reference recorder
(visual_landmark_recorder.py:81-88: cam at +0.35 fwd, +0.18 up).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nclt_slam_tpu.config import CameraConfig
from nclt_slam_tpu.scene.terrain import terrain_height

# base_from_cam rotation: columns are the optical axes in FLU body coords.
R_BASE_CAM = jnp.array(
    [[0.0, 0.0, 1.0],
     [-1.0, 0.0, 0.0],
     [0.0, -1.0, 0.0]]
)


def camera_pose(base_pos, yaw, cfg: CameraConfig):
    """World camera origin + world_from_cam rotation (yaw-aligned, like the
    reference's camera rig that follows the base with yaw only)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    origin = base_pos + jnp.array([cfg.cam_offset_fwd * c,
                                   cfg.cam_offset_fwd * s,
                                   cfg.cam_offset_up])
    R_world_base = jnp.array(
        [[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return origin, R_world_base @ R_BASE_CAM


def ray_grid(cfg: CameraConfig):
    """Decimated pixel grid -> unit ray directions in the optical frame.

    Returns (dirs (R, C, 3), us (C,), vs (R,)) where (us, vs) are the full-res
    pixel coordinates each ray corresponds to."""
    us = (jnp.arange(cfg.ray_cols) + 0.5) * (cfg.width / cfg.ray_cols)
    vs = (jnp.arange(cfg.ray_rows) + 0.5) * (cfg.height / cfg.ray_rows)
    x = (us[None, :] - cfg.cx) / cfg.fx
    y = (vs[:, None] - cfg.cy) / cfg.fy
    d = jnp.stack([jnp.broadcast_to(x, (cfg.ray_rows, cfg.ray_cols)),
                   jnp.broadcast_to(y, (cfg.ray_rows, cfg.ray_cols)),
                   jnp.ones((cfg.ray_rows, cfg.ray_cols))], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True), us, vs


# terrain_height is clamped to >= -0.5 and its octave amplitudes sum to
# ~1.28, so every surface point lies in this altitude band (+margin)
_TERR_Z_MIN = -0.55
_TERR_Z_MAX = 1.35


def _terrain_hit(origin, dirs_w, cfg: CameraConfig):
    """First ray-terrain crossing, band-restricted hierarchical march.

    The naive fixed-step march (96 terrain evals/ray) dominated the whole
    repeat tick (~90 % of bench time): terrain_height costs 14
    transcendentals + a 36-knot interp per sample.  Instead: (1) clip each
    ray to the t-interval where its altitude lies inside the terrain band
    [_TERR_Z_MIN, _TERR_Z_MAX] — steep rays get centimetre-scale effective
    resolution from just a few samples; (2) coarse-march that interval,
    (3) fine-march the first bracketing coarse cell, (4) midpoint-refine.
    ~24 terrain evals/ray with *better* accuracy than the 96-step version.
    dirs_w: (..., 3) broadcastable ray directions.
    """
    S_COARSE = max(8, cfg.ray_steps // 4)
    S_FINE = 8
    oz = origin[2]
    dz = dirs_w[..., 2]
    safe_dz = jnp.where(jnp.abs(dz) < 1e-4, 1e-4, dz)
    t1 = (_TERR_Z_MAX - oz) / safe_dz
    t2 = (_TERR_Z_MIN - oz) / safe_dz
    t_en = jnp.minimum(t1, t2)
    t_ex = jnp.maximum(t1, t2)
    horiz = jnp.abs(dz) < 1e-3
    inside = (oz >= _TERR_Z_MIN) & (oz <= _TERR_Z_MAX)
    t_lo = jnp.where(horiz, cfg.depth_min,
                     jnp.clip(t_en, cfg.depth_min, cfg.depth_max))
    t_hi = jnp.where(horiz, jnp.where(inside, cfg.depth_max, cfg.depth_min),
                     jnp.clip(t_ex, cfg.depth_min, cfg.depth_max))
    t_hi = jnp.maximum(t_hi, t_lo)

    # baked-texture fast path (CameraConfig.ray_terrain_tex): bilinear
    # gathers replace the analytic transcendentals in the march
    from nclt_slam_tpu.scene.terrain import terrain_height_tex
    h_fn = terrain_height_tex if cfg.ray_terrain_tex else terrain_height

    # LAYOUT: keep x/y/z as separate (..., rows, cols) planes.  A trailing
    # size-3 coordinate dim puts 3 on the minor (128-lane) axis of the TPU
    # tile — ~2 % lane utilization and strided slices — and measured ~100x
    # slower than the identical math on clean planes.
    dx, dy, dz_w = dirs_w[..., 0], dirs_w[..., 1], dirs_w[..., 2]

    def first_below(t0, step, n):
        """March n samples at t0 + step*(k+0.5); return (hit, k_first)."""
        ks = jnp.arange(n, dtype=jnp.float32) + 0.5
        ts = t0[None] + step[None] * ks.reshape((n,) + (1,) * t0.ndim)
        px = origin[0] + ts * dx[None]
        py = origin[1] + ts * dy[None]
        pz = origin[2] + ts * dz_w[None]
        below = pz < h_fn(px, py)
        # a zero-length interval (no band overlap) never hits
        below = below & (step[None] > 0)
        return jnp.any(below, axis=0), jnp.argmax(below, axis=0)

    step_c = (t_hi - t_lo) / S_COARSE
    hit_c, k_c = first_below(t_lo, step_c, S_COARSE)
    # fine-march the bracketing coarse cell [t_lo + k*step, + (k+1)*step]
    cell_lo = t_lo + k_c.astype(jnp.float32) * step_c
    step_f = step_c / S_FINE
    hit_f, k_f = first_below(cell_lo, step_f, S_FINE)
    t_hit = cell_lo + (k_f.astype(jnp.float32) + 0.5) * step_f - 0.5 * step_f
    any_hit = hit_c & hit_f & (t_hit <= cfg.depth_max)
    return jnp.where(any_hit, t_hit, jnp.inf)


def _cylinder_hit(origin, dirs_w, obs_xy, obs_r, obs_base_z, obs_h, obs_valid,
                  cfg: CameraConfig):
    """Exact ray/vertical-cylinder intersection, min over colliders.

    obs_* are padded arrays (N,); invalid entries are masked to +inf."""
    o = origin[:2]
    d = dirs_w[..., :2]                                    # (R, C, 2)
    a = jnp.sum(d * d, axis=-1)                            # (R, C)
    rel = o[None, :] - obs_xy                              # (N, 2)

    # broadcast: (R, C, N)
    b = 2.0 * (d[..., None, 0] * rel[None, None, :, 0]
               + d[..., None, 1] * rel[None, None, :, 1])
    c0 = jnp.sum(rel * rel, axis=-1)[None, None, :] - (obs_r * obs_r)[None, None, :]
    disc = b * b - 4.0 * a[..., None] * c0
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sqrt_disc) / (2.0 * a[..., None] + 1e-12)

    z_hit = origin[2] + t * dirs_w[..., 2:3][..., 0][..., None]
    in_height = (z_hit >= obs_base_z[None, None, :]) & \
                (z_hit <= (obs_base_z + obs_h)[None, None, :])
    ok = (disc > 0.0) & (t > cfg.depth_min) & in_height & obs_valid[None, None, :]
    t = jnp.where(ok, t, jnp.inf)
    return jnp.min(t, axis=-1)                             # (R, C)


def render_depth(base_pos, yaw, obs_xy, obs_r, obs_base_z, obs_h, obs_valid,
                 cfg: CameraConfig):
    """Depth image over the decimated ray grid.

    Returns (depth_z (R, C) — z-depth in the optical frame, like the RTX
    distance_to_image_plane annotator; points_world (R, C, 3); valid mask).
    """
    origin, R_wc = camera_pose(base_pos, yaw, cfg)
    dirs_c, _, _ = ray_grid(cfg)
    dirs_w = jnp.einsum("ij,rcj->rci", R_wc, dirs_c)

    t_terr = _terrain_hit(origin, dirs_w, cfg)
    t_cyl = _cylinder_hit(origin, dirs_w, obs_xy, obs_r, obs_base_z, obs_h,
                          obs_valid, cfg)
    t = jnp.minimum(t_terr, t_cyl)
    valid = jnp.isfinite(t) & (t <= cfg.depth_max)
    t_safe = jnp.where(valid, t, cfg.depth_max)

    points_world = origin[None, None, :] + t_safe[..., None] * dirs_w
    depth_z = t_safe * dirs_c[..., 2]     # project range onto optical axis
    return jnp.where(valid, depth_z, 0.0), points_world, valid


def depth_to_cam_points(depth_z, cfg: CameraConfig):
    """Depth image -> points in the optical camera frame (pose-free)."""
    dirs_c, _, _ = ray_grid(cfg)
    t = depth_z / jnp.maximum(dirs_c[..., 2], 1e-6)
    return t[..., None] * dirs_c


def cam_points_to_world(p_cam, base_pos, yaw, cfg: CameraConfig):
    """Camera-frame points -> world frame for a given (possibly estimated)
    base pose.  This is the Nav2 costmap's TF transform: the reference
    places /depth_points using the relay's map->camera TF — i.e. the NAV
    pose, not ground truth — so the obstacle layer stays consistent with
    the frame the planner and follower operate in."""
    origin, R_wc = camera_pose(base_pos, yaw, cfg)
    return jnp.einsum("ij,...j->...i", R_wc, p_cam) + origin


def sample_depth_at_pixels(base_pos, yaw, us, vs, obs_xy, obs_r, obs_base_z,
                           obs_h, obs_valid, cfg: CameraConfig):
    """Depth for arbitrary full-res pixels (u, v) — used by the landmark
    recorder/matcher to back-project feature points.  us, vs: (K,)."""
    origin, R_wc = camera_pose(base_pos, yaw, cfg)
    x = (us - cfg.cx) / cfg.fx
    y = (vs - cfg.cy) / cfg.fy
    d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)      # (K, 3)
    dirs_w = jnp.einsum("ij,kj->ki", R_wc, d)[:, None, :]   # (K, 1, 3)

    t_terr = _terrain_hit(origin, dirs_w, cfg)[:, 0]
    t_cyl = _cylinder_hit(origin, dirs_w, obs_xy, obs_r, obs_base_z, obs_h,
                          obs_valid, cfg)[:, 0]
    t = jnp.minimum(t_terr, t_cyl)
    valid = jnp.isfinite(t) & (t <= cfg.depth_max)
    t_safe = jnp.where(valid, t, cfg.depth_max)
    depth_z = t_safe * d[:, 2]
    return jnp.where(valid, depth_z, 0.0), valid
