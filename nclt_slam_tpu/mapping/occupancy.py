"""Log-odds occupancy mapping as pure array scatter ops.

Functional replacement for the reference's per-point Bresenham mapper
(teach_run_depth_mapper.py:162-195) and the Nav2 costmap_2d obstacle layer:
instead of a Python loop tracing each ray cell-by-cell, every depth ray
contributes a fixed number of uniformly-spaced free-space samples plus its
endpoint, and all updates land in one ``scatter-add`` on the flattened grid.
Same log-odds constants (L_FREE −0.4, L_OCC +1.4, clamp ±5, thresholds
0.65/0.25), same 0.1 m resolution, fully vmappable over routes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nclt_slam_tpu.config import MapConfig
from nclt_slam_tpu.scene.terrain import terrain_height

FREE_SAMPLES = 24   # free-space samples per ray (Bresenham replacement)


def empty_grid(cfg: MapConfig):
    return jnp.zeros((cfg.rows, cfg.cols), jnp.float32)


def world_to_cell(x, y, cfg: MapConfig):
    c = jnp.floor((x - cfg.origin_x) / cfg.resolution).astype(jnp.int32)
    r = jnp.floor((y - cfg.origin_y) / cfg.resolution).astype(jnp.int32)
    return r, c


def cell_to_world(r, c, cfg: MapConfig):
    return (cfg.origin_x + (c + 0.5) * cfg.resolution,
            cfg.origin_y + (r + 0.5) * cfg.resolution)


def in_bounds(r, c, cfg: MapConfig):
    return (r >= 0) & (r < cfg.rows) & (c >= 0) & (c < cfg.cols)


def integrate_depth(grid, cam_xy, points_world, points_valid, cfg: MapConfig):
    """One depth frame -> log-odds update.

    points_world: (N, 3) ray endpoints in world frame; points_valid: (N,).
    Obstacle band is measured relative to the local terrain surface (the
    physically-correct reading of the reference's absolute z in [0.2, 2.0]
    band — its scene is flat where it maps).
    """
    pts = points_world[:: cfg.point_subsample]
    val = points_valid[:: cfg.point_subsample]

    ground = terrain_height(pts[:, 0], pts[:, 1])
    rel_h = pts[:, 2] - ground
    in_range = jnp.linalg.norm(pts[:, :2] - cam_xy[None, :], axis=-1) <= cfg.obstacle_range
    occ_mask = val & (rel_h > cfg.height_lo) & (rel_h < cfg.height_hi) & in_range
    # rays that hit low ground still clear free space along their length
    clear_mask = val & in_range

    # All evidence lies within obstacle_range (8 m) of the camera, so the
    # update touches only a live window around it: scatter into a (LW, LW)
    # crop and dynamic-update it back, instead of materializing a
    # zeros+add+clip pass over the full ~1.8M-cell grid every costmap tick.
    LW = min(cfg.live_window, cfg.rows, cfg.cols)
    # The crop silently drops evidence outside it: it must cover the full
    # sensing disc (window half-extent >= obstacle_range) or raising
    # obstacle_range would quietly corrupt the costmap.
    assert LW * cfg.resolution >= 2.0 * cfg.obstacle_range, (
        f"live_window {LW} cells x {cfg.resolution} m does not cover "
        f"2 x obstacle_range ({cfg.obstacle_range} m)")
    r_cam, c_cam = world_to_cell(cam_xy[0], cam_xy[1], cfg)
    r0 = jnp.clip(r_cam - LW // 2, 0, cfg.rows - LW)
    c0 = jnp.clip(c_cam - LW // 2, 0, cfg.cols - LW)
    win = jax.lax.dynamic_slice(grid, (r0, c0), (LW, LW))

    def to_win(r, c):
        rw, cw = r - r0, c - c0
        ok = (rw >= 0) & (rw < LW) & (cw >= 0) & (cw < LW)
        return rw, cw, ok

    # endpoint scatter (occupied)
    r_end, c_end = world_to_cell(pts[:, 0], pts[:, 1], cfg)
    rw_e, cw_e, okw_e = to_win(r_end, c_end)
    ok_end = occ_mask & okw_e
    idx_end = jnp.where(ok_end, rw_e * LW + cw_e, 0)
    upd = jnp.zeros(LW * LW, jnp.float32)
    upd = upd.at[idx_end].add(jnp.where(ok_end, cfg.l_occ, 0.0))

    # free-space samples strictly before the endpoint
    fr = (jnp.arange(FREE_SAMPLES) + 0.5) / (FREE_SAMPLES + 1.0)
    sample_xy = cam_xy[None, None, :] + fr[None, :, None] * (
        pts[:, None, :2] - cam_xy[None, None, :])
    r_s, c_s = world_to_cell(sample_xy[..., 0], sample_xy[..., 1], cfg)
    rw_s, cw_s, okw_s = to_win(r_s, c_s)
    ok_s = clear_mask[:, None] & okw_s
    idx_s = jnp.where(ok_s, rw_s * LW + cw_s, 0)
    # normalize so a ray's total free evidence per frame matches the
    # reference's one-hit-per-cell Bresenham semantics
    upd = upd.at[idx_s.reshape(-1)].add(
        jnp.where(ok_s, cfg.l_free * (8.0 / FREE_SAMPLES), 0.0).reshape(-1))

    win = jnp.clip(win + upd.reshape(LW, LW), cfg.l_min, cfg.l_max)
    return jax.lax.dynamic_update_slice(grid, win, (r0, c0))


def occupancy_trinary(grid, cfg: MapConfig):
    """Log-odds -> {0: free, 1: unknown, 2: occupied} like the PGM trinary."""
    occ_th = jnp.log(cfg.occ_thresh / (1.0 - cfg.occ_thresh))
    free_th = jnp.log(cfg.free_thresh / (1.0 - cfg.free_thresh))
    return jnp.where(grid > occ_th, 2, jnp.where(grid < free_th, 0, 1)).astype(jnp.int8)


def crop_window(grid, center_r, center_c, window: int):
    """Fixed-size window crop centered at (r, c), clamped to the grid."""
    rows, cols = grid.shape
    r0 = jnp.clip(center_r - window // 2, 0, rows - window)
    c0 = jnp.clip(center_c - window // 2, 0, cols - window)
    return jax.lax.dynamic_slice(grid, (r0, c0), (window, window)), r0, c0


def inflate_cost(occ_window, cfg: MapConfig):
    """Costmap from a trinary window: lethal at obstacles, exponential decay
    within the inflation radius (Nav2 inflation_layer semantics: radius
    0.7 m, cost_scaling 3.0).  Distance via iterated 3x3 min-plus."""
    n_iter = int(round((cfg.inflation_radius + cfg.inscribed_radius)
                       / cfg.resolution)) + 1
    big = jnp.float32(1e6)
    dist = jnp.where(occ_window == 2, 0.0, big)

    diag = jnp.float32(1.4142135 * cfg.resolution)
    orth = jnp.float32(cfg.resolution)

    def body(_, d):
        dn = d
        dn = jnp.minimum(dn, jnp.roll(d, 1, 0) + orth)
        dn = jnp.minimum(dn, jnp.roll(d, -1, 0) + orth)
        dn = jnp.minimum(dn, jnp.roll(d, 1, 1) + orth)
        dn = jnp.minimum(dn, jnp.roll(d, -1, 1) + orth)
        dn = jnp.minimum(dn, jnp.roll(jnp.roll(d, 1, 0), 1, 1) + diag)
        dn = jnp.minimum(dn, jnp.roll(jnp.roll(d, 1, 0), -1, 1) + diag)
        dn = jnp.minimum(dn, jnp.roll(jnp.roll(d, -1, 0), 1, 1) + diag)
        dn = jnp.minimum(dn, jnp.roll(jnp.roll(d, -1, 0), -1, 1) + diag)
        return dn

    dist = jax.lax.fori_loop(0, n_iter, body, dist)
    # Nav2 semantics: LETHAL at the obstacle AND anywhere within the robot's
    # inscribed radius (robot center there = collision), exponential decay
    # beyond (cost_scaling 3.0) out to the inflation radius.
    cost = 98.0 * jnp.exp(
        -cfg.cost_scaling * jnp.maximum(dist - cfg.inscribed_radius, 0.0))
    cost = jnp.where(dist <= cfg.inscribed_radius, 99.0, cost)
    return jnp.where(dist <= cfg.inflation_radius + cfg.inscribed_radius,
                     cost, 0.0).astype(jnp.float32)
