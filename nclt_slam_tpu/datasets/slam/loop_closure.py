"""Loop closure: ScanContext descriptors + 2-D pose-graph optimization.

Capability match for datasets/nclt/src/slam/loop_closure.py: the polar
ScanContext descriptor (60 azimuth sectors x 20 range rings) with
rotation-invariant ring-shift matching, a GPS-gated candidate search, and
the custom damped Gauss-Newton 2-D pose-graph optimizer (odометry weight 1,
loop-closure weight 10 — PoseGraphOptimizer2D.optimize:136)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

N_SECTORS = 60
N_RINGS = 20
MAX_RANGE = 80.0


def scan_context(pts, valid, n_sectors: int = N_SECTORS,
                 n_rings: int = N_RINGS, max_range: float = MAX_RANGE):
    """Polar max-height descriptor (n_rings, n_sectors) of a scan."""
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    rng = jnp.hypot(x, y)
    ang = jnp.arctan2(y, x)  # [-pi, pi)
    ring = jnp.clip((rng / max_range * n_rings).astype(jnp.int32),
                    0, n_rings - 1)
    sector = jnp.clip(((ang + jnp.pi) / (2 * jnp.pi) * n_sectors)
                      .astype(jnp.int32), 0, n_sectors - 1)
    flat = ring * n_sectors + sector
    ok = valid & (rng < max_range)
    desc = jnp.full(n_rings * n_sectors, -jnp.inf)
    desc = desc.at[jnp.where(ok, flat, 0)].max(jnp.where(ok, z, -jnp.inf))
    desc = jnp.where(jnp.isfinite(desc), desc, 0.0)
    return desc.reshape(n_rings, n_sectors)


def sc_distance(d1, d2):
    """Rotation-invariant ScanContext distance: min over column shifts of
    the whole-descriptor cosine distance (reference distance_rot,
    loop_closure.py:49-64 — flattened dot product, so empty cells
    contribute nothing instead of counting as full mismatch)."""
    v1 = d1.reshape(-1)
    n1 = jnp.linalg.norm(v1)
    v1n = v1 / jnp.maximum(n1, 1e-6)

    def shift_dist(shift):
        v2 = jnp.roll(d2, shift, axis=1).reshape(-1)
        n2 = jnp.linalg.norm(v2)
        return jnp.where(n2 < 1e-6, 1.0,
                         1.0 - v1n @ (v2 / jnp.maximum(n2, 1e-6)))

    dists = jax.vmap(shift_dist)(jnp.arange(d1.shape[1]))
    dists = jnp.where(n1 < 1e-6, jnp.ones_like(dists), dists)
    return dists.min(), jnp.argmin(dists)


def detect_loops(descs, positions, valid, min_gap: int = 50,
                 gps_radius: float = 10.0, sc_thresh: float = 0.25,
                 max_loops: int = 32):
    """GPS-gated loop detection over a batch of descriptors.

    descs (K, R, S), positions (K, 2).  Returns fixed-size arrays
    (i_idx, j_idx, found) of up to ``max_loops`` loop pairs (best-first)."""
    K = descs.shape[0]
    d_pos = jnp.linalg.norm(positions[:, None] - positions[None, :], axis=-1)
    gap = jnp.abs(jnp.arange(K)[:, None] - jnp.arange(K)[None, :])
    cand = (d_pos < gps_radius) & (gap > min_gap) & \
        valid[:, None] & valid[None, :]
    cand = jnp.triu(cand)  # i < j only

    def pair_dist(i, j):
        d, _ = sc_distance(descs[i], descs[j])
        return d

    ii, jj = jnp.meshgrid(jnp.arange(K), jnp.arange(K), indexing="ij")
    dists = jax.vmap(jax.vmap(
        lambda i, j, c: jnp.where(c, pair_dist(i, j), jnp.inf)))(
        ii, jj, cand)
    flat = dists.reshape(-1)
    order = jnp.argsort(flat)[:max_loops]
    found = jnp.isfinite(flat[order]) & (flat[order] < sc_thresh)
    return order // K, order % K, found


def ring_key(desc):
    """Rotation-invariant ring key: per-ring mean occupancy (R,) — the
    ScanContext paper's first-stage search key.  Column shifts permute
    sectors within a ring, so the ring mean is shift-invariant."""
    return desc.mean(axis=-1)


def detect_loops_scalable(descs, positions, valid, min_gap: int = 50,
                          gps_radius: float = 10.0, sc_thresh: float = 0.25,
                          max_loops: int = 32, shortlist: int = 256):
    """Two-stage loop detection for long sessions (the K^2 full-descriptor
    sweep in detect_loops costs ~1 MFLOP/pair — hopeless at K >= 2000).

    Stage 1: ring-key L1 distance over all gated pairs (one (K, K, R)
    reduction — cheap).  Stage 2: full rotation-search ScanContext distance
    on only the ``shortlist`` best candidates.  Same thresholds/semantics
    as detect_loops; identical results whenever the shortlist covers the
    true candidates.
    """
    K = descs.shape[0]
    d_pos = jnp.linalg.norm(positions[:, None] - positions[None, :], axis=-1)
    gap = jnp.abs(jnp.arange(K)[:, None] - jnp.arange(K)[None, :])
    cand = (d_pos < gps_radius) & (gap > min_gap) & \
        valid[:, None] & valid[None, :]
    cand = jnp.triu(cand)

    keys = ring_key(descs)                                    # (K, R)
    key_d = jnp.abs(keys[:, None, :] - keys[None, :, :]).mean(-1)
    key_d = jnp.where(cand, key_d, jnp.inf)

    flat = key_d.reshape(-1)
    short = jnp.argsort(flat)[:shortlist]                     # best ring-keys
    si, sj = short // K, short % K
    s_ok = jnp.isfinite(flat[short])

    def full_dist(i, j, ok):
        d, _ = sc_distance(descs[i], descs[j])
        return jnp.where(ok, d, jnp.inf)

    dists = jax.vmap(full_dist)(si, sj, s_ok)                 # (shortlist,)
    order = jnp.argsort(dists)[:max_loops]
    found = jnp.isfinite(dists[order]) & (dists[order] < sc_thresh)
    return si[order], sj[order], found


class PoseGraph2D(NamedTuple):
    """Fixed-size 2-D pose graph: K poses, E odometry edges (chain) and
    L loop edges."""

    poses: jax.Array      # (K, 3) x, y, theta
    odo_meas: jax.Array   # (K-1, 3) relative measurements
    loop_i: jax.Array     # (L,)
    loop_j: jax.Array     # (L,)
    loop_meas: jax.Array  # (L, 3)
    loop_valid: jax.Array  # (L,)


def _rel_residual(pi, pj, meas):
    """SE(2) relative residual between poses pi -> pj vs measurement."""
    c, s = jnp.cos(pi[2]), jnp.sin(pi[2])
    dx = pj[0] - pi[0]
    dy = pj[1] - pi[1]
    rx = c * dx + s * dy - meas[0]
    ry = -s * dx + c * dy - meas[1]
    rt = jnp.arctan2(jnp.sin(pj[2] - pi[2] - meas[2]),
                     jnp.cos(pj[2] - pi[2] - meas[2]))
    return jnp.array([rx, ry, rt])


def optimize_pose_graph(graph: PoseGraph2D, iters: int = 20,
                        odo_w: float = 1.0, lc_w: float = 10.0,
                        damping: float = 1e-3) -> jax.Array:
    """Damped GN over the full 2-D pose graph (custom optimizer port:
    odom_w=1, lc_w=10, first pose pinned).  Returns optimized poses (K, 3).

    Dense (3K x 3K) normal equations — at the reference's scale (a few
    hundred keyframes) that is a small MXU solve per iteration."""
    K = graph.poses.shape[0]

    def residual_all(poses_flat):
        poses = poses_flat.reshape(K, 3)
        r_odo = jax.vmap(_rel_residual)(
            poses[:-1], poses[1:], graph.odo_meas).reshape(-1)
        r_lc = jax.vmap(_rel_residual)(
            poses[graph.loop_i], poses[graph.loop_j],
            graph.loop_meas)
        r_lc = (r_lc * graph.loop_valid[:, None]).reshape(-1)
        r_prior = poses[0] - graph.poses[0]
        return jnp.concatenate([
            jnp.sqrt(odo_w) * r_odo,
            jnp.sqrt(lc_w) * r_lc,
            100.0 * r_prior,
        ])

    def gn(poses_flat, _):
        r = residual_all(poses_flat)
        J = jax.jacfwd(residual_all)(poses_flat)
        H = J.T @ J + damping * jnp.eye(3 * K)
        g = J.T @ r
        return poses_flat - jnp.linalg.solve(H, g), (r ** 2).sum()

    flat, costs = jax.lax.scan(gn, graph.poses.reshape(-1), None,
                               length=iters)
    return flat.reshape(K, 3)
