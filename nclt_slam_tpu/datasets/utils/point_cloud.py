"""Point-cloud utilities (datasets/nclt_kaggle/src/utils/point_cloud.py):
fixed-shape voxel downsampling, transforms, cropping — all jittable."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_points(pts, T):
    """Apply 4x4 transform to (N, 3) points."""
    return pts @ T[:3, :3].T + T[:3, 3]


def voxel_downsample(pts, valid, voxel: float, out_cap: int, bound: float = 200.0):
    """Fixed-shape voxel-grid downsample: keep (up to ``out_cap``) the first
    valid point of each occupied voxel.  Deterministic, jittable."""
    key_int = jnp.floor((pts + bound) / voxel).astype(jnp.int64)
    dims = int(2 * bound / voxel) + 1
    h = (key_int[:, 0] * dims + key_int[:, 1]) * dims + key_int[:, 2]
    h = jnp.where(valid, h, jnp.int64(-1))
    order = jnp.argsort(h)
    h_sorted = h[order]
    first = jnp.concatenate([jnp.array([True]), h_sorted[1:] != h_sorted[:-1]])
    keep = first & (h_sorted >= 0)
    # compact kept points to the front, pad with zeros
    rank = jnp.cumsum(keep) - 1
    out = jnp.zeros((out_cap, 3), pts.dtype)
    out_valid = jnp.zeros(out_cap, bool)
    write_idx = jnp.where(keep, jnp.minimum(rank, out_cap - 1), out_cap - 1)
    src = pts[order]
    out = out.at[write_idx].set(jnp.where(keep[:, None], src, 0.0))
    out_valid = out_valid.at[write_idx].max(keep)
    return out, out_valid


def crop_box(pts, valid, lo, hi):
    """Validity mask restricted to an axis-aligned box."""
    inside = jnp.all((pts >= jnp.asarray(lo)) & (pts <= jnp.asarray(hi)), -1)
    return valid & inside


def estimate_normals_knn(pts, valid, k: int = 8):
    """Per-point normals from the k-NN covariance (brute-force neighbors,
    fixed shapes) — feeds point-to-plane ICP."""
    d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    d2 = jnp.where(valid[None, :], d2, jnp.inf)
    idx = jnp.argsort(d2, axis=1)[:, :k]           # (N, k)
    nbrs = pts[idx]                                 # (N, k, 3)
    mu = nbrs.mean(1, keepdims=True)
    C = jnp.einsum("nki,nkj->nij", nbrs - mu, nbrs - mu) / k
    w, v = jnp.linalg.eigh(C)
    n = v[..., 0]                                   # smallest eigenvector
    # orient upward-ish for determinism
    n = n * jnp.where(n[:, 2:3] < 0, -1.0, 1.0)
    return n
