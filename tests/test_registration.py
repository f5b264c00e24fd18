"""FPFH + RANSAC global registration (loop_closure.py:15-207 equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np

from nclt_slam_tpu.datasets.slam.registration import (
    estimate_normals,
    fpfh,
    register_loop,
    ransac_registration,
)


def structured_cloud(rng, n=256):
    """A cloud with orientation-distinct structure: ground strip + two
    walls + a few pillars (so FPFH features are informative)."""
    pts = []
    pts.append(np.column_stack([rng.uniform(-8, 8, n // 4),
                                rng.uniform(-8, 8, n // 4),
                                rng.normal(0, 0.02, n // 4)]))
    pts.append(np.column_stack([rng.uniform(-8, 8, n // 4),
                                np.full(n // 4, 5.0) + rng.normal(0, 0.02, n // 4),
                                rng.uniform(0, 3, n // 4)]))
    pts.append(np.column_stack([np.full(n // 4, -6.0) + rng.normal(0, 0.02, n // 4),
                                rng.uniform(-8, 8, n // 4),
                                rng.uniform(0, 3, n // 4)]))
    for cx, cy in [(2, -3), (-2, 2), (5, 1), (0, -6)]:
        m = n // 16
        ang = rng.uniform(0, 2 * np.pi, m)
        pts.append(np.column_stack([cx + 0.3 * np.cos(ang),
                                    cy + 0.3 * np.sin(ang),
                                    rng.uniform(0, 2.5, m)]))
    pts = np.concatenate(pts)[:n].astype(np.float32)
    return pts


def se3(yaw, tx, ty, tz=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    return R, np.array([tx, ty, tz], np.float32)


def test_normals_on_plane():
    rng = np.random.RandomState(0)
    pts = np.column_stack([rng.uniform(-5, 5, 128), rng.uniform(-5, 5, 128),
                           np.zeros(128)]).astype(np.float32)
    n = np.asarray(estimate_normals(jnp.asarray(pts), jnp.ones(128, bool)))
    assert (np.abs(n[:, 2]) > 0.95).mean() > 0.9


def test_fpfh_descriptors_informative():
    """Ground points and wall points get separable descriptors."""
    rng = np.random.RandomState(1)
    pts = structured_cloud(rng)
    f = np.asarray(fpfh(jnp.asarray(pts), jnp.ones(len(pts), bool)))
    assert np.isfinite(f).all()
    ground = pts[:, 2] < 0.1
    wall = pts[:, 1] > 4.5
    if ground.sum() > 4 and wall.sum() > 4:
        d = np.linalg.norm(f[ground].mean(0) - f[wall].mean(0))
        assert d > 0.05, d


def test_ransac_recovers_transform():
    rng = np.random.RandomState(2)
    dst = structured_cloud(rng)
    R, t = se3(0.6, 3.0, -2.0)
    # src = dst points expressed in the src sensor frame: dst = R @ src + t
    src = ((dst - t) @ R).astype(np.float32)
    src += rng.normal(0, 0.02, src.shape).astype(np.float32)
    v = jnp.ones(len(dst), bool)
    R_est, t_est, n_inl, ok = jax.jit(ransac_registration)(
        jnp.asarray(src), v, jnp.asarray(dst), v, jax.random.PRNGKey(0))
    assert bool(ok), int(n_inl)
    err_t = np.linalg.norm(np.asarray(t_est) - t)
    err_R = np.rad2deg(np.arccos(np.clip(
        (np.trace(np.asarray(R_est) @ R.T) - 1) / 2, -1, 1)))
    assert err_t < 1.0, err_t
    assert err_R < 10.0, err_R


def test_register_loop_refines_to_cm():
    rng = np.random.RandomState(3)
    dst = structured_cloud(rng)
    R, t = se3(-0.4, 1.5, 2.5)
    src = ((dst - t) @ R).astype(np.float32)
    src += rng.normal(0, 0.01, src.shape).astype(np.float32)
    v = jnp.ones(len(dst), bool)
    res = jax.jit(register_loop)(jnp.asarray(src), v, jnp.asarray(dst), v,
                                 jax.random.PRNGKey(1))
    assert bool(res.ok)
    assert np.linalg.norm(np.asarray(res.t) - t) < 0.15
    yaw_est = np.arctan2(np.asarray(res.R)[1, 0], np.asarray(res.R)[0, 0])
    assert abs(yaw_est - (-0.4)) < 0.05


def test_register_loop_rejects_unrelated_scans():
    rng = np.random.RandomState(4)
    a = structured_cloud(rng)
    b = rng.uniform(-8, 8, a.shape).astype(np.float32)  # noise cloud
    v = jnp.ones(len(a), bool)
    res = jax.jit(register_loop)(jnp.asarray(a), v, jnp.asarray(b), v,
                                 jax.random.PRNGKey(2))
    # either RANSAC consensus or the ICP rmse gate must fail
    assert not bool(res.ok)
