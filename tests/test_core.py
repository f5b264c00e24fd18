import jax.numpy as jnp
import numpy as np
import pytest

from nclt_slam_tpu.core import (
    mat_to_quat,
    quat_from_yaw,
    quat_mul,
    quat_rotate,
    quat_to_mat,
    quat_to_yaw,
    se2_apply,
    se2_compose,
    se2_from_xytheta,
    se2_inverse,
    se3_apply,
    se3_compose,
    se3_from_rt,
    se3_inverse,
    so3_exp,
    so3_log,
    wrap_angle,
)


def rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_wrap_angle():
    assert np.allclose(wrap_angle(jnp.pi + 0.1), -jnp.pi + 0.1, atol=1e-6)
    assert np.allclose(wrap_angle(-3 * jnp.pi), jnp.pi, atol=1e-5)


def test_se2_roundtrip():
    rng = np.random.RandomState(0)
    a = se2_from_xytheta(*rng.normal(size=3))
    b = se2_from_xytheta(*rng.normal(size=3))
    ab = se2_compose(a, b)
    b2 = se2_compose(se2_inverse(a), ab)
    assert np.allclose(b2, b, atol=1e-5)
    ident = se2_compose(a, se2_inverse(a))
    assert np.allclose(ident, np.zeros(3), atol=1e-5)


def test_se2_apply_matches_matrix():
    a = se2_from_xytheta(1.0, -2.0, 0.7)
    pt = jnp.array([3.0, 4.0])
    c, s = np.cos(0.7), np.sin(0.7)
    expected = np.array([1.0 + c * 3 - s * 4, -2.0 + s * 3 + c * 4])
    assert np.allclose(se2_apply(a, pt), expected, atol=1e-5)


def test_quat_vs_scipy():
    scipy_rot = pytest.importorskip("scipy.spatial.transform").Rotation
    rng = np.random.RandomState(1)
    q = rand_quat(rng, (16,))
    R_ours = np.asarray(quat_to_mat(jnp.asarray(q, jnp.float32)))
    R_sp = scipy_rot.from_quat(q).as_matrix()
    assert np.allclose(R_ours, R_sp, atol=1e-5)

    v = rng.normal(size=(16, 3))
    assert np.allclose(
        np.asarray(quat_rotate(jnp.asarray(q, jnp.float32), jnp.asarray(v, jnp.float32))),
        scipy_rot.from_quat(q).apply(v), atol=1e-4)

    # mat -> quat roundtrip (sign-canonicalized)
    q2 = np.asarray(mat_to_quat(jnp.asarray(R_sp, jnp.float32)))
    dots = np.abs((q2 * q).sum(-1))
    assert np.allclose(dots, 1.0, atol=1e-4)


def test_quat_yaw():
    q = quat_from_yaw(jnp.array(0.9))
    assert np.allclose(quat_to_yaw(q), 0.9, atol=1e-6)


def test_so3_exp_log_roundtrip():
    rng = np.random.RandomState(2)
    r = rng.normal(size=(8, 3)) * 0.5
    q = so3_exp(jnp.asarray(r, jnp.float32))
    r2 = so3_log(q)
    assert np.allclose(r2, r, atol=1e-4)
    # tiny-angle branch
    tiny = jnp.asarray([[1e-10, 0, 0]], jnp.float32)
    assert np.allclose(so3_log(so3_exp(tiny)), tiny, atol=1e-6)


def test_quat_mul_matches_rotation_compose():
    scipy_rot = pytest.importorskip("scipy.spatial.transform").Rotation
    rng = np.random.RandomState(3)
    q1, q2 = rand_quat(rng), rand_quat(rng)
    ours = np.asarray(quat_mul(jnp.asarray(q1, jnp.float32), jnp.asarray(q2, jnp.float32)))
    sp = (scipy_rot.from_quat(q1) * scipy_rot.from_quat(q2)).as_quat()
    assert np.allclose(np.abs(np.dot(ours, sp)), 1.0, atol=1e-5)


def test_se3_roundtrip():
    rng = np.random.RandomState(4)
    q = rand_quat(rng)
    R = np.asarray(quat_to_mat(jnp.asarray(q, jnp.float32)))
    t = rng.normal(size=3).astype(np.float32)
    T = se3_from_rt(jnp.asarray(R), jnp.asarray(t))
    Ti = se3_inverse(T)
    assert np.allclose(se3_compose(T, Ti), np.eye(4), atol=1e-5)
    p = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    p2 = se3_apply(Ti, se3_apply(T, p))
    assert np.allclose(p2, p, atol=1e-5)
