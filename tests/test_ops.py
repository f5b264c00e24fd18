"""Pallas kernels vs XLA reference implementations."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nclt_slam_tpu.config import DEFAULT
from nclt_slam_tpu.ops.wavefront_pallas import BIG, wavefront_potential_pallas
from nclt_slam_tpu.planning.wavefront import _neighbor_min, plan_window


def test_pallas_wavefront_matches_xla():
    rng = np.random.RandomState(0)
    W = 64
    cost = rng.uniform(0.1, 1.0, (W, W)).astype(np.float32)
    cost[20:25, 10:50] = BIG  # a wall
    phi0 = np.full((W, W), BIG, np.float32)
    phi0[5, 5] = 0.0

    n_iter = 2 * W
    tc = jnp.asarray(cost)
    p0 = jnp.asarray(phi0)

    def xla_ref(tc, phi):
        def body(_, p):
            return jnp.minimum(p, _neighbor_min(p, tc, 1.4142135))
        return jax.lax.fori_loop(0, n_iter, body, phi)

    ref = np.asarray(jax.jit(xla_ref)(tc, p0))
    out = np.asarray(wavefront_potential_pallas(
        tc, p0, n_iter=n_iter, res=0.1, interpret=True))
    live = ref < BIG / 2
    assert live.sum() > W * W * 0.5
    assert np.allclose(out[live], ref[live], rtol=1e-5, atol=1e-3)
    # wall stays unreachable-expensive
    assert (out[22, 20:40] > BIG / 2).all()


def test_plan_window_pallas_path():
    """plan_window with the pallas kernel produces a working path."""
    cfg = dataclasses.replace(DEFAULT.planner, window=64, path_len=96,
                              use_pallas=True)
    W = 64
    cost = jnp.zeros((W, W))
    cost = cost.at[30:34, 8:56].set(99.0)  # lethal wall with gaps at edges
    res = plan_window(cost, (jnp.int32(10), jnp.int32(32)),
                      (jnp.int32(54), jnp.int32(32)), DEFAULT.map, cfg)
    assert bool(res.ok)
    path = np.asarray(res.path_xy[: int(res.n_path)])
    # path must route around the wall, not through it
    for r, c in path:
        assert not (30 <= r < 34 and 8 <= c < 56), (r, c)
    assert int(res.n_path) > 40


# ---------------------------------------------------------------------------
# fused Hamming cross-check kernel (ops/hamming_pallas.py)
# ---------------------------------------------------------------------------


def test_pallas_cross_check_matches_xla():
    """Exact agreement of the fused MXU Hamming matcher with the XLA path
    (sensors/features.cross_check_match) across shapes, including shared
    rows, invalid slots, and non-tile-aligned sizes."""
    from nclt_slam_tpu.ops.hamming_pallas import cross_check_pallas
    from nclt_slam_tpu.sensors.features import hamming

    rng = np.random.RandomState(7)
    for A, B in ((96, 192), (128, 96), (192, 384), (7, 5), (192, 192)):
        W = 8
        da = jnp.asarray(rng.randint(
            0, 2 ** 32, (A, W), dtype=np.uint64).astype(np.uint32))
        dbn = rng.randint(0, 2 ** 32, (B, W), dtype=np.uint64).astype(np.uint32)
        nsh = min(A, B) // 2
        dbn[:nsh] = np.asarray(da)[rng.permutation(A)[:nsh]]
        db = jnp.asarray(dbn)
        va = jnp.asarray(rng.rand(A) > 0.2)
        vb = jnp.asarray(rng.rand(B) > 0.2)

        # XLA reference path, inlined (cross_check_match itself dispatches
        # to the kernel on TPU)
        h = hamming(da, db)
        big = jnp.int32(10 ** 6)
        h = jnp.where(va[:, None] & vb[None, :], h, big)
        best_ab = jnp.argmin(h, axis=1)
        best_ba = jnp.argmin(h, axis=0)
        aidx = jnp.arange(A)
        mutual = best_ba[best_ab] == aidx
        best_d = h[aidx, best_ab]
        matched = mutual & (best_d <= 64)

        interp = jax.default_backend() != "tpu"
        mi, mo, dd = cross_check_pallas(da, va, db, vb, max_dist=64,
                                        interpret=interp)
        assert np.array_equal(np.asarray(best_ab), np.asarray(mi)), (A, B)
        assert np.array_equal(np.asarray(matched), np.asarray(mo)), (A, B)
        assert np.array_equal(np.asarray(best_d), np.asarray(dd)), (A, B)


def test_pallas_cross_check_vmap():
    """The matcher vmaps cross-check over candidates; the kernel must agree
    under vmap too."""
    from nclt_slam_tpu.ops.hamming_pallas import cross_check_pallas
    from nclt_slam_tpu.sensors.features import hamming

    rng = np.random.RandomState(3)
    C, A, B, W = 5, 96, 192, 8
    da = jnp.asarray(rng.randint(
        0, 2 ** 32, (C, A, W), dtype=np.uint64).astype(np.uint32))
    db = jnp.asarray(rng.randint(
        0, 2 ** 32, (B, W), dtype=np.uint64).astype(np.uint32))
    va = jnp.asarray(rng.rand(C, A) > 0.2)
    vb = jnp.asarray(rng.rand(B) > 0.2)

    interp = jax.default_backend() != "tpu"
    mi, mo, dd = jax.vmap(
        lambda d, v: cross_check_pallas(d, v, db, vb, max_dist=64,
                                        interpret=interp))(da, va)

    for c in range(C):
        h = hamming(da[c], db)
        big = jnp.int32(10 ** 6)
        h = jnp.where(va[c][:, None] & vb[None, :], h, big)
        best_ab = jnp.argmin(h, axis=1)
        best_ba = jnp.argmin(h, axis=0)
        aidx = jnp.arange(A)
        matched = (best_ba[best_ab] == aidx) & (h[aidx, best_ab] <= 64)
        assert np.array_equal(np.asarray(best_ab), np.asarray(mi[c]))
        assert np.array_equal(np.asarray(matched), np.asarray(mo[c]))
