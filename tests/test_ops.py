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
