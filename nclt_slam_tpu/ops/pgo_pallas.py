"""Fused Pallas TPU kernel for reduced 2-D pose-graph optimization.

Companion to ops/ba_pallas.py (the sliding-window BA kernel): the same
fused-solver design — analytic Jacobians, normal equations, dense solve and
state update all VMEM-resident inside ONE launch, iterated ``iters`` times —
pointed at the km-scale SLAM backend.  The production path is
datasets/slam/loop_closure.optimize_pose_graph_fast: a 2000-pose session
reduces to the ``Kr <= 2 + 2L`` loop-junction poses (host-side exact chain
marginalization), this kernel solves the reduced graph, and the interior
poses are recovered in closed form.  The XLA alternative at the full shape
(jacfwd over a 6000-dim flat vector + dense LU per iteration) materializes
a ~145 MB Jacobian per iteration; bench.py's ``pgo`` roofline line measures
both paths.

Capability reference: the reference's custom 2-D pose-graph optimizer
(datasets/nclt/src/slam/loop_closure.py:136, damped GN, odom weight 1,
loop weight 10, first pose pinned) — same semantics, TPU-shaped.

Variable layout is component-major: the reduced state is three (KP, 1)
sublane columns (x, y, theta), chain-edge structure becomes diagonal /
off-diagonal iota masks on (KP, KP) blocks, and loop edges enter through
one-hot selector matmuls (no scatters, no gathers — MXU/VPU only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nclt_slam_tpu.ops.ba_pallas import _gauss_jordan

TWO_PI = 6.283185307179586


def _wrap(a):
    """Angle wrap to (-pi, pi] without atan2 (unsupported in Mosaic)."""
    return a - TWO_PI * jnp.floor((a + 0.5 * TWO_PI) / TWO_PI)


def _pgo_kernel(poses_ref, odo_ref, odow_ref, si_ref, sj_ref, lmeas_ref,
                lw_ref, dpr_ref, out_ref, *, n_iter: int, damping: float):
    KP = poses_ref.shape[0]
    N = 3 * KP

    x0 = poses_ref[:, 0:1]                   # (KP, 1)
    y0 = poses_ref[:, 1:2]
    t0 = poses_ref[:, 2:3]
    mx = odo_ref[:, 0:1]                     # (KP, 1); row e = edge e->e+1
    my = odo_ref[:, 1:2]
    mt = odo_ref[:, 2:3]
    w_e = odow_ref[:, 0:1]                   # (KP, 1), last row 0
    S_i = si_ref[:]                          # (L, KP) one-hot loop starts
    S_j = sj_ref[:]                          # (L, KP)
    lmx = lmeas_ref[:, 0:1]                  # (L, 1)
    lmy = lmeas_ref[:, 1:2]
    lmt = lmeas_ref[:, 2:3]
    w_l = lw_ref[:, 0:1]                     # (L, 1) lc_w * valid
    # per-pose diagonal prior: gauge pin on pose 0 + unit pins on padded
    # poses (padded rows must NOT couple to real poses — a damped dangling
    # chain of 100+ padded poses otherwise acts as a soft position anchor
    # on the last real pose and visibly shrinks its correction)
    pr = dpr_ref[:, 0:1]                     # (KP, 1)

    sub = jax.lax.broadcasted_iota(jnp.int32, (KP, KP), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (KP, KP), 1)
    shift_next = (lane == sub + 1).astype(jnp.float32)   # M @ v -> v[k+1]
    on_diag = sub == lane
    on_super = lane == sub + 1

    HI = jax.lax.Precision.HIGHEST

    def nxt(v):
        """(KP, 1) -> shifted (KP, 1): out[k] = v[k+1] (last row junk)."""
        return jax.lax.dot_general(shift_next, v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=HI)

    def diag(v):
        return jnp.where(on_diag, v, 0.0)          # (KP,1) bcast over lanes

    def superd(v):
        return jnp.where(on_super, v, 0.0)         # M[e, e+1] = v[e]

    def subd(v):
        # M[e+1, e] = v[e]: transpose of superd — build via shifted diag
        return jnp.where(sub == lane + 1,
                         jax.lax.dot_general(
                             shift_next.T, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=HI), 0.0)

    def sel(S, v):
        """(L, KP) @ (KP, 1) -> (L, 1): value at each loop endpoint."""
        return jax.lax.dot_general(S, v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=HI)

    def scat(S, v):
        """(KP, L) <- S^T @ v: scatter per-loop values to pose rows."""
        return jax.lax.dot_general(S.T, v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=HI)

    def cross(Sa, va, Sb):
        """sum_e va[e] * Sa[e]^T Sb[e] -> (KP, KP) via one MXU matmul."""
        return jax.lax.dot_general(Sa.T * va.T, Sb,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=HI)

    def gn_step(_, carry):
        x, y, t = carry
        # ---- chain residuals (row e = edge e -> e+1; last row masked) ----
        xn, yn, tn = nxt(x), nxt(y), nxt(t)
        c, s = jnp.cos(t), jnp.sin(t)
        dx, dy = xn - x, yn - y
        Rx = c * dx + s * dy
        Ry = -s * dx + c * dy
        rx = Rx - mx
        ry = Ry - my
        rt = _wrap(tn - t - mt)

        # Jacobian entries (per edge, all (KP, 1)):
        #  rx: d/xi=-c  d/yi=-s  d/ti=Ry   d/xj=c  d/yj=s
        #  ry: d/xi=s   d/yi=-c  d/ti=-Rx  d/xj=-s d/yj=c
        #  rt: d/ti=-1  d/tj=1
        # ---- H blocks (component-major 3x3 grid of (KP, KP)) ----
        # xx: w*(c*c + s*s) = w at (i,i),(j,j); -w at (i,j),(j,i)
        w = w_e
        H_xx = diag(w + _shift_down_diag(w, shift_next)) \
            + superd(-w) + subd(-w)
        H_yy = H_xx
        # xy: rx,ry cross terms: (i,i): (-c)(s)+(s)(-c) = -2cs + ... compute
        # explicitly: sum_r Jx_r * Jy_r per placement
        # (i,i): (-c)(s) + (s)(-c) = -2*c*s?  No: residual-major —
        #   Jxi(rx)=-c, Jyi(rx)=-s ; Jxi(ry)=s, Jyi(ry)=-c
        #   H_xy(i,i) = (-c)(-s) + (s)(-c) = cs - sc = 0
        #   H_xy(i,j) = (-c)(s) + (s)(c) = 0 ; likewise 0 everywhere
        H_xy = jnp.zeros_like(H_xx)
        # xt: H_xt(i,i) = (-c)(Ry) + (s)(-Rx); H_xt(j,i) = (c)(Ry) + (-s)(-Rx)
        a_xt = w * (-c * Ry - s * Rx)
        H_xt = diag(a_xt) + subd(-a_xt)
        # yt: H_yt(i,i) = (-s)(Ry) + (-c)(-Rx); H_yt(j,i) = (s)(Ry) + (c)(-Rx)
        a_yt = w * (-s * Ry + c * Rx)
        H_yt = diag(a_yt) + subd(-a_yt)
        # tt: rx,ry couple ti only (Jtj = 0); rt couples (ti, tj) = (-1, 1)
        # -> (i,i) w*(Ry^2 + Rx^2 + 1), (j,j) w, (i,j) = (j,i) = -w
        a_tt = w * (Ry * Ry + Rx * Rx + 1.0)
        H_tt = diag(a_tt + _shift_down_diag(w, shift_next)) \
            + superd(-w) + subd(-w)
        # g chain: g = J^T r per component
        g_x = w * (-c * rx + s * ry) + _shift_down(
            w * (c * rx - s * ry), shift_next)
        g_y = w * (-s * rx - c * ry) + _shift_down(
            w * (s * rx + c * ry), shift_next)
        g_t = w * (Ry * rx - Rx * ry - rt) + _shift_down(w * rt, shift_next)

        # ---- loop residuals ----
        xi, yi, ti = sel(S_i, x), sel(S_i, y), sel(S_i, t)
        xj, yj, tj = sel(S_j, x), sel(S_j, y), sel(S_j, t)
        cl, sl = jnp.cos(ti), jnp.sin(ti)
        ldx, ldy = xj - xi, yj - yi
        LRx = cl * ldx + sl * ldy
        LRy = -sl * ldx + cl * ldy
        lrx = LRx - lmx
        lry = LRy - lmy
        lrt = _wrap(tj - ti - lmt)

        wl = w_l
        # block contributions via one-hot matmuls
        H_xx = H_xx + cross(S_i, wl, S_i) + cross(S_j, wl, S_j) \
            - cross(S_i, wl, S_j) - cross(S_j, wl, S_i)
        H_yy = H_yy + cross(S_i, wl, S_i) + cross(S_j, wl, S_j) \
            - cross(S_i, wl, S_j) - cross(S_j, wl, S_i)
        la_xt = wl * (-cl * LRy - sl * LRx)
        H_xt = H_xt + cross(S_i, la_xt, S_i) - cross(S_j, la_xt, S_i)
        la_yt = wl * (-sl * LRy + cl * LRx)
        H_yt = H_yt + cross(S_i, la_yt, S_i) - cross(S_j, la_yt, S_i)
        la_tt = wl * (LRy * LRy + LRx * LRx + 1.0)
        H_tt = H_tt + cross(S_i, la_tt, S_i) + cross(S_j, wl, S_j) \
            - cross(S_i, wl, S_j) - cross(S_j, wl, S_i)
        g_x = g_x + scat(S_i, wl * (-cl * lrx + sl * lry)) \
            + scat(S_j, wl * (cl * lrx - sl * lry))
        g_y = g_y + scat(S_i, wl * (-sl * lrx - cl * lry)) \
            + scat(S_j, wl * (sl * lrx + cl * lry))
        g_t = g_t + scat(S_i, wl * (LRy * lrx - LRx * lry - lrt)) \
            + scat(S_j, wl * lrt)

        # ---- diagonal priors (gauge + padded-pose pins) + damping ----
        H_xx = H_xx + diag(pr + damping)
        H_yy = H_yy + diag(pr + damping)
        H_tt = H_tt + diag(pr + damping)
        g_x = g_x + pr * (x - x0)
        g_y = g_y + pr * (y - y0)
        g_t = g_t + pr * (t - t0)

        # ---- assemble (N, N), solve, update ----
        H = jnp.concatenate([
            jnp.concatenate([H_xx, H_xy, H_xt], axis=1),
            jnp.concatenate([H_xy.T, H_yy, H_yt], axis=1),
            jnp.concatenate([H_xt.T, H_yt.T, H_tt], axis=1)], axis=0)
        g = jnp.concatenate([g_x, g_y, g_t], axis=0)     # (N, 1)
        dp = _gauss_jordan(H, -g, N)
        return (x + dp[0:KP], y + dp[KP:2 * KP], t + dp[2 * KP:3 * KP])

    x, y, t = jax.lax.fori_loop(0, n_iter, gn_step, (x0, y0, t0))
    out_ref[:] = jnp.concatenate([x, y, t], axis=1)


def _shift_down(v, shift_next):
    """(KP, 1) -> out[k] = v[k-1] (row 0 zero)."""
    return jax.lax.dot_general(shift_next.T, v, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _shift_down_diag(v, shift_next):
    """Convenience: shifted (KP, 1) for diagonal accumulation at (j, j)."""
    return _shift_down(v, shift_next)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def optimize_pgo_pallas(graph, odo_w, iters: int = 15, lc_w: float = 10.0,
                        damping: float = 1e-3, prior_w: float = 1e4,
                        interpret: bool | None = None):
    """Solve a (reduced) PoseGraph2D with the fused kernel.

    Pads the pose count to a lane-friendly KP (3*KP multiple of 128 — the
    padded tail poses hang off the last real pose through zero-measurement
    unit-weight edges, which adds no information to real poses).  Returns
    optimized poses (K, 3) as a numpy-convertible jax array.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    poses = np.asarray(graph.poses, np.float32)
    K = len(poses)
    KP = max(128, _round_up(K, 128))
    L = int(np.asarray(graph.loop_i).shape[0])
    LP = max(8, _round_up(L, 8))

    poses_p = np.concatenate(
        [poses, np.tile(poses[-1:], (KP - K, 1))], axis=0)
    odo_p = np.zeros((KP, 3), np.float32)
    odo_p[: K - 1] = np.asarray(graph.odo_meas, np.float32)
    # padded edges carry ZERO weight (padded poses are pinned by dpr
    # instead — see the kernel comment on dangling-chain anchoring)
    w_p = np.zeros((KP, 1), np.float32)
    w_p[: K - 1, 0] = np.broadcast_to(np.asarray(odo_w, np.float32), (K - 1,))
    dpr = np.zeros((KP, 1), np.float32)
    dpr[0, 0] = prior_w
    dpr[K:, 0] = 1.0

    li = np.asarray(graph.loop_i, np.int64)
    lj = np.asarray(graph.loop_j, np.int64)
    S_i = np.zeros((LP, KP), np.float32)
    S_j = np.zeros((LP, KP), np.float32)
    S_i[np.arange(L), np.clip(li, 0, KP - 1)] = 1.0
    S_j[np.arange(L), np.clip(lj, 0, KP - 1)] = 1.0
    lmeas_p = np.zeros((LP, 3), np.float32)
    lmeas_p[:L] = np.asarray(graph.loop_meas, np.float32)
    lw_p = np.zeros((LP, 1), np.float32)
    lw_p[:L, 0] = lc_w * np.asarray(graph.loop_valid, np.float32)

    kern = functools.partial(_pgo_kernel, n_iter=iters, damping=damping)

    def vspec(shape):
        return pl.BlockSpec(shape, lambda: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        in_specs=[vspec((KP, 3)), vspec((KP, 3)), vspec((KP, 1)),
                  vspec((LP, KP)), vspec((LP, KP)), vspec((LP, 3)),
                  vspec((LP, 1)), vspec((KP, 1))],
        out_specs=vspec((KP, 3)),
        out_shape=jax.ShapeDtypeStruct((KP, 3), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(poses_p), jnp.asarray(odo_p), jnp.asarray(w_p),
      jnp.asarray(S_i), jnp.asarray(S_j), jnp.asarray(lmeas_p),
      jnp.asarray(lw_p), jnp.asarray(dpr))
    return out[:K]
