"""Fused Pallas TPU kernel for batched sliding-window bundle adjustment.

``solve_ba`` (vio/ba.py) is the flagship solver, but its XLA lowering is
latency/bandwidth-bound at window scale: every GN iteration materializes
(K, P, 3, 6) Jacobian tensors whose 6-wide lane dimension pads 21x on TPU
tiles, each of the ~100 small ops per iteration round-trips HBM, and the
(6K, 6K) Cholesky lowers to a sequential loop — the round-2 roofline
measured 0.01-0.03 % MFU (BENCH_r02.json ba_sweep).

This kernel runs the ENTIRE damped-GN solve — analytic reprojection
Jacobians, normal-equation blocks, landmark Schur complement, reduced
camera solve, back-substitution, and state update, iterated ``iters``
times — inside ONE Pallas launch per window (grid over the window batch),
with every intermediate VMEM-resident.  The layout is designed for the
hardware instead of translated from the math:

- the landmark axis P (padded to 128) is the LANE axis everywhere: the
  27 scalar Jacobian channels are (K, P) arrays, so all per-observation
  math is full-width VPU with zero padding waste;
- the Schur contractions S_corr = sum_m C_m @ B_m^T are (6K, P)x(P, 6K)
  MXU matmuls with P as the contraction axis;
- block placement into the reduced (6K, 6K) system uses a
  ``pltpu.repeat`` row-tiling + iota block masks — no scatters, no
  gathers, exact (no matmul rounding);
- the damped-SPD reduced system is solved by an in-kernel Gauss-Jordan
  sweep (6K pivot steps of one rank-1 update each) — sequential like any
  dense solve, but free of per-step dispatch cost.

Capability reference: ORB-SLAM3 local-mapping BA (SURVEY.md §2.3, hard
part #1 "sliding-window GN/LM BA in Pallas").  Agreement with the XLA
path (same damping, same iteration count) is asserted in
tests/test_ba_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nclt_slam_tpu.config import CameraConfig, VioConfig
from nclt_slam_tpu.core.quat import quat_mul, so3_exp

HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rot_cols(quat):
    """Quaternion (K, 4) -> the 9 rotation-matrix entries as (K, 1) arrays
    (row-major R[i][j]), computed component-wise so no (K, 3, 3) tensor
    with a 3-lane dim ever exists."""
    x, y, z, w = (quat[:, 0:1], quat[:, 1:2], quat[:, 2:3], quat[:, 3:4])
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 1e-12, 2.0 / jnp.maximum(n, 1e-12), 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    return ((1.0 - (yy + zz), xy - wz, xz + wy),
            (xy + wz, 1.0 - (xx + zz), yz - wx),
            (xz - wy, yz + wx, 1.0 - (xx + yy)))


def _qconj(q):
    """quat_conj without the captured [-1,-1,-1,1] constant array (Pallas
    kernels may not close over array constants)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:]], axis=-1)


def _asin(x):
    """arcsin on [0, 1) — Mosaic has no inverse-trig primitives, so seed
    with the Abramowitz-Stegun 4.4.45 minimax polynomial (|err| < 6.8e-5)
    and run two Newton steps on sin(y) = x (sin/cos ARE lowered), which
    lands below fp32 epsilon for x away from 1."""
    xs = jnp.clip(x, 0.0, 0.999999)
    p = (1.5707963 + xs * (-0.2145988 + xs * (0.0889789 + xs * (-0.0501743
         + xs * (0.0308918 + xs * (-0.0170881 + xs * (0.0066700
         + xs * -0.0012624)))))))
    y = 1.5707963268 - jnp.sqrt(1.0 - xs) * p
    for _ in range(2):
        y = y - (jnp.sin(y) - xs) / jnp.maximum(jnp.cos(y), 1e-6)
    return y


def _so3_log_k(q):
    """so3_log without atan2 (unsupported in Mosaic): for a (near-)unit
    quaternion canonicalized to w >= 0, atan2(|v|, w) == asin(|v|/|q|)."""
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    v = q[..., :3]
    n = jnp.linalg.norm(v, axis=-1)
    nq = jnp.sqrt(n * n + q[..., 3] * q[..., 3])
    angle = 2.0 * _asin(n / jnp.maximum(nq, 1e-12))
    small = n < 1e-8
    scale = jnp.where(small, 2.0, angle / jnp.where(small, 1.0, n))
    return v * scale[..., None]


def _rel_residual(pos_i, q_i, pos_j, q_j, dp_meas, dq_meas):
    """Relative-pose factor residual (6,) — identical math to vio/ba.py."""
    dq_est = quat_mul(_qconj(q_i), q_j)
    # R_i^T (p_j - p_i) without materializing the matrix
    d = pos_j - pos_i
    x, y, z, w = q_i[0], q_i[1], q_i[2], q_i[3]
    # quat_rotate by conj(q_i): v + 2w(v x qv)... use explicit R^T rows
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 1e-12, 2.0 / jnp.maximum(n, 1e-12), 0.0)
    r00, r01, r02 = 1 - s * (y * y + z * z), s * (x * y - w * z), s * (x * z + w * y)
    r10, r11, r12 = s * (x * y + w * z), 1 - s * (x * x + z * z), s * (y * z - w * x)
    r20, r21, r22 = s * (x * z - w * y), s * (y * z + w * x), 1 - s * (x * x + y * y)
    dp_est = jnp.stack([r00 * d[0] + r10 * d[1] + r20 * d[2],
                        r01 * d[0] + r11 * d[1] + r21 * d[2],
                        r02 * d[0] + r12 * d[1] + r22 * d[2]])
    r_rot = _so3_log_k(quat_mul(_qconj(dq_meas), dq_est))
    return jnp.concatenate([r_rot, dp_est - dp_meas])


def _rel_jacobians(pos, quat, rel_dp, rel_dq):
    """Residuals + jacfwd Jacobians for the K-1 relative-pose factors.

    Small ((K-1, 6, 6)) — traced with jax.jacfwd inside the kernel, which
    lowers to the same elementwise ops and stays bit-consistent with the
    XLA path's linearization."""
    zero6 = jnp.zeros(6, jnp.float32)

    def ji_fn(pi, qi, pj, qj, dp, dq):
        return jax.jacfwd(lambda d: _rel_residual(
            pi + d[3:], quat_mul(qi, so3_exp(d[:3])), pj, qj, dp, dq))(zero6)

    def jj_fn(pi, qi, pj, qj, dp, dq):
        return jax.jacfwd(lambda d: _rel_residual(
            pi, qi, pj + d[3:], quat_mul(qj, so3_exp(d[:3])), dp, dq))(zero6)

    args = (pos[:-1], quat[:-1], pos[1:], quat[1:], rel_dp, rel_dq)
    r_rel = jax.vmap(_rel_residual)(*args)          # (K-1, 6)
    Ji = jax.vmap(ji_fn)(*args)                     # (K-1, 6, 6)
    Jj = jax.vmap(jj_fn)(*args)
    return r_rel, Ji, Jj


def _so3_exp_cols(wx, wy, wz):
    """so3_exp on (K, 1) component columns -> quaternion component columns
    (same math as core.quat.so3_exp incl. the normalized first-order
    small-angle fallback), avoiding lane-changing stacks inside Mosaic."""
    ang = jnp.sqrt(wx * wx + wy * wy + wz * wz)
    small = ang < 1e-8
    safe = jnp.where(small, 1.0, ang)
    half = 0.5 * ang
    s = jnp.sin(half) / safe
    qx, qy, qz, qw = wx * s, wy * s, wz * s, jnp.cos(half)
    # first-order fallback: normalize([0.5 w, 1])
    axn = jnp.sqrt(0.25 * (wx * wx + wy * wy + wz * wz) + 1.0)
    ax, ay, az, aw = 0.5 * wx / axn, 0.5 * wy / axn, 0.5 * wz / axn, 1.0 / axn
    return (jnp.where(small, ax, qx), jnp.where(small, ay, qy),
            jnp.where(small, az, qz), jnp.where(small, aw, qw))


def _quat_mul_cols(a, b):
    """Hamilton product on component-column tuples (xyzw)."""
    x1, y1, z1, w1 = a
    x2, y2, z2, w2 = b
    return (w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2)


def _gauss_jordan(S, rhs, n: int):
    """Solve S x = rhs for a damped-SPD (n, n) system by in-kernel
    Gauss-Jordan (no pivoting needed).  S, rhs are values; returns x."""

    sub2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def pivot(i, carry):
        S, rhs = carry
        # row/column extraction by masked reduction (Mosaic has no value
        # dynamic_slice; these are single full-matrix VPU passes)
        row = jnp.sum(jnp.where(sub2 == i, S, 0.0), axis=0,
                      keepdims=True)                            # (1, n)
        col = jnp.sum(jnp.where(lane2 == i, S, 0.0), axis=1,
                      keepdims=True)                            # (n, 1)
        piv = jnp.sum(jnp.where(rows == i, col, 0.0))
        piv = jnp.where(jnp.abs(piv) > 1e-20, piv, 1.0)
        inv_piv = 1.0 / piv
        f = jnp.where(rows == i, 1.0 - inv_piv, col * inv_piv)  # (n, 1)
        r_i = jnp.sum(jnp.where(rows == i, rhs, 0.0))
        return (S - f * row, rhs - f * r_i)

    _, x = jax.lax.fori_loop(0, n, pivot, (S, rhs))
    return x


def _ba_kernel(pos_ref, quat_ref, pts_ref, obsu_ref, obsv_ref, obsz_ref,
               obsw_ref, reldp_ref, reldq_ref, wrel_ref, prior_ref,
               opos_ref, oquat_ref, opts_ref, ocost_ref,
               *, cam: CameraConfig, n_iter: int, damping: float,
               huber_px: float):
    K = pos_ref.shape[1]
    P = pts_ref.shape[2]
    N = 6 * K

    pos0 = pos_ref[0]                       # (K, 3)
    quat0 = quat_ref[0]                     # (K, 4)
    pts0 = pts_ref[0]                       # (3, P)
    obs_u = obsu_ref[0]                     # (K, P)
    obs_v = obsv_ref[0]
    obs_z = obsz_ref[0]
    obs_w = obsw_ref[0]
    prior_w = prior_ref[0]                  # (1, P)
    w_rel = wrel_ref[0]                     # (K-1, 1)

    # depth whitening (depends only on measurements — hoisted)
    sigz = jnp.maximum(0.02, cam.depth_noise_rel_per_m * obs_z * obs_z)
    inv_sigz = 2.0 / sigz

    t_fwd = cam.cam_offset_fwd
    t_up = cam.cam_offset_up
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy

    # loop-invariant block masks for the reduced-system assembly
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    rr, cc = sub_i // 6, lane_i // 6
    eye_mask = (sub_i == lane_i).astype(jnp.float32)
    gauge = ((rr == 0) & (cc == 0)).astype(jnp.float32) * eye_mask * 1e4
    iota6 = jax.lax.broadcasted_iota(jnp.int32, (K, 6, 1), 1)

    def place_blocks(blocks, delta):
        """(K, 6, 6) row-indexed blocks -> (N, N) with block (k, k+delta)
        holding blocks[k].  Mosaic-safe (no lane-changing reshape): the
        (N, 6) row layout keeps the lane dim, pltpu.repeat TILES it across
        lane blocks (placed[r, c] = rowmat[r, c % 6]), and the block mask
        selects the one diagonal."""
        rowmat = blocks.reshape(N, 6)             # [6k+i, j] = blocks[k,i,j]
        placed = pltpu.repeat(rowmat, K, axis=1)  # (N, N)
        return jnp.where(cc == rr + delta, placed, 0.0)

    def gn_step(_, carry):
        pos, quat, pts, _ = carry
        R = _rot_cols(quat)                 # 9 x (K, 1)

        dx = pts[0:1, :] - pos[:, 0:1]      # (K, P)
        dy = pts[1:2, :] - pos[:, 1:2]
        dz = pts[2:3, :] - pos[:, 2:3]
        # v = R^T (X - pos)
        v0 = R[0][0] * dx + R[1][0] * dy + R[2][0] * dz
        v1 = R[0][1] * dx + R[1][1] * dy + R[2][1] * dz
        v2 = R[0][2] * dx + R[1][2] * dy + R[2][2] * dz
        pb0 = v0 - t_fwd
        pb1 = v1
        pb2 = v2 - t_up
        # p_cam = R_BASE_CAM^T p_base = (-pb1, -pb2, pb0)
        pc0, pc1, pc2 = -pb1, -pb2, pb0
        z = jnp.maximum(pc2, 0.1)
        invz = 1.0 / z
        u = fx * pc0 * invz + cx
        vv = fy * pc1 * invz + cy
        ru = u - obs_u
        rv = vv - obs_v
        rz = (pc2 - obs_z) * inv_sigz

        # robust weights (identical to vio/ba.py gn_step)
        rn = jnp.sqrt(ru * ru + rv * rv)
        hub = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-6))
        arz = jnp.abs(rz)
        hub_z = jnp.where(arz <= 6.0, 1.0, 6.0 / jnp.maximum(arz, 1e-6))
        w = obs_w * hub * hub_z             # (K, P)

        # Jacobian of (u, v, rz) wrt p_cam, with the z-clamp zeroing d/dpc2
        unclamped = (pc2 >= 0.1).astype(jnp.float32)
        a = fx * invz
        b = -fx * pc0 * invz * invz * unclamped
        c = fy * invz
        d = -fy * pc1 * invz * invz * unclamped
        e = inv_sigz
        zero = jnp.zeros_like(a)

        # d p_base/d theta columns g=(g0,g1,g2) chain to rows via
        #   du = -a*g1 + b*g0 ; dv = -c*g2 + d*g0 ; drz = e*g0
        def chain(g0, g1, g2):
            return (-a * g1 + b * g0, -c * g2 + d * g0, e * g0)

        # landmark columns: d p_base/d X_j = R[j] row
        Jl = [chain(R[j][0], R[j][1], R[j][2]) for j in range(3)]
        # rotation columns: d p_base/d w = [v]x columns
        Jr = [chain(zero, v2, -v1), chain(-v2, zero, v0), chain(v1, -v0, zero)]
        # Jp columns 0..2 rotation, 3..5 translation (= -Jl)
        Jp = Jr + [tuple(-x for x in Jl[j]) for j in range(3)]
        res = (ru, rv, rz)

        # --- landmark blocks (all (1, P) lanes math) ---
        def reduce_kp(x):
            return jnp.sum(x, axis=0, keepdims=True)        # (1, P)

        Hll = [[sum(reduce_kp(w * Jl[j][r] * Jl[m][r]) for r in range(3))
                for m in range(3)] for j in range(3)]
        g_l = [sum(reduce_kp(w * Jl[j][r] * res[r]) for r in range(3))
               for j in range(3)]
        for j in range(3):
            Hll[j][j] = Hll[j][j] + prior_w + damping
            g_l[j] = g_l[j] + prior_w * (pts[j:j + 1, :] - pts0[j:j + 1, :])

        # adjugate 3x3 inverse, elementwise over P (vio/ba.py _inv3x3)
        A11 = Hll[1][1] * Hll[2][2] - Hll[1][2] * Hll[2][1]
        A12 = Hll[0][2] * Hll[2][1] - Hll[0][1] * Hll[2][2]
        A13 = Hll[0][1] * Hll[1][2] - Hll[0][2] * Hll[1][1]
        A21 = Hll[1][2] * Hll[2][0] - Hll[1][0] * Hll[2][2]
        A22 = Hll[0][0] * Hll[2][2] - Hll[0][2] * Hll[2][0]
        A23 = Hll[0][2] * Hll[1][0] - Hll[0][0] * Hll[1][2]
        A31 = Hll[1][0] * Hll[2][1] - Hll[1][1] * Hll[2][0]
        A32 = Hll[0][1] * Hll[2][0] - Hll[0][0] * Hll[2][1]
        A33 = Hll[0][0] * Hll[1][1] - Hll[0][1] * Hll[1][0]
        det = Hll[0][0] * A11 + Hll[0][1] * A21 + Hll[0][2] * A31
        idet = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        Hinv = [[A11 * idet, A12 * idet, A13 * idet],
                [A21 * idet, A22 * idet, A23 * idet],
                [A31 * idet, A32 * idet, A33 * idet]]

        # --- pose-landmark blocks -> Bmat_m (6K, P) ---
        def stack_6k(cols):
            # cols: list of 6 (K, P) arrays indexed by i -> (6K, P)
            return jnp.stack(cols, axis=1).reshape(6 * K, P)

        Bmat = [stack_6k([sum(w * Jp[i][r] * Jl[m][r] for r in range(3))
                          for i in range(6)]) for m in range(3)]
        Cmat = [sum(Bmat[j] * Hinv[j][m] for j in range(3)) for m in range(3)]

        # --- Schur complement & gradient correction (MXU) ---
        S_corr = sum(jax.lax.dot_general(
            Cmat[m], Bmat[m], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI)
            for m in range(3))                              # (6K, 6K)
        g_corr = sum(jnp.sum(Cmat[m] * g_l[m], axis=1, keepdims=True)
                     for m in range(3))                     # (6K, 1)

        # --- pose diagonal blocks H_pp (K, 6, 6) ---
        def red_p(x):
            return jnp.sum(x, axis=1, keepdims=True)        # (K, 1)

        Hpp = jnp.stack([jnp.concatenate(
            [sum(red_p(w * Jp[i][r] * Jp[j][r]) for r in range(3))
             for j in range(6)], axis=1) for i in range(6)], axis=1)  # (K,6,6)
        g_p = jnp.stack(
            [sum(red_p(w * Jp[i][r] * res[r]) for r in range(3))
             for i in range(6)], axis=1)                    # (K, 6, 1)

        # --- relative-pose factors ---
        r_rel, Ji, Jj = _rel_jacobians(pos, quat, reldp_ref[0], reldq_ref[0])
        wJi = w_rel[:, :, None] * Ji
        wJj = w_rel[:, :, None] * Jj
        A_ii = jnp.sum(wJi[:, :, :, None] * Ji[:, :, None, :], axis=1)
        A_jj = jnp.sum(wJj[:, :, :, None] * Jj[:, :, None, :], axis=1)
        A_ij = jnp.sum(wJi[:, :, :, None] * Jj[:, :, None, :], axis=1)
        A_ji = jnp.sum(wJj[:, :, :, None] * Ji[:, :, None, :], axis=1)
        gr_i = jnp.sum(wJi * r_rel[:, :, None], axis=1)     # (K-1, 6)
        gr_j = jnp.sum(wJj * r_rel[:, :, None], axis=1)

        zpad = jnp.zeros((1, 6, 6), jnp.float32)
        diag_blocks = (Hpp
                       + jnp.concatenate([A_ii, zpad], axis=0)
                       + jnp.concatenate([zpad, A_jj], axis=0))
        # row-indexed: row block k couples to k+1 via A_ij, k+1 to k via A_ji
        super_blocks = jnp.concatenate([A_ij, zpad], axis=0)
        sub_blocks = jnp.concatenate([zpad, A_ji], axis=0)

        g = (g_p
             + jnp.concatenate([gr_i[:, :, None],
                                jnp.zeros((1, 6, 1))], axis=0)
             + jnp.concatenate([jnp.zeros((1, 6, 1)),
                                gr_j[:, :, None]], axis=0)
             ).reshape(N, 1)

        S = (place_blocks(diag_blocks, 0)
             + place_blocks(super_blocks, 1)
             + place_blocks(sub_blocks, -1)
             + gauge + damping * eye_mask - S_corr)
        rhs = -(g - g_corr)

        dp = _gauss_jordan(S, rhs, N)                       # (N, 1)

        # --- back-substitute landmarks ---
        Bt_dp = [jnp.sum(Bmat[m] * dp, axis=0, keepdims=True)
                 for m in range(3)]
        dl = [-sum(Hinv[j][m] * (g_l[m] + Bt_dp[m]) for m in range(3))
              for j in range(3)]
        pts_new = pts + jnp.concatenate(dl, axis=0)

        # --- pose update (component columns; no lane-changing reshapes) ---
        dp3 = dp.reshape(K, 6, 1)
        comp = [jnp.sum(jnp.where(iota6 == m, dp3, 0.0), axis=1)
                for m in range(6)]                          # 6 x (K, 1)
        pos_new = pos + jnp.concatenate(comp[3:6], axis=1)
        dq = _so3_exp_cols(comp[0], comp[1], comp[2])
        qc = (quat[:, 0:1], quat[:, 1:2], quat[:, 2:3], quat[:, 3:4])
        qn = _quat_mul_cols(qc, dq)
        qnorm = jnp.sqrt(qn[0] ** 2 + qn[1] ** 2 + qn[2] ** 2 + qn[3] ** 2)
        quat_new = jnp.concatenate([c / qnorm for c in qn], axis=1)

        cost = (jnp.sum(w * (ru * ru + rv * rv + rz * rz))
                + jnp.sum(w_rel * r_rel * r_rel))  # w_rel (K-1,1) broadcasts
        return (pos_new, quat_new, pts_new, cost)

    pos, quat, pts, cost = jax.lax.fori_loop(
        0, n_iter, gn_step, (pos0, quat0, pts0, jnp.float32(0.0)))
    opos_ref[0] = pos
    oquat_ref[0] = quat
    opts_ref[0] = pts
    ocost_ref[:] = jnp.reshape(cost, (1, 1, 1))  # no scalar VMEM stores


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "iters",
                                             "interpret"))
def solve_ba_pallas(prob, cam: CameraConfig, cfg: VioConfig,
                    iters: int | None = None, interpret: bool = False):
    """Batched fused BA: ``prob`` is a BAProblem with a leading batch dim B
    on every field.  Returns a BAResult batched the same way.  Agreement
    with jax.vmap(solve_ba) is asserted in tests/test_ba_pallas.py."""
    from nclt_slam_tpu.vio.ba import BAResult

    B, K, _ = prob.kf_pos.shape
    P = prob.points.shape[1]
    Pp = _round_up(max(P, 128), 128)
    n_iter = iters or cfg.gn_iters

    def padP(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, Pp - P)
        return jnp.pad(x, pad)

    pts_T = padP(jnp.transpose(prob.points, (0, 2, 1)), 2)     # (B, 3, Pp)
    obs_u = padP(prob.obs_uv[..., 0], 2)                       # (B, K, Pp)
    obs_v = padP(prob.obs_uv[..., 1], 2)
    obs_z = padP(prob.obs_z, 2)
    obs_w = padP(prob.obs_w, 2)
    if prob.pt_prior_w is None:
        prior = jnp.zeros((B, 1, Pp), jnp.float32)
    else:
        prior = padP(prob.pt_prior_w[:, None, :], 2)
    Km1 = K - 1
    w_rel = jnp.broadcast_to(
        jnp.asarray(prob.w_rel, jnp.float32).reshape(B, -1),
        (B, Km1))[..., None]                                   # (B, Km1, 1)

    f32 = jnp.float32
    kern = functools.partial(
        _ba_kernel, cam=cam, n_iter=n_iter, damping=cfg.lm_damping,
        huber_px=cfg.huber_px)

    def bspec(*shape):
        return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    opos, oquat, opts, ocost = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[bspec(K, 3), bspec(K, 4), bspec(3, Pp), bspec(K, Pp),
                  bspec(K, Pp), bspec(K, Pp), bspec(K, Pp), bspec(Km1, 3),
                  bspec(Km1, 4), bspec(Km1, 1), bspec(1, Pp)],
        out_specs=(bspec(K, 3), bspec(K, 4), bspec(3, Pp), bspec(1, 1)),
        out_shape=(jax.ShapeDtypeStruct((B, K, 3), f32),
                   jax.ShapeDtypeStruct((B, K, 4), f32),
                   jax.ShapeDtypeStruct((B, 3, Pp), f32),
                   jax.ShapeDtypeStruct((B, 1, 1), f32)),
        interpret=interpret,
    )(prob.kf_pos.astype(f32), prob.kf_quat.astype(f32), pts_T,
      obs_u, obs_v, obs_z, obs_w, prob.rel_dp.astype(f32),
      prob.rel_dq.astype(f32), w_rel, prior)

    return BAResult(kf_pos=opos, kf_quat=oquat,
                    points=jnp.transpose(opts, (0, 2, 1))[:, :P],
                    final_cost=ocost[:, 0, 0])
