"""Pallas TPU kernel for the wavefront potential relaxation.

The planner's cost is dominated by the iterated 8-neighbor min-plus
relaxation (planning/wavefront.py): at the XLA level every Jacobi sweep is
~9 separate roll/min ops over the window, and the fixed ``sweeps x window``
iteration count makes this the longest sequential chain in the rollout.
This kernel runs the ENTIRE relaxation in VMEM with one launch: the cost
block and potential stay resident on-chip (a 192x192 f32 window is ~150 KB,
far under the ~16 MB VMEM budget) and each iteration is pure VPU work on
registers-adjacent data.

Shapes are padded to lane multiples (last dim 128) per the TPU tiling
rules.  The kernel is numerically identical to the XLA reference
(`plan_window`'s loop); tests assert exact agreement in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


def _pad_to(x, rows, cols, fill):
    r, c = x.shape
    return jnp.pad(x, ((0, rows - r), (0, cols - c)), constant_values=fill)


def _relax_kernel(cost_ref, phi0_ref, out_ref, *, n_iter: int, res: float):
    """All relaxation iterations in VMEM.

    cost_ref: (R, C) traversal cost factor (BIG at lethal/padding)
    phi0_ref: (R, C) initial potential (0 at goal, BIG elsewhere)
    """
    tc = cost_ref[:]
    phi = phi0_ref[:]
    diag = 1.4142135
    R, C = tc.shape
    # edge masks via iota (scatter/.at[].set does not lower in Pallas TPU)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)

    def shift(a, dr, dc):
        s = a
        if dr == 1:
            s = jnp.where(row_ids == 0, BIG, jnp.roll(s, 1, 0))
        elif dr == -1:
            s = jnp.where(row_ids == R - 1, BIG, jnp.roll(s, -1, 0))
        if dc == 1:
            s = jnp.where(col_ids == 0, BIG, jnp.roll(s, 1, 1))
        elif dc == -1:
            s = jnp.where(col_ids == C - 1, BIG, jnp.roll(s, -1, 1))
        return s

    def body(_, phi):
        best = phi
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            best = jnp.minimum(best, shift(phi, dr, dc) + tc)
        tcd = tc * diag
        for dr, dc in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
            best = jnp.minimum(best, shift(phi, dr, dc) + tcd)
        return jnp.minimum(phi, best)

    out_ref[:] = jax.lax.fori_loop(0, n_iter, body, phi)


@functools.partial(jax.jit, static_argnames=("n_iter", "res", "interpret"))
def wavefront_potential_pallas(tc, phi0, n_iter: int, res: float,
                               interpret: bool = False):
    """Relaxed potential field via the VMEM-resident kernel.

    tc: (W, W) per-cell traversal cost (BIG where lethal).
    phi0: (W, W) initial potential.  Returns phi (W, W).
    """
    W = tc.shape[0]
    rows = ((W + 7) // 8) * 8
    cols = ((W + 127) // 128) * 128
    tc_p = _pad_to(tc, rows, cols, BIG)
    phi_p = _pad_to(phi0, rows, cols, BIG)

    out = pl.pallas_call(
        functools.partial(_relax_kernel, n_iter=n_iter, res=res),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tc_p.astype(jnp.float32), phi_p.astype(jnp.float32))
    return out[:W, :W]
