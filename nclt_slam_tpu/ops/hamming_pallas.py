"""Fused Pallas TPU kernel for binary-descriptor cross-check matching.

``cross_check_match`` (sensors/features.py) is the profiled #1 repeat-tick
stage: the XLA path materializes an (A, B, W) uint32 xor tensor, popcounts
it, reduces, and runs two argmin passes plus a gather — a chain of small
VPU ops whose launch/latency overhead dominates at (192, 192, 8) scale.

This kernel fuses the whole computation into ONE launch and moves the
popcount arithmetic onto the MXU via the ±1-bit trick:

    hamming(a, b) = (NBITS - s_a · s_b) / 2,   s = 2*bit - 1 ∈ {-1, +1}

so the (A, B) distance matrix is a single int8 matmul over the unpacked
256-bit descriptors — exactly the shape the 128x128 systolic array wants —
and the mutual-nearest-neighbour check is computed WITHOUT gathers by
re-scanning the distance matrix against the row/column argmin keys:

    mutual[a] = OR_b [ (D[a,b]*B + b == rowkey[a]) &
                       (D[a,b]*A + a == colkey[b]) ]

(The combined value*index keys make each argmin unique, so the OR test is
exact.)  Equivalent of BFMatcher(crossCheck=True) + Hamming cap, matching
the reference's matcher loop (visual_landmark_matcher.py:304-330) and
ORB-SLAM3's SearchByProjection mutual check.

Exact agreement with the XLA path is asserted in tests/test_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 10 ** 6  # same sentinel the XLA path uses (features.py)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _unpack_pm1(words, n_words: int):
    """(N, W) uint32 -> (N, 32*W) int8 of ±1 bits.  pltpu.repeat TILES the
    word row ([w0..wW-1, w0..wW-1, ...]), so lane l holds word l % W and
    the per-lane shift l // W selects the bit.  Hamming distance is
    invariant to the bit permutation as long as both sides share it."""
    N = words.shape[0]
    nbits = 32 * n_words
    rep = pltpu.repeat(words, repeats=32, axis=1)          # (N, 32W)
    shift = jax.lax.broadcasted_iota(
        jnp.uint32, (N, nbits), 1) // jnp.uint32(n_words)
    bits = (rep >> shift) & jnp.uint32(1)
    # f32, not int8: Mosaic cannot legalize an i8 MXU dot on v5e, and ±1
    # sums ≤ nbits are exact in f32 anyway.  (u32 -> i32 first: Mosaic has
    # no direct u32 -> f32 cast, and the bit values 0/1 are sign-safe.)
    return 2.0 * bits.astype(jnp.int32).astype(jnp.float32) - 1.0


def _cross_check_kernel(da_ref, va_ref, db_ref, vb_ref, midx_ref, mok_ref,
                        dist_ref, *, n_words: int, max_dist: int):
    A = da_ref.shape[0]
    B = db_ref.shape[0]
    nbits = 32 * n_words

    sa = _unpack_pm1(da_ref[:], n_words)                   # (A, nbits) f32
    sb = _unpack_pm1(db_ref[:], n_words)                   # (B, nbits) f32

    # MXU: D[a,b] = (nbits - sa·sb) / 2, exact in f32
    dot = jax.lax.dot_general(
        sa, sb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (A, B)
    D = ((nbits - dot) * 0.5).astype(jnp.int32)

    va = va_ref[:].astype(jnp.bool_)                       # (A, 1)
    vb = vb_ref[:].astype(jnp.bool_)                       # (B, 1)
    pair_ok = va & vb.reshape(1, B)
    Dm = jnp.where(pair_ok, D, BIG)

    cols = jax.lax.broadcasted_iota(jnp.int32, (A, B), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (A, B), 0)

    # unique row/col argmin via combined value*index keys
    rowkey = jnp.min(Dm * B + cols, axis=1, keepdims=True)     # (A, 1)
    colkey = jnp.min(Dm * A + rows, axis=0, keepdims=True)     # (1, B)

    best_b = rowkey % B                                        # (A, 1)
    best_d = rowkey // B                                       # (A, 1)

    mutual = jnp.any((Dm * B + cols == rowkey)
                     & (Dm * A + rows == colkey), axis=1, keepdims=True)

    midx_ref[:] = best_b
    mok_ref[:] = (mutual & (best_d <= max_dist)
                  & (best_d < BIG)).astype(jnp.int32)
    dist_ref[:] = best_d


@functools.partial(jax.jit,
                   static_argnames=("max_dist", "interpret"))
def cross_check_pallas(desc_a, valid_a, desc_b, valid_b, max_dist: int = 64,
                       interpret: bool = False):
    """Fused mutual-NN Hamming matching.  Shapes: desc_a (A, W) uint32,
    desc_b (B, W) uint32, valid_* bool.  Returns (m_idx (A,), matched (A,),
    best_d (A,)) — bit-identical to features.cross_check_match."""
    A, W = desc_a.shape
    B = desc_b.shape[0]
    Ap = _round_up(max(A, 8), 8)
    Bp = _round_up(max(B, 128), 128)

    da = jnp.zeros((Ap, W), jnp.uint32).at[:A].set(desc_a)
    db = jnp.zeros((Bp, W), jnp.uint32).at[:B].set(desc_b)
    va = jnp.zeros((Ap, 1), jnp.int32).at[:A, 0].set(valid_a.astype(jnp.int32))
    vb = jnp.zeros((Bp, 1), jnp.int32).at[:B, 0].set(valid_b.astype(jnp.int32))

    kern = functools.partial(_cross_check_kernel, n_words=W,
                             max_dist=max_dist)
    midx, mok, dist = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((Ap, 1), jnp.int32),
                   jax.ShapeDtypeStruct((Ap, 1), jnp.int32),
                   jax.ShapeDtypeStruct((Ap, 1), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(da, va, db, vb)

    # invalid-a rows: argmin over an all-BIG row returns b=0 — the XLA
    # path's argmin does the same, and `matched` is False either way
    return (midx[:A, 0], mok[:A, 0].astype(jnp.bool_), dist[:A, 0])
