"""Pallas TPU kernel for the congruent-set gate matrix + subsample select.

The congruent extraction's hot loop evaluates a [P, Q] gate matrix per
base (cell equality + squared distance + cone angle; reference semantics
in congruent.py / src/stocs.cpp:753-869) and reduces it to a [P, 16]
row-stripe max of packed (rand | marker | q-index) keys. The XLA path
materializes the [P, Q] intermediates in HBM (~268 MB per dense base at
P=16384, Q=4096x4); this kernel fuses gate + packing + stripe reduction
in VMEM tiles, so HBM traffic is just the [16, P]/[16, Q] feature inputs
and the [P, 16] output.

Layouts are transposed so the long axis rides the 128-lane dimension:
feature rows are [16, N] f32 (rows 0-2 world position, 3-5 pair
direction, 6 squared norm, 7/8 the packed int32 cell id split into its
low/high 16-bit halves — both exact in f32, so the pairwise f32
equality of the halves is exactly int32 equality; rows 9-15 pad to the
8-sublane tile).
Unlike the dropped dense-field scoring kernel (design record in
docs/RESULTS.md, "Mosaic VMEM-gather re-probe"), nothing here
gathers: matmul (MXU, K=3) + elementwise + reductions only, which the
available Mosaic toolchain lowers.

Bit-identical to the XLA match_block path: the Q grid tile equals the
XLA Q-block (4096) and stripes are contiguous 1/16ths of each tile, so
stripe membership — and therefore every selected candidate — matches
(tests/test_pallas_congruent.py asserts equality in interpret mode)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 16  # candidates kept per P row (must match congruent.py's `sub`)


def _gate_kernel(alpha_ref, thr_ref, mask_ref, marker_ref, live_ref,
                 p_ref, q_ref, rp_ref, rq_ref,
                 out_ref, cnt_ref, *, skip_dist: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tq = q_ref.shape[1]

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    # BANDED skip: with both sides sorted by position-cell id
    # (congruent.py dense tiers), matches are confined to (i, j) tiles
    # whose cell RANGES overlap — the caller's `live` mask. Dead tiles
    # skip the whole gate (their contribution is exactly zero); on the
    # packed fixture's ~20k-lane bases only ~1/5 of tiles are live.
    @pl.when(live_ref[i, j] != 0)
    def _():
        e1 = p_ref[0:3, :]                 # [3, TP]
        n1 = p_ref[3:6, :]
        sq1 = p_ref[6:7, :]                # [1, TP]
        c1lo = p_ref[7:8, :]
        c1hi = p_ref[8:9, :]
        e2 = q_ref[0:3, :]                 # [3, TQ]
        n2 = q_ref[3:6, :]
        sq2 = q_ref[6:7, :]
        c2lo = q_ref[7:8, :]
        c2hi = q_ref[8:9, :]

        cos = jax.lax.dot_general(
            n1, n2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        alpha = alpha_ref[0, 0]
        tol = alpha_ref[0, 1]
        match = (
            (c1lo.T == c2lo)
            & (c1hi.T == c2hi)
            & (jnp.abs(cos - alpha) <= tol)
        )
        if not skip_dist:
            # skip_dist: cell equality statically implies the distance
            # test (congruent.d2_test_implied) — the d2 matmul is elided
            d2 = (
                sq1.T + sq2
                - 2.0 * jax.lax.dot_general(
                    e1, e2, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )                               # [TP, TQ]
            match &= d2 <= thr_ref[0, 0]

        cols = (
            jax.lax.broadcasted_iota(jnp.int32, match.shape, 1)
            + j * tq
        )
        rp = rp_ref[0:1, :]                 # [1, TP]
        rq = rq_ref[0:1, :]                 # [1, TQ]
        v = (rp.T ^ rq) & mask_ref[0, 0]
        v = (v | marker_ref[0, 0] | cols)
        v = jnp.where(match, v, 0)
        # stripe max without reshaping across the lane dim (Mosaic cannot
        # shape-cast [TP, TQ] -> [TP, SUB, TQ/SUB]): 16 static lane
        # slices, each reduced over its contiguous column range — same
        # stripe membership as the XLA path's
        # reshape(tp, SUB, tq // SUB).max(2)
        w = tq // SUB
        stripe = jnp.concatenate(
            [
                jnp.max(v[:, s * w:(s + 1) * w], axis=1, keepdims=True)
                for s in range(SUB)
            ],
            axis=1,
        )                                   # [TP, SUB]
        out_ref[:] = jnp.maximum(out_ref[:], stripe)
        cnt_ref[:] = cnt_ref[:] + jnp.sum(
            match.astype(jnp.int32), axis=1, keepdims=True
        )


@functools.partial(
    jax.jit,
    static_argnames=("q_tile", "p_tile", "interpret", "skip_dist"),
)
def dense_gate(p_feat, q_feat, rp, rq, alpha, tol, dist_thresh,
               rand_mask, marker, q_tile: int = 4096, p_tile: int = 256,
               interpret: bool = False, skip_dist: bool = False,
               p_count=None, q_count=None, live=None):
    """Row-stripe-max selection over the full [P, Q] gate matrix.

    live (optional [P/p_tile, Q/q_tile] int32): per-tile liveness for
    BANDED execution — with both sides sorted by position-cell id the
    caller marks a tile live iff the two tiles' cell ranges overlap;
    dead tiles (whose contribution is exactly zero) skip the gate
    entirely. None = all tiles live.

    p_feat/q_feat: [16, P] / [16, Q] f32 (see module docstring layout);
    rp/rq: [P] / [Q] int32 mixed random streams; alpha/tol/dist_thresh
    scalars; rand_mask/marker the packing constants of congruent.py.
    Returns (row_best [P, SUB] int32, per-row match counts [P]).

    skip_dist (static): elide the d2 matmul + compare — only legal when
    cell equality implies the distance test (congruent.d2_test_implied).

    p_count / q_count (traced int32 scalars, optional): number of valid
    lanes on each side. The gathered lanes are compacted valid-first
    (gather_pair_srcs / gather_pair_block_srcs), so tiles beyond the
    ceil(count/tile) prefix contain only invalid lanes whose tagged cell
    halves can never match — the grid is bounded DYNAMICALLY to skip
    them (Mosaic dynamic grid dims), making the quadratic gate work
    proportional to the base's real pair counts instead of the tier cap.
    Rows in never-executed P tiles are zero-masked after the call, which
    is exactly what the full grid would have produced for them."""
    assert p_feat.shape[0] == 16 and q_feat.shape[0] == 16
    p = p_feat.shape[1]
    q = q_feat.shape[1]
    assert q % q_tile == 0 and p % p_tile == 0 and q_tile % SUB == 0
    scal = jnp.array([[alpha, tol]], jnp.float32)
    thr = jnp.array([[dist_thresh]], jnp.float32)
    maskc = jnp.array([[rand_mask]], jnp.int32)
    markc = jnp.array([[marker]], jnp.int32)
    if live is None:
        live = jnp.ones((p // p_tile, q // q_tile), jnp.int32)
    assert live.shape == (p // p_tile, q // q_tile), live.shape

    if p_count is None:
        pt = p // p_tile
    else:
        pt = jnp.clip(
            (p_count + p_tile - 1) // p_tile, 1, p // p_tile
        ).astype(jnp.int32)
    if q_count is None:
        qt = q // q_tile
    else:
        qt = jnp.clip(
            (q_count + q_tile - 1) // q_tile, 1, q // q_tile
        ).astype(jnp.int32)

    grid = (pt, qt)
    row_best, counts = pl.pallas_call(
        functools.partial(_gate_kernel, skip_dist=skip_dist),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(live.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((16, p_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, q_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p_tile, SUB), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, SUB), jnp.int32),
            jax.ShapeDtypeStruct((p, 1), jnp.int32),
        ],
        interpret=interpret,
    )(scal, thr, maskc, markc, live, p_feat, q_feat,
      rp[None, :], rq[None, :])
    if p_count is not None:
        # zero the rows of P tiles the dynamic grid never executed
        # (their output blocks are uninitialized memory)
        written = jnp.arange(p, dtype=jnp.int32) < pt * p_tile
        row_best = jnp.where(written[:, None], row_best, 0)
        counts = jnp.where(written[:, None], counts, 0)
    return row_best, counts[:, 0]
