"""Probability-weighted congruent-base sampling, batched over all bases.

The reference draws one base at a time through four sequentially-dependent
clock-seeded categorical draws, each preceded by a full O(N) probability
rewrite (reference: src/stocs.cpp:363-519 sample_class_base,
src/stocs.cpp:133-148 sample_point_from_distribution). Here the class path
runs all B bases as one [B, N] tensor program: four masked-categorical
rounds with keyed PRNG (deterministic, unlike the reference's wall-clock
seeding — parity is therefore at the score/pose level, not the RNG level).

The instance path (edge maps + flood-fill segments) lives in instance.py
because its cross-base probability decay is inherently sequential
(reference: src/stocs.cpp:571-580); it reuses this module's round masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ops import invariants
from .ops.ppf import ppf_keys_fast
from .ppf_table import PPFTable, ppf_exists

_RAD2DEG = 180.0 / jnp.pi


class SampledBases(NamedTuple):
    indices: jax.Array    # [B, 4] int32 — reordered scene point indices
    invariant1: jax.Array  # [B] f32
    invariant2: jax.Array  # [B] f32
    valid: jax.Array       # [B] bool


def _categorical_rows(key, probs):
    """Per-row categorical draw over [B, N] weights; rows with zero mass are
    flagged invalid (the reference's 'FAILED SAMPLING' path,
    stocs.cpp:386-389)."""
    mass = jnp.sum(probs, axis=-1)
    ok = mass > 0
    logits = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-30)), -jnp.inf)
    # keep rows finite so categorical never sees an all--inf row
    safe_logits = jnp.where(ok[:, None], logits, 0.0)
    idx = jax.random.categorical(key, safe_logits, axis=-1)
    return idx.astype(jnp.int32), ok


def _pairwise_exists(table: PPFTable, pos, normal, anchor_idx, tr, rot,
                     exists_bits=None):
    """[B, N] bool: does PPF(anchor_b -> i) exist in the model map. The
    anchor is point_1 of the feature, matching the reference's argument
    order (stocs.cpp:396-401).

    With exists_bits (the precomputed bit-packed [N, N/32] pair-existence
    matrix from build_exists_bits) the check is one contiguous row gather +
    an elementwise unpack — orders of magnitude fewer gather descriptors
    than per-element hash probing; used for large base budgets."""
    if exists_bits is not None:
        rows = exists_bits[anchor_idx]                    # [B, W] uint32
        shifts = jnp.arange(32, dtype=jnp.uint32)
        unpacked = (rows[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
        return unpacked.reshape(rows.shape[0], -1)[:, : pos.shape[0]] > 0
    a_pos = pos[anchor_idx]      # [B, 3]
    a_nrm = normal[anchor_idx]
    keys = ppf_keys_fast(
        a_pos[:, None, :], a_nrm[:, None, :],
        pos[None, :, :], normal[None, :, :],
        tr, rot,
    )
    return ppf_exists(table, keys)


def build_exists_bits(table: PPFTable, pos, normal, tr, rot,
                      chunk: int = 256):
    """Bit-packed [N, ceil(N/32)] uint32 matrix of PPF(i -> j) existence —
    the O(N^2) precomputation that turns every sampling-round existence
    mask into a row lookup. Built on device in row blocks."""
    n = pos.shape[0]
    assert n % chunk == 0 and n % 32 == 0
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))

    def block(args):
        bp, bn = args
        keys = ppf_keys_fast(
            bp[:, None, :], bn[:, None, :],
            pos[None, :, :], normal[None, :, :], tr, rot,
        )
        ex = ppf_exists(table, keys)          # [chunk, n]
        packed = jnp.sum(
            ex.reshape(chunk, n // 32, 32).astype(jnp.uint32)
            * weights[None, None, :],
            axis=-1,
            dtype=jnp.uint32,
        )
        return packed

    blocks = jax.lax.map(
        block,
        (pos.reshape(-1, chunk, 3), normal.reshape(-1, chunk, 3)),
    )
    return blocks.reshape(n, n // 32)


def round2_keep_mask(table, pos, normal, idx1, idx2, tr, rot,
                     internal_angle_threshold, exists_bits=None):
    """[B, N] keep-mask after drawing point 2: PPF(b2 -> i) must exist, i is
    not b2, and the internal angle at b1 between (b2-b1) and (i-b1), folded
    to [0, 90], is >= the threshold (reference: src/stocs.cpp:417-442)."""
    n = pos.shape[0]
    arange_n = jnp.arange(n, dtype=jnp.int32)[None, :]
    v1 = pos[idx2] - pos[idx1]
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-30)
    v2 = pos[None, :, :] - pos[idx1][:, None, :]
    v2 = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), 1e-30)
    cosang = jnp.sum(v1[:, None, :] * v2, axis=-1)
    angle = jnp.arccos(jnp.clip(cosang, -1.0, 1.0)) * _RAD2DEG
    angle = jnp.minimum(angle, 180.0 - angle)
    exists = _pairwise_exists(table, pos, normal, idx2, tr, rot, exists_bits)
    return exists & (arange_n != idx2[:, None]) & ~(angle < internal_angle_threshold)


def round3_keep_mask(table, pos, normal, idx1, idx2, idx3, tr, rot,
                     plane_threshold, min_distance_base, exists_bits=None):
    """[B, N] keep-mask after drawing point 3: near-coplanar with the plane
    through b1-b3 (ax+by+cz=1 parametrization via Cramer's rule, matching
    the reference's explicit expansion, src/stocs.cpp:456-497), minimum
    pairwise distance, PPF(b3 -> i) exists, i is not b3."""
    n = pos.shape[0]
    b = idx1.shape[0]
    arange_n = jnp.arange(n, dtype=jnp.int32)[None, :]
    p1, p2, p3 = pos[idx1], pos[idx2], pos[idx3]  # [B, 3]
    mat = jnp.stack([p1, p2, p3], axis=-2)  # [B, 3, 3]
    denom = jnp.linalg.det(mat)
    rhs = jnp.ones((b, 3), pos.dtype)

    def cramer(col):
        m = mat.at[:, :, col].set(rhs)
        return jnp.linalg.det(m)

    abc = jnp.stack([cramer(0), cramer(1), cramer(2)], axis=-1) / jnp.where(
        jnp.abs(denom) > 0, denom, 1.0
    )[:, None]
    planar_distance = jnp.abs(
        jnp.sum(abc[:, None, :] * pos[None, :, :], axis=-1) - 1.0
    )
    planar_distance = jnp.where(
        (jnp.abs(denom) > 0)[:, None], planar_distance, 1e4
    )
    d1 = jnp.linalg.norm(pos[None, :, :] - p1[:, None, :], axis=-1)
    d2 = jnp.linalg.norm(pos[None, :, :] - p2[:, None, :], axis=-1)
    d3 = jnp.linalg.norm(pos[None, :, :] - p3[:, None, :], axis=-1)
    exists = _pairwise_exists(table, pos, normal, idx3, tr, rot, exists_bits)
    reject = (
        (planar_distance > plane_threshold)
        | (d1 < min_distance_base)
        | (d2 < min_distance_base)
        | (d3 < min_distance_base)
        | ~exists
        | (arange_n == idx3[:, None])
    )
    return ~reject


def sample_class_bases(
    key: jax.Array,
    table: PPFTable,
    pos: jax.Array,        # [N, 3] centered scene positions
    normal: jax.Array,     # [N, 3]
    prior: jax.Array,      # [N] current per-point prior (class probability)
    valid: jax.Array,      # [N] live-point mask
    num_bases: int,
    tr_disc: int,
    rot_disc: int,
    plane_threshold: float,
    min_distance_base: float,
    internal_angle_threshold: float,
    exists_bits=None,
) -> SampledBases:
    """The class-conditional path (no edge map): all four rounds of
    conditional masking from src/stocs.cpp:363-519, batched over B bases."""
    n = pos.shape[0]
    b = num_bases
    k1, k2, k3, k4 = jax.random.split(key, 4)

    probs = jnp.broadcast_to(jnp.where(valid, prior, 0.0), (b, n))

    # ---- round 1
    idx1, ok1 = _categorical_rows(k1, probs)

    exists1 = _pairwise_exists(
        table, pos, normal, idx1, tr_disc, rot_disc, exists_bits
    )
    arange_n = jnp.arange(n, dtype=jnp.int32)[None, :]
    probs = jnp.where(exists1 & (arange_n != idx1[:, None]), probs, 0.0)

    # ---- round 2
    idx2, ok2 = _categorical_rows(k2, probs)
    keep2 = round2_keep_mask(
        table, pos, normal, idx1, idx2, tr_disc, rot_disc,
        internal_angle_threshold, exists_bits,
    )
    probs = jnp.where(keep2, probs, 0.0)

    # ---- round 3
    idx3, ok3 = _categorical_rows(k3, probs)
    keep3 = round3_keep_mask(
        table, pos, normal, idx1, idx2, idx3, tr_disc, rot_disc,
        plane_threshold, min_distance_base, exists_bits,
    )
    probs = jnp.where(keep3, probs, 0.0)

    # ---- round 4
    idx4, ok4 = _categorical_rows(k4, probs)

    raw = jnp.stack([idx1, idx2, idx3, idx4], axis=-1)  # [B, 4]
    base_pos = pos[raw]  # [B, 4, 3]
    perm, inv1, inv2, _dist = invariants.reorder_base(base_pos)
    reordered = jnp.take_along_axis(raw, perm, axis=-1)

    return SampledBases(
        indices=reordered,
        invariant1=inv1,
        invariant2=inv2,
        valid=ok1 & ok2 & ok3 & ok4,
    )
