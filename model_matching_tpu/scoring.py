"""Weighted-LCP hypothesis scoring — the hottest kernel of the pipeline.

The reference scores each candidate transform by walking every model point
through a kd-tree restricted-NN query against the scene and accumulating the
matched scene point's class probability when the normals agree within 30
degrees (reference: src/stocs.cpp:982-1041). That is O(H * M) sequential
tree walks. Here all H x M queries run as fused device programs over two
scene structures — the exact voxel-grid hash (ops/gridhash.py) and the
dense NN field (ops/densefield.py) — composed into a three-stage ladder
(score_hybrid): field + model subset for every hypothesis, field + full
model for the top fraction, exact grid for the leaders, so final LCP values
keep the reference's NN semantics at a fraction of the gather traffic.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .ops.densefield import DenseField, field_lookup
from .ops.gridhash import (
    NeighborGrid,
    query_restricted_nn_normal,
    query_restricted_nn_scored,
)

_DEG2RAD = jnp.pi / 180.0


def score_transforms_field(
    transforms: jax.Array,    # [H, 4, 4]
    valid: jax.Array,         # [H]
    model_pos: jax.Array,     # [M, 3]
    model_normal: jax.Array,  # [M, 3]
    model_valid: jax.Array,   # [M]
    field: DenseField,
    scene_class_prob: jax.Array,  # [S]
    distance_threshold: float,
    normal_angle_threshold_deg: float,
    model_count: jax.Array | None = None,
) -> jax.Array:
    """Fast-path weighted LCP via the dense NN field: one aligned row gather
    per (hypothesis, model point). Same gates as score_transforms, with the
    candidate chosen per-cell (see ops/densefield.py docstring).

    `scene_class_prob=None` reads the weight from the field row itself
    (requires a field built with `prob=`; valid only for the undecayed
    prob vector it was built with) — dropping the second [H, M] gather."""
    cos_gate = jnp.cos(normal_angle_threshold_deg * _DEG2RAD)
    if model_count is None:
        model_count = jnp.sum(model_valid.astype(jnp.float32))
    rot = transforms[:, :3, :3]
    t = transforms[:, :3, 3]
    q = jnp.einsum("hij,mj->hmi", rot, model_pos) + t[:, None, :]
    cand_pos, cand_nrm, cand_idx, occ, s7 = field_lookup(field, q)
    d2 = jnp.sum((q - cand_pos) ** 2, axis=-1)
    nq = jnp.einsum("hij,mj->hmi", rot, model_normal)
    cos = jnp.sum(cand_nrm * nq, axis=-1)
    if scene_class_prob is None:
        if not field.has_probs:
            raise ValueError(
                "scene_class_prob=None needs a field built with prob= "
                "(see ops/densefield.build_dense_field)"
            )
        pw = jnp.maximum(s7, 0.0)
    else:
        pw = scene_class_prob[cand_idx]
    w = jnp.where(
        occ
        & (d2 <= distance_threshold * distance_threshold)
        & (cos > cos_gate)
        & model_valid[None, :],
        pw,
        0.0,
    )
    scores = jnp.sum(w, axis=-1) / jnp.maximum(model_count, 1.0)
    return jnp.where(valid, scores, -1.0)


def score_transforms(
    transforms: jax.Array,     # [H, 4, 4] centered-frame model->scene
    valid: jax.Array,          # [H]
    model_pos: jax.Array,      # [M, 3] centered
    model_normal: jax.Array,   # [M, 3]
    model_valid: jax.Array,    # [M]
    grid: NeighborGrid,
    scene_pos: jax.Array,      # [S, 3] centered
    scene_normal: jax.Array,   # [S, 3]
    scene_class_prob: jax.Array,  # [S] (decayed copy if the instance path ran)
    distance_threshold: float,
    normal_angle_threshold_deg: float,
    model_count: jax.Array | None = None,
    chunk: int = 0,
) -> jax.Array:
    """Weighted LCP per transform: sum of matched scene class probabilities /
    |M| (reference: src/stocs.cpp:1006-1041). model_count overrides the
    divisor (the true |M| when model arrays are padded).

    `scene_class_prob=None` reads the winner's weight from the payload row
    (requires a grid built with normal= and prob=; valid only for the
    undecayed prob vector it was built with) — no prob/normal gathers."""
    cos_gate = jnp.cos(normal_angle_threshold_deg * _DEG2RAD)
    if model_count is None:
        model_count = jnp.sum(model_valid.astype(jnp.float32))

    def score_chunk(tr):
        rot = tr[:, :3, :3]
        t = tr[:, :3, 3]
        q = jnp.einsum("hij,mj->hmi", rot, model_pos) + t[:, None, :]
        if scene_class_prob is None:
            # baked route: winner normal AND prob from the payload row
            # (valid only for the undecayed probs the grid was built with)
            idx, _d2, cand_nrm, wprob = query_restricted_nn_scored(
                grid, q, distance_threshold
            )
            wprob = jnp.maximum(wprob, 0.0)
        else:
            idx, _d2, cand_nrm = query_restricted_nn_normal(
                grid, q, scene_pos, scene_normal, distance_threshold
            )
            wprob = scene_class_prob[jnp.maximum(idx, 0)]
        found = idx >= 0
        nq = jnp.einsum("hij,mj->hmi", rot, model_normal)
        cos = jnp.sum(cand_nrm * nq, axis=-1)
        # reference gate: acos(dot)*180/pi < 30 (stocs.cpp:1028-1032);
        # equivalent to dot > cos(30 deg) for dot in [-1, 1]
        w = jnp.where(
            found & (cos > cos_gate) & model_valid[None, :],
            wprob,
            0.0,
        )
        return jnp.sum(w, axis=-1) / jnp.maximum(model_count, 1.0)

    if chunk and transforms.shape[0] > chunk:
        h = transforms.shape[0]
        pad = (-h) % chunk
        tr = jnp.pad(transforms, ((0, pad), (0, 0), (0, 0)))
        tr = tr.reshape(-1, chunk, 4, 4)
        scores = jax.lax.map(score_chunk, tr).reshape(-1)[:h]
    else:
        scores = score_chunk(transforms)
    return jnp.where(valid, scores, -1.0)


def exact_score_chunk(configured: int, model_points: int,
                      cell_cap: int) -> int:
    """Hypothesis chunk for exact scoring: the configured value, or the
    largest multiple of 256 whose [chunk, M, cell_cap, 8] f32 payload
    transient stays under ~1.5 GB (MatchConfig.score_exact_chunk)."""
    if configured:
        return configured
    # ~2.5 GB of f32: the previously hand-tuned chunk=4096 ran a 2.5 GB
    # transient on the bench scene (cell_cap 40) without pressure on the
    # 16 GB chip; a tighter budget derived chunk=2560 there and measured
    # ~30% slower exact scoring from the extra dispatches
    budget_elems = 640 * 1024 * 1024
    c = budget_elems // max(1, model_points * cell_cap * 8)
    return int(max(256, min(8192, (c // 256) * 256)))


def best_pose(scores: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Argmax with the reference's strict-greater scan semantics
    (stocs.cpp:990-998: index stays -1 unless some score > 0)."""
    best_idx = jnp.argmax(scores)
    best = scores[best_idx]
    return jnp.where(best > 0, best_idx, -1), jnp.maximum(best, 0.0)


def _stable_partition_sel(valid: jax.Array, cap: int) -> jax.Array:
    """First `cap` slot indices of the stable valid-first partition —
    identical to argsort(~valid, stable)[:cap], computed in O(n) with two
    cumsums + one scatter instead of a full sort. Standalone the argsort
    measured 28 ms on a 409,600-slot fixture chunk; inside the fused
    scoring program the two are wall-neutral on v5e (XLA overlaps the
    sort), so this is kept for its asymptotics and for slot counts where
    the sort stops hiding (tests pin index-level equality)."""
    h = valid.shape[0]
    vi = valid.astype(jnp.int32)
    nv = jnp.cumsum(vi)
    # valid slot i lands at rank (#valid before or at i) - 1; invalid slot
    # i lands after ALL valid slots, at nv_total + (#invalid before or at
    # i) - 1 — exactly the stable partition's destination
    pos = jnp.where(
        valid,
        nv - 1,
        nv[-1] + jnp.cumsum(1 - vi) - 1,
    )
    perm = jnp.zeros(h, jnp.int32).at[pos].set(
        jnp.arange(h, dtype=jnp.int32)
    )
    return perm[:cap]


def run_bucketed(count, cap: int, fn_at_width):
    """Device-side width bucketing shared by score_hybrid's stage 1 and
    _phase_fit's compacted fit: run `fn_at_width(width)` at the smallest
    width in (cap/8, cap/4, cap/2, cap) that covers `count` (a traced
    scalar). Both callers rely on the same invariant — every live slot
    sits in the partition prefix, so a narrower run padded with dead
    slots is bit-identical to the full-width run — and must keep the
    same widths and <=-boundary, which is why this lives in one place."""

    def pick(remaining):
        if not remaining:
            return fn_at_width(cap)
        wd = remaining[0]
        return jax.lax.cond(
            count <= wd,
            lambda _: fn_at_width(wd),
            lambda _: pick(remaining[1:]),
            None,
        )

    return pick([cap // 8, cap // 4, cap // 2])


def score_hybrid(
    transforms, valid, model_pos, model_normal, model_valid,
    field: DenseField, grid: NeighborGrid,
    scene_pos, scene_normal, scene_class_prob,
    distance_threshold, normal_angle_threshold_deg,
    model_count=None,
    coarse_points: int = 64,
    mid_fraction: float = 0.08,
    mid_cap: int = 4096,
    refine_count: int = 256,
    compact_cap: int = 0,
    bucket_stage1: bool = True,
    precompacted_count=None,
):
    """Production scorer: a three-stage ladder.

    1. dense field + strided model subset (every hypothesis — cheap unbiased
       rank estimate),
    2. dense field + full model (top mid_fraction, capped at mid_cap),
    3. exact grid + full model (top refine_count) — final LCP values keep
       the reference's NN semantics for every hypothesis that can win.

    Non-leaders report -1 (they only needed to lose the ranking).

    `compact_cap`: when nonzero and the slot count exceeds it, valid
    hypotheses are stably partitioned to the front and only the first
    `compact_cap` slots enter the ladder (a B-base batch carries
    B * maximum_congruent_sets slots, typically ~5-10% valid; compaction
    removes the dead gather traffic). Valid slots beyond the cap are
    dropped — callers warn via MatchConfig.score_compact_cap docs.

    When compaction engages, stage 1 additionally runs at a bucketed
    width picked ON DEVICE by a lax.cond over the valid count (h/8, h/4,
    h/2, h): compaction puts every valid slot in a front prefix, slots
    past the prefix are invalid and score exactly -1.0, so a narrower
    stage-1 padded with -1.0 is BIT-IDENTICAL to the full-width run —
    while skipping the dead field-gather traffic that dominates stage 1
    when the valid fraction is low (fixture chunks: ~26k valid in the
    131072-slot compacted batch). `bucket_stage1=False` forces the
    full-width stage 1 (used by the equivalence test).

    `precompacted_count`: the caller already stably partitioned the
    slots valid-first (_phase_fit's fit-time compaction) and passes the
    partition-prefix length; bucketing then uses it instead of the
    valid count (fit may have invalidated slots INSIDE the prefix, so
    counting `valid` could pick a bucket narrower than the prefix and
    silently -1 a real hypothesis past the width)."""
    h_orig = transforms.shape[0]
    sel = None
    if compact_cap and h_orig > compact_cap:
        sel = _stable_partition_sel(valid, compact_cap)
        transforms = transforms[sel]
        valid = valid[sel]
    h = transforms.shape[0]
    m = model_pos.shape[0]

    stride = max(1, m // coarse_points)
    sub = slice(0, m, stride)

    frac = int(h * mid_fraction)
    if mid_cap:
        # absolute stage-2 width cap: the winner's stage-1 rank does not
        # grow with the slot count (it measures ranking quality, not
        # scale), so the fraction overshoots at sweep scale — measured
        # margins in MatchConfig.score_mid_cap's docstring
        frac = min(frac, mid_cap)
    k_mid = min(h, max(refine_count, frac))

    def stage1_at(width):
        # stage-1 field scores AND the stage-2 top_k at the bucket width.
        # Folding the top_k into the bucket is bit-identical: every slot
        # past `width` would score exactly -1.0, prefix slots are
        # unchanged, and top_k's tie-break toward the LOWER index means
        # -1.0 winners (when fewer than k_mid positives exist) are drawn
        # from the earliest slots — all inside the prefix since
        # width >= k_mid. At sweep scale this cuts the top_k's input 4x
        # (131072 -> 32768 on the fixture chunk).
        c = score_transforms_field(
            transforms[:width], valid[:width],
            model_pos[sub], model_normal[sub], model_valid[sub],
            field, scene_class_prob,
            distance_threshold, normal_angle_threshold_deg,
        )
        return jax.lax.top_k(c, k_mid)

    compacted = sel is not None or precompacted_count is not None
    if bucket_stage1 and compacted and h >= 8192 and h // 8 >= k_mid:
        nv = (
            precompacted_count
            if precompacted_count is not None
            else jnp.sum(valid.astype(jnp.int32))
        )
        _t, mid_idx = run_bucketed(nv, h, stage1_at)
    else:
        _t, mid_idx = stage1_at(h)
    mid = score_transforms_field(
        transforms[mid_idx], valid[mid_idx],
        model_pos, model_normal, model_valid,
        field, scene_class_prob,
        distance_threshold, normal_angle_threshold_deg,
        model_count=model_count,
    )

    k_fine = min(k_mid, refine_count)
    _t, fine_rel = jax.lax.top_k(mid, k_fine)
    fine_idx = mid_idx[fine_rel]
    fine = score_transforms(
        transforms[fine_idx], valid[fine_idx], model_pos, model_normal,
        model_valid, grid, scene_pos, scene_normal, scene_class_prob,
        distance_threshold, normal_angle_threshold_deg,
        model_count=model_count,
    )
    out = jnp.full((h_orig,), -1.0, fine.dtype)
    if sel is not None:
        fine_idx = sel[fine_idx]
    return out.at[fine_idx].set(fine)


