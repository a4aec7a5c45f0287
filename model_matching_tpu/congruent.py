"""Congruent 4-point set extraction on the model.

Reimplements the reference's per-base IndexedNormalSet pipeline (reference:
src/stocs.cpp:753-869 find_congruent_sets_on_model, using
include/super4pcs/accelerators/normalset.{h,hpp} and
include/super4pcs/pairCreationFunctor.h:96-143) as a batched masked tensor
program:

  * the two PPF lookups become padded pair lists from the dense table;
  * the reference's euclidean grid insert + same-cell query (it only ever
    inspects the query point's own cell, normalset.hpp:132-136,140) becomes
    an integer cell-equality test between the e1 and e2 intermediate points
    in the same power-of-two unit-cube grid;
  * the cone rasterization over the 7^3 angular grid (normalset.hpp:166-214)
    becomes a direct |dot(dir_P, dir_Q) - alpha| <= tol gate;
  * the final world-coordinate check keeps the reference's unsquared-
    threshold quirk (squaredNorm <= distance_threshold, stocs.cpp:854)
    behind MatchConfig.congruent_sqdist_quirk;
  * the reference's random 200-subsample of oversized candidate sets
    (src/stocs_match_one_object.cpp:132-143) becomes a keyed random top-k.

Bases are processed under lax.map so the [P_cap, Q_cap] mask matrices stay
one-base-sized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import MatchConfig
from .ops.ppf import ppf_bins
from .ppf_table import (
    PPFTable,
    gather_pair_block_srcs,
    gather_pair_srcs,
    lookup_pair_range,
)


# smallest pair cap routed to the Pallas gate kernel (see match_block)
_PALLAS_MIN_CAP = 4096


# IndexedNormalSet angular-grid constants (reference: stocs.cpp:794
# instantiates IndexedNormalSet<Point,3,7,float>; normalset.h:86)
_NG = 7
_NEPS = 1.0 / _NG + 0.00001
# nb_sample's maximum over alpha in [0, pi]:
# 2 * ceil(2*pi*atan(pi) * 7/2) = 56
_CONE_MAX_SAMPLES = 56


def _normal_cell_id(n):
    """Angular cell id of a unit direction — IndexedNormalSet's
    coordinatesNormal map + UnrollIndexLoop linearization
    (normalset.h:100-104, utils.h:139-148). Components are in [-1, 1] so
    the C int cast equals floor; out-of-range overshoot is deliberately
    NOT clipped (a cell id >= 7 along an axis can still match another
    direction that overshot identically, exactly like the reference's
    dict keyed on the raw id)."""
    c = jnp.floor((n / 2.0 + 0.5) / _NEPS).astype(jnp.int32)
    return c[..., 0] + c[..., 1] * _NG + c[..., 2] * (_NG * _NG)


def _rot_from_z_to(n):
    """Eigen Quaternion::setFromTwoVectors((0,0,1), n) as a rotation
    matrix (used by the cone query, normalset.hpp:172-186). n: [..., 3]
    unit directions. The antiparallel case (n ~ -z) is a pi rotation
    about x: diag(1, -1, -1). DOCUMENTED DIVERGENCE (ADVICE r4): Eigen
    picks its antiparallel fallback axis via the largest-component
    orthogonal vector, so for dir_q within ~1e-6 of exactly -z the
    cone's sampled azimuths (hence the rendered cells) can differ from
    the reference's — a measure-zero input set for real normals; all
    other directions use the identical half-angle construction."""
    c = n[..., 2]
    s = jnp.sqrt(jnp.maximum((1.0 + c) * 2.0, 1e-24))
    w = s / 2.0
    # axis = cross(z, n) = (-n_y, n_x, 0); quaternion xyz = axis / s
    x = -n[..., 1] / s
    y = n[..., 0] / s
    one = jnp.ones_like(c)
    r = jnp.stack([
        jnp.stack([1 - 2 * y * y, 2 * x * y, 2 * w * y], axis=-1),
        jnp.stack([2 * x * y, 1 - 2 * x * x, -2 * w * x], axis=-1),
        jnp.stack([-2 * w * y, 2 * w * x, 1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)
    anti = jnp.stack([
        jnp.stack([one, 0 * c, 0 * c], axis=-1),
        jnp.stack([0 * c, -one, 0 * c], axis=-1),
        jnp.stack([0 * c, 0 * c, -one], axis=-1),
    ], axis=-2)
    return jnp.where((c < -1.0 + 1e-12)[..., None, None], anti, r)


# one-hot width for the in-gate exact cone test: angular cell ids live in
# [0, 342]; ids are clipped to [0, 349], dead cone samples park at 350
_CONE_OH_W = 352


def _unit(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


def _cone_sample_cells(dir_q, cos_alpha):
    """Angular cells colored by the reference's cone rasterization around
    each Q direction (normalset.hpp:166-214; quirks as in _cone_accept):
    [L, S] int cell ids with dead samples parked at the sentinel 350."""
    dq = _unit(dir_q)
    ang = jnp.arccos(jnp.clip(cos_alpha, -1.0, 1.0))
    perimeter = 2.0 * jnp.pi * jnp.arctan(ang)
    nb = 2.0 * jnp.ceil(perimeter * _NG / 2.0)
    step = 2.0 * jnp.pi / jnp.maximum(nb, 1.0)
    a = jnp.arange(_CONE_MAX_SAMPLES, dtype=jnp.float32)
    theta = a * step
    sin_a = jnp.sin(ang)
    local = jnp.stack([
        sin_a * jnp.cos(theta),
        sin_a * jnp.sin(theta),
        jnp.broadcast_to(jnp.asarray(cos_alpha, jnp.float32), theta.shape),
    ], axis=-1)                                   # [S, 3]
    d = _unit(jnp.einsum("...ij,sj->...si", _rot_from_z_to(dq), local))
    cells = _normal_cell_id(d)                    # [L, S]
    live = (a < nb) & (nb > 0)
    return jnp.where(live, jnp.clip(cells, 0, 349), 350)


def _colored_words(dir_q, cos_alpha):
    """[L, _CONE_OH_W/32] uint32 bitmask of each Q lane's colored cone
    cells (bit c%32 of word c//32 set iff angular cell c is colored by
    the rasterization around dir_q at angle acos(cos_alpha)): the
    samples are OR-reduced into 11 words via [L, S, 11] compares —
    ~16x fewer element ops and ~8x less intermediate traffic than a
    direct [L, S, 352] iota-compare + any-reduce, which at ~26 ms/chunk
    was the dominant overhead of the round-4 exact-cone upgrade
    (docs/RESULTS.md). A scatter build was rejected earlier still: it
    lowers to a sort chain on TPU and cost more than the whole gate."""
    cells = _cone_sample_cells(dir_q, cos_alpha)           # [L, S]
    nw = _CONE_OH_W // 32
    bit = jnp.left_shift(
        jnp.uint32(1), (cells & 31).astype(jnp.uint32)
    )                                                      # [L, S]
    word = cells >> 5
    # one fused [L, S] compare + OR-reduce per word: the obvious
    # [L, S, nw] one-shot build materializes a 42 MB intermediate per
    # dense-tier base (L ~ 17k lanes), the word loop keeps it at [L, S]
    words = [
        jax.lax.reduce(
            jnp.where(word == w, bit, jnp.uint32(0)),
            jnp.uint32(0), jax.lax.bitwise_or, (1,),
        )
        for w in range(nw)
    ]
    return jnp.stack(words, axis=-1)                       # [L, nw]


def _colored_onehot(dir_q, cos_alpha):
    """[L, _CONE_OH_W] bf16 indicator of each Q lane's colored cone cells
    — the Q side of the in-gate exact cone matmul, expanded from the
    _colored_words bitmask ([L, 11, 32] shifts). bf16 holds 0/1 exactly
    and halves the MXU operand traffic."""
    words = _colored_words(dir_q, cos_alpha)
    oh = (
        words[:, :, None]
        >> jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    ) & jnp.uint32(1)                                      # [L, nw, 32]
    return oh.reshape(-1, _CONE_OH_W).astype(jnp.bfloat16)


def _cell_onehot(dir_p):
    """[L, _CONE_OH_W] bf16 one-hot of each P direction's angular cell —
    the P side of the in-gate exact cone matmul. Out-of-range ids clip to
    the boundary on BOTH sides, so identically-overshooting directions
    still match (like the reference's raw-id dict); distinct overshoots
    falsely merging at the clip is measure-zero for unit inputs."""
    c = jnp.clip(_normal_cell_id(_unit(dir_p)), 0, 349)
    return (
        c[:, None] == jnp.arange(_CONE_OH_W, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)


def _cone_accept(dir_p, dir_q, cos_alpha):
    """Literal cone-rasterization membership test of the reference's
    IndexedNormalSet::getNeighbors (normalset.hpp:166-214): a (P, Q)
    candidate survives iff the angular cell of the P pair's direction is
    one of the cells colored by sampling the circle of directions at
    angle acos(cos_alpha) around the Q pair's direction. Reference
    quirks kept: the circle perimeter uses atan(angle), not sin
    (normalset.hpp:179), and alpha == 0 renders zero samples, coloring
    nothing. dir_p/dir_q: [..., 3] (normalized here); cos_alpha is the
    raw dot between the two base segments (stocs.cpp:842 passes it
    straight through)."""
    def unit(v):
        return v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30
        )

    cell_p = _normal_cell_id(unit(dir_p))
    dq = unit(dir_q)
    ang = jnp.arccos(jnp.clip(cos_alpha, -1.0, 1.0))
    perimeter = 2.0 * jnp.pi * jnp.arctan(ang)
    nb = 2.0 * jnp.ceil(perimeter * _NG / 2.0)
    step = 2.0 * jnp.pi / jnp.maximum(nb, 1.0)
    a = jnp.arange(_CONE_MAX_SAMPLES, dtype=jnp.float32)
    theta = a * step
    sin_a = jnp.sin(ang)
    local = jnp.stack([
        sin_a * jnp.cos(theta),
        sin_a * jnp.sin(theta),
        jnp.broadcast_to(jnp.asarray(cos_alpha, jnp.float32), theta.shape),
    ], axis=-1)                                   # [S, 3]
    d = unit(jnp.einsum("...ij,sj->...si", _rot_from_z_to(dq), local))
    cell_d = _normal_cell_id(d)                   # [..., S]
    hit = jnp.any((cell_d == cell_p[..., None]) & (a < nb), axis=-1)
    return hit & (nb > 0)


def tier_plan(p_cap: int):
    """Dispatch tier construction shared by the per-base cond ladder and
    the sorted-grouped dispatch, so both run the exact same (cap, q_block)
    ladder for any max_pairs_per_bin. Returns (tiers, top) where `tiers`
    is the ascending [(cap, q_block)] list below the top tier and `top`
    is (p_cap, q_block).

    64..4096 run the full [cap, cap] gate matrix; 8192 and any
    p_cap >= 8192 block the Q axis in 4096-wide chunks to bound the gate
    intermediate at [cap, 4096]. The 8192 tier exists because the fixture
    p99 is 7887 pairs — most "dense" bases run at half the top-tier
    matrix. The 512/2048 intermediates halve the matrix for bases just
    over the 256/1024 caps: whole-phase 750 -> 694 ms on the fixture
    chunk (docs/RESULTS.md round-3 table). The 64/128 tiers carry the
    bulk of the sorted groups (fixture load p50 = 30 pairs): the gather,
    cone one-hot build and selection all scale with the cap, so the
    median base runs a 4-16x smaller program than the former 256 floor
    (round-5 measurement in docs/RESULTS.md)."""
    tiers = [
        (c, None) for c in (64, 128, 256, 512, 1024, 2048, 4096)
        if c < p_cap
    ]
    if p_cap > 8192:
        tiers.append((8192, 4096))
    if p_cap > 16384:
        # a 24576-cap config (packed preset) would otherwise run every
        # 8193..16384-pair base at the full top tier
        tiers.append((16384, 4096))
    return tiers, (p_cap, 4096 if p_cap >= 8192 else None)


def _topk_segmented(flat: jax.Array, k: int):
    """Exact top_k over a large flat vector, computed as per-segment
    top_k + a k*seg merge — the same (values, indices) lax.top_k returns,
    bit-for-bit, including tie order.

    Why identical: every global top-k element is inside its own segment's
    top-k, so the union of per-segment winners contains the global set;
    lax.top_k breaks value ties toward the LOWER index, per-segment
    winners are emitted in (segment, rank) order which for equal values
    is exactly ascending-flat-index order, so the merge's tie-break
    reproduces the flat top_k's. Why faster: the dense congruent tiers'
    selection ran one top_k over cap*sub = 131-262k slots (~0.31 ms/base,
    scripts/probe_battery.py 'dense' block); the segmented form runs the
    partial sorts over seg-fold smaller rows batched on the VPU.
    Small inputs keep the single top_k (the merge only pays at dense
    sizes)."""
    n = flat.shape[0]
    seg = 8
    if n < 32768 or n % seg or k * seg > n // seg:
        return jax.lax.top_k(flat, k)
    per = n // seg
    sv, si = jax.vmap(lambda x: jax.lax.top_k(x, k))(flat.reshape(seg, per))
    si = si + (jnp.arange(seg, dtype=si.dtype) * per)[:, None]
    top, mi = jax.lax.top_k(sv.reshape(-1), k)
    return top, si.reshape(-1)[mi]


class CongruentSets(NamedTuple):
    pairs: jax.Array        # [B, K, 2] int32 winner rows into table.pairs
    #                         (P-side pair, Q-side pair); decode to 4-point
    #                         model quads with quads_of(table, sets.pairs)
    quad_valid: jax.Array   # [B, K] bool
    total_found: jax.Array  # [B] int32 (pre-cap count, for truncation stats)
    pair_counts: jax.Array  # [B, 2] int32 (|P_pairs|, |Q_pairs|)


def selection_shortfall(sets: "CongruentSets", cfg: MatchConfig):
    """Device-side count of bases whose kept congruent sets came in
    under maximum_congruent_sets even though the gate matched at least
    oversample * k candidates — the signature of the dense tiers'
    exact-cone re-check under-filling when a saturated base's gate
    precision drops below 1/congruent_cone_oversample (ADVICE r4), or
    of stripe-selection starvation. Not an exact lost-set count (the
    gate total includes false positives the reference would never have
    kept); a nonzero value means kept pools MAY be thinner than the
    reference's cap — raise congruent_cone_oversample to recover."""
    k_cap = cfg.maximum_congruent_sets
    k_sel = k_cap * max(1, cfg.congruent_cone_oversample)
    kept = jnp.sum(sets.quad_valid.astype(jnp.int32), axis=1)
    return jnp.sum(
        ((sets.total_found >= k_sel) & (kept < k_cap)).astype(jnp.int32)
    )


def quads_of(table: PPFTable, pairs: jax.Array) -> jax.Array:
    """[..., 2] winner pair rows -> [..., 4] model point indices
    (p1, p2, q1, q2) — the reference's Quadrilateral (point3d.hpp:116-139).

    Production keeps winners as pair ROWS because the rigid fit reads the
    endpoint positions straight from ModelPack.pair_ep (2 row gathers per
    hypothesis); materializing index quads costs 2 more [K]-row gathers
    per base and is only needed by debug/parity consumers."""
    return table.pairs[pairs].reshape(pairs.shape[:-1] + (4,))


def _unit_cube_params(model_pos):
    """The reference's unit-cube normalization of the model
    (pairCreationFunctor.h:96-132): offset = bbox center, ratio = largest
    bbox extent + 0.001; worldToUnit(p) = (p - center)/ratio + 0.5."""
    lo = jnp.min(model_pos, axis=0)
    hi = jnp.max(model_pos, axis=0)
    center = (lo + hi) * 0.5
    ratio = jnp.max(hi - lo + 0.001)
    return center, ratio


def d2_test_implied(model_pos, cfg: MatchConfig) -> bool:
    """Host-side static check: does same-cell membership already imply the
    distance test, making the [P, Q] d2 matmul + compare redundant?

    In cell mode two endpoints in the same grid cell are within
    sqrt(3) * (ratio / eg_size) world units; with the reference's
    unsquared-threshold quirk (d^2 <= distance_threshold, stocs.cpp:854)
    the effective radius is sqrt(distance_threshold) — 10x the cell size
    on the bundled fixtures — so cell equality subsumes the test. Checked
    with a 1.5x safety factor on the squared bound to absorb f32
    rounding. Returns False when model_pos is traced (inside jit, e.g.
    the multi-object program): callers at a jit boundary compute it on
    the concrete arrays and pass it through `d2_implied` instead.
    Stacked [O, M, 3] packs must hold for EVERY object."""
    if cfg.congruent_distance_mode != "cell":
        return False
    try:
        mp = np.asarray(model_pos, dtype=np.float32)
    except Exception:
        return False  # traced: caller didn't precompute — keep the test
    if mp.ndim == 3:
        return all(d2_test_implied(m, cfg) for m in mp)
    lo, hi = mp.min(axis=0), mp.max(axis=0)
    ratio = np.float32((hi - lo + np.float32(0.001)).max())
    eps_n = np.float32(cfg.distance_threshold) / ratio
    eg_size = np.exp2(np.trunc(-np.log2(eps_n)))
    cell = float(ratio / eg_size)
    thresh = (
        cfg.distance_threshold
        if cfg.congruent_sqdist_quirk
        else cfg.distance_threshold ** 2
    )
    return 4.5 * cell * cell <= thresh


def extract_congruent_sets(
    key: jax.Array,
    table: PPFTable,
    model_pos: jax.Array,     # [M, 3] centered model positions
    scene_pos: jax.Array,     # [N, 3] centered scene positions
    scene_normal: jax.Array,  # [N, 3]
    base_indices: jax.Array,  # [B, 4] reordered base indices
    invariant1: jax.Array,    # [B]
    invariant2: jax.Array,    # [B]
    base_valid: jax.Array,    # [B]
    cfg: MatchConfig,
    pair_ep: jax.Array | None = None,  # [total_pairs, 6] ModelPack.pair_ep
    d2_implied: bool | None = None,    # None = auto (d2_test_implied)
) -> CongruentSets:
    """Dispatch: with `cfg.congruent_sorted_groups = G > 1` (default 8)
    bases are argsorted by pair-bin size ON DEVICE and processed G at a
    time — one lax.cond tier pick per group, the small tiers vmapped
    across the group — which amortizes the per-base fixed cost (pair
    gathers, probes, top_k) that dominates sparse bins (measured 3.7x
    per base for the cap-256 tier at G=16 on v5e). Everything stays one
    jit program (argsort + gather + scatter are device ops), so the
    grouped path also runs inside shard_map and the multi-object program
    — unlike the deleted host-partitioned executor it replaces, whose
    count-pass host sync cancelled the same gains (docs/RESULTS.md).

    G <= 1 (or a batch not divisible by G) falls back to the per-base
    lax.cond ladder. Outputs vs that ladder: identical tier per base —
    hence bit-identical quads — EXCEPT for bases in a group that
    straddles a tier boundary, which run at the group's (larger) cap:
    same candidate match set, same totals, but a different random
    subsample packing when the set exceeds maximum_congruent_sets (the
    reference's own subsample is rand()-ordered,
    stocs_match_one_object.cpp:126-143; tests/test_congruent.py pins the
    set-level equivalence)."""
    if d2_implied is None:
        d2_implied = d2_test_implied(model_pos, cfg)
    center, ratio = _unit_cube_params(model_pos)

    # grid resolution: power-of-two cell matching the reference's
    # IndexedNormalSet constructor (normalset.h:114-122): egSize =
    # 2^int(-log2(eps/ratio)), truncated toward zero like the C int cast
    eps_n = cfg.distance_threshold / ratio
    grid_depth = jnp.trunc(-jnp.log2(eps_n))
    eg_size = jnp.exp2(grid_depth)

    p_cap = cfg.max_pairs_per_bin
    # the random top-k IS the reference's random 200-subsample: when fewer
    # than maximum_congruent_sets match, all are taken
    k_cap = cfg.maximum_congruent_sets
    tiers, (_top_cap, top_qb) = tier_plan(p_cap)

    def one_base(args, fixed_tier=None):
        # the PPF-bin lookups are hoisted out of the per-base body (see
        # the vmapped `lookups` below): the sorted-grouped dispatch needs
        # the pair counts for tier selection anyway, and the probe loop
        # measured 28 us/base — doing it once, batched, instead of per
        # base (and previously per base AND per base_load) saves ~15% of
        # the whole phase (scripts/probe_onebase_decomp.py)
        bkey, bidx, inv1, inv2, bvalid, off1, cnt1, off2, cnt2 = args
        b = scene_pos[bidx]          # [4, 3]
        p_total = jnp.sum(cnt1)
        q_total = jnp.sum(cnt2)

        # angle between the two base segments (stocs.cpp:801-803)
        d01 = b[1] - b[0]
        d23 = b[3] - b[2]
        alpha = jnp.sum(
            d01 / jnp.maximum(jnp.linalg.norm(d01), 1e-30)
            * (d23 / jnp.maximum(jnp.linalg.norm(d23), 1e-30))
        )

        def seg_from_rows(rows, inv):
            # the unit-cube map is affine (uniform scale + shift), so the
            # unit-space interpolant and the pair direction both derive
            # from the world-space endpoints (the reference interpolates
            # normalized points, pairCreationFunctor.h:71-75 +
            # stocs.cpp:808-818; equal up to f32 association, i.e. a
            # possible last-ULP cell-edge flip). rows [L, 6] are the
            # (a, b) endpoint rows (ModelPack.pair_ep layout); d = b - a
            # here is the same f32 subtraction the old precomputed layout
            # baked in, so every downstream value is bit-identical.
            aw, d = rows[:, 0:3], rows[:, 3:6] - rows[:, 0:3]
            e_world = aw + inv * d
            e_unit = (e_world - center) / ratio + 0.5
            dirs = d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-30
            )
            return e_unit, e_world, dirs

        if cfg.congruent_distance_mode == "cell":
            dist_thresh = (
                cfg.distance_threshold
                if cfg.congruent_sqdist_quirk
                else cfg.distance_threshold**2
            )
        else:
            dist_thresh = cfg.distance_threshold**2

        def match_block(cap, q_block=None):
            """Gather up to `cap` pairs per side and run the gate matrix +
            random-subsample selection over the gathered lanes. Dense
            tiers (cap >= 2048, pair_ep present) gather at 4-pair block
            granularity, so pl/ql = cap + 4*slack lanes with per-lane
            validity; small tiers keep the per-pair layout (pl = ql =
            cap). The Q side is processed in nb = cap // q_block chunks,
            bounding the [pl, ql/nb] gate matrix so the densest PPF bins
            (VERDICT r1: an 11.6k-pair YCB bin vs the old 8192 cap) fit
            without a monolithic [cap, cap] intermediate."""
            qb_pairs = q_block or cap
            nb = cap // qb_pairs
            blocked = pair_ep is not None and cap >= 2048
            npairs = table.pairs.shape[0]

            if blocked:
                # dense tiers gather at blk-pair block granularity: one
                # wide row per blk pairs (gather_pair_block_srcs),
                # cutting the tier's dominant gather traffic ~blk-fold
                # for ~6% more lanes (cap + blk*slack) — XLA row gathers
                # issue at a fixed rows/s regardless of row width. blk=8
                # when the table size allows the [P/8, 48] view (tables
                # are padded to powers of two; a non-divisible custom
                # table falls back to 4). slack >= 128 (one boundary
                # block per CSR range), rounded up so the total lane
                # count divides nb*256 — every Q chunk must be a
                # 256-lane multiple (Pallas tiling + sub stripes), which
                # a fixed 256/128 slack only guaranteed for the caps
                # that happen to divide nb*1024 (a 24576 cap with nb=6
                # needs 384)
                blk = 4  # 8-pair rows measured +7 ms whole-phase (r5)
                m = nb * 256
                rem = (cap + blk * 128) % m
                slack = 128 + ((m - rem) // blk if rem else 0)
                epb = pair_ep.reshape(-1, 6 * blk)

                def side(off, cnt):
                    bsrc, lok, _t = gather_pair_block_srcs(
                        table, off, cnt, cap, blk, slack
                    )
                    lanes = bsrc.shape[0] * blk
                    rows = epb[bsrc].reshape(lanes, 6)
                    # valid lanes are a block-compacted prefix: its length
                    # bounds the Pallas kernel's dynamic grid
                    bcnt = jnp.where(
                        cnt > 0,
                        (off + cnt + blk - 1) // blk - off // blk, 0,
                    )
                    nlanes = (
                        jnp.minimum(jnp.sum(bcnt), bsrc.shape[0]) * blk
                    )
                    return rows, lok.reshape(lanes), nlanes
            else:
                def side(off, cnt):
                    src, ok, _t = gather_pair_srcs(table, off, cnt, cap)
                    if pair_ep is not None:
                        rows = pair_ep[src]
                    else:
                        pr = table.pairs[src]
                        rows = jnp.concatenate(
                            [model_pos[pr[:, 0]], model_pos[pr[:, 1]]],
                            axis=1,
                        )
                    nlanes = jnp.minimum(jnp.sum(cnt), cap)
                    return rows, ok, nlanes

            def decode(sel, off, cnt):
                # winner lane -> table.pairs row, closed-form over the
                # <=128 CSR ranges (one [K, 128] masked sum — zero
                # gathers; the old path gathered src[sel] then
                # table.pairs[...], ~800 rows per base across both
                # sides, the dominant selection-tail cost at 64M rows/s,
                # scripts/probe_onebase_decomp.py stage E). Lanes outside
                # every range (invalid winners) decode to `sel` itself,
                # clipped — masked downstream by quad_valid exactly like
                # the old clipped gather.
                if blocked:
                    bstart = off // blk
                    bcnt = jnp.where(
                        cnt > 0,
                        (off + cnt + blk - 1) // blk - bstart, 0,
                    )
                    cumb = jnp.cumsum(bcnt) - bcnt
                    t = sel // blk
                    m = (
                        (cumb[None, :] <= t[:, None])
                        & (t[:, None] < (cumb + bcnt)[None, :])
                    )
                    g = t + jnp.sum(
                        jnp.where(m, (bstart - cumb)[None, :], 0), axis=1
                    )
                    src = g * blk + sel % blk
                else:
                    start = jnp.cumsum(cnt) - cnt
                    m = (
                        (start[None, :] <= sel[:, None])
                        & (sel[:, None] < (start + cnt)[None, :])
                    )
                    src = sel + jnp.sum(
                        jnp.where(m, (off - start)[None, :], 0), axis=1
                    )
                return jnp.clip(src, 0, npairs - 1)

            p_rows, p_ok, p_lanes = side(off1, cnt1)
            q_rows, q_ok, q_lanes = side(off2, cnt2)
            pl = p_rows.shape[0]
            ql = q_rows.shape[0]
            chunk = ql // nb

            # pack the 3 cell coordinates into one int so equality is a
            # single [P, Q] compare (eg_size <= 1024 always: unit cube /
            # power-of-two cell of ~eps)
            pack = lambda c: (c[:, 0] * 1024 + c[:, 1]) * 1024 + c[:, 2]

            # Dense tiers SORT each side's lanes by packed cell id
            # (invalid lanes to the end via the int32-max sentinel;
            # stable, so equal-cell lanes keep gather order). Matches
            # require cell equality, so in sorted order they live in a
            # monotone staircase of (P tile, Q tile) pairs — the Pallas
            # call skips tiles whose cell ranges don't overlap (its
            # `live` mask below), turning the quadratic gate into work
            # ~ the same-cell join size. Selection keys/stripes read
            # POSITIONS, so sorted positions change which random
            # subsample wins (same candidate set — the reference's own
            # subsample is rand()-ordered); the XLA fallback sorts
            # identically, keeping kernel-vs-XLA bit-equality. Lane
            # counts stay a valid compacted prefix (valid lanes sort
            # first).
            banded = cap >= max(cfg.congruent_band_min_cap, _PALLAS_MIN_CAP)
            if banded:
                def cell_sort(rows, ok, inv, lanes_n):
                    e_unit, _e, _n = seg_from_rows(rows, inv)
                    c = pack(jnp.floor(e_unit * eg_size).astype(jnp.int32))
                    key = jnp.where(ok, c, jnp.int32(0x7FFFFFFF))
                    perm = jnp.argsort(key, stable=True)
                    return (rows[perm], ok[perm], key[perm], perm,
                            jnp.sum(ok.astype(jnp.int32)))

                (p_rows, p_ok, kp_s, permP, p_lanes) = cell_sort(
                    p_rows, p_ok, inv1, p_lanes
                )
                (q_rows, q_ok, kq_s, permQ, q_lanes) = cell_sort(
                    q_rows, q_ok, inv2, q_lanes
                )

            e1_unit, e1_world, n1 = seg_from_rows(p_rows, inv1)
            cell1 = jnp.floor(e1_unit * eg_size).astype(jnp.int32)
            cell1p = pack(cell1)
            sq1 = jnp.sum(e1_world * e1_world, axis=-1)

            # Keyed random subsample to k_cap — the reference's random
            # 200-subsample (stocs_match_one_object.cpp:126-143). Selection
            # must not materialize per-element state beyond the match
            # matrix: each element's key is rand_p[p] ^ rand_q[q] (pairwise-
            # decorrelated XOR of two mixed streams), packed as
            # (rand | marker bit | q index) into a positive int32 so a
            # plain max reduction both samples and records the winner (the
            # marker bit keeps every real match nonzero, so a zero-rand
            # column-0 match can never be mistaken for the empty sentinel).
            # Reducing over Q in `sub` stripes keeps up to `sub` candidates
            # per P row (pure one-per-row starves diversity when a bin has
            # few distinct P pairs); the final top_k runs over [cap*sub]
            # slots, not [cap*qb] elements. (The previous 64-segment argmax
            # scheme cost 16.6 ms per dense base on v5e — 8x this one.)
            from .ppf_table import _mix32_jnp

            salt = jax.random.bits(bkey, dtype=jnp.uint32)
            rp = _mix32_jnp(
                jnp.arange(pl, dtype=jnp.uint32) ^ salt
            )[:, None]
            col_bits = max(14, (ql - 1).bit_length())
            marker = jnp.uint32(1 << col_bits)
            rand_mask = jnp.uint32(
                0x7FFFFFFF & ~((1 << (col_bits + 1)) - 1)
            )
            # stripe count: each P row can contribute at most `sub`
            # selection candidates (one per stripe). Dense tiers keep 16
            # (the Pallas kernel's fixed stripe layout); the XLA small
            # tiers use 64 + a top-2 per stripe — bases whose matches
            # concentrate on a handful of P rows starve the kept pool at
            # 16 one-per-stripe slots (measured: a 92-match base
            # represented only ~19 candidates; 46 of its 52 true sets at
            # 64 stripes + top-2), and the reference keeps EVERY true
            # set up to the cap (stocs_match_one_object.cpp:126-143).
            # A collision-free full-matrix selection (sub = chunk, no
            # stripe reduction) was measured 3x SLOWER on the fixture
            # chunk (848 vs 291 ms congruent phase) — top_k cost scales
            # with its input — so the stripe reduction stays.
            sub = 16 if cap >= _PALLAS_MIN_CAP else 64
            while chunk % sub:
                sub //= 2

            pallas_on = (
                cfg.congruent_pallas
                if cfg.congruent_pallas is not None
                else jax.default_backend() == "tpu"
            )
            use_pallas = (
                pallas_on
                and cfg.congruent_distance_mode == "cell"
                and cfg.congruent_cos_tolerance >= 0
                and sub == 16
                # dense tiers only: at small caps the per-call kernel
                # overhead loses to XLA's fused path (synthetic e2e bench
                # measured -11% with the kernel at cap<=512); tests patch
                # the threshold to exercise the kernel on small shapes
                and cap >= _PALLAS_MIN_CAP
                and pl % 256 == 0
                and chunk % 256 == 0
            )
            # Small XLA tiers use STRIDED stripes (column c -> stripe
            # c % sub) with a wider stripe count and optional top-N
            # levels per stripe: a base's matches cluster in contiguous
            # column runs (nearby pairs of the same CSR range), which
            # contiguous stripes funnel into few slots (round 4's 64
            # contiguous stripes + top-2 measured 0.97 kept-true/
            # capped-true) while strided assignment spreads a run of
            # c <= topn*sub matches across distinct slots losslessly
            # (0.9935 at sub=256, tests/test_reference_oracle.py — the
            # residual is dense-tier, not stripe collisions). sub rides
            # the 128-lane axis (multiples of a vreg row), so the
            # [pl, chunk/sub, sub] max reduces across full registers.
            # Tiers narrower than the stripe count select over the full
            # [pl, chunk] key matrix exactly. Dense tiers keep the
            # contiguous 16-stripe membership the Pallas kernel's static
            # lane slices implement (bit-equality contract,
            # tests/test_pallas_congruent.py).
            small_xla = (
                (not use_pallas) and cap < _PALLAS_MIN_CAP and nb == 1
            )
            topn = max(1, cfg.congruent_stripe_topn) if small_xla else 1
            if small_xla:
                sub = max(128, min(cfg.congruent_sel_stripes, chunk))
                while chunk % sub:
                    sub //= 2
            full_sel = small_xla and topn * sub >= chunk
            # ... and run the EXACT cone rasterization inside the gate as
            # a [P, W] x [W, Q] one-hot MXU matmul (cell(dir_P) in
            # coloredSet(dir_Q, alpha)), replacing the cos-tolerance
            # approximation AND the post-selection re-check: every gate
            # match is a true congruent set, recall is exactly the
            # reference's, and no selection oversampling is needed. The
            # dense tiers keep the Pallas cos-gate + the oversampled
            # post-selection re-check (the kernel has no one-hot stage).
            exact_in_gate = (
                cfg.congruent_exact_cone and cap < _PALLAS_MIN_CAP
            )

            e2_unit, e2_world, n2 = seg_from_rows(q_rows, inv2)
            cell2p = pack(jnp.floor(e2_unit * eg_size).astype(jnp.int32))
            sq2 = jnp.sum(e2_world * e2_world, axis=-1)
            p_oh = _cell_onehot(n1) if exact_in_gate else None

            if use_pallas:
                from .ops import pallas_congruent as pc

                def feat(e, n, sq, cell, ok, tag):
                    # validity folds into the 16-bit cell halves: invalid
                    # rows get tag (-1 P side, -2 Q side) which no valid
                    # half (in [0, 65535]) can equal — exactly the
                    # p_ok & q_ok & cell-equality gate of the XLA path
                    lo = jnp.where(ok, cell & 0xFFFF, tag)
                    hi = jnp.where(ok, (cell >> 16) & 0xFFFF, tag)
                    return jnp.concatenate([
                        e.T, n.T, sq[None],
                        lo.astype(jnp.float32)[None],
                        hi.astype(jnp.float32)[None],
                        jnp.zeros((7, e.shape[0]), jnp.float32),
                    ], axis=0)

                pf = feat(e1_world, n1, sq1, cell1p, p_ok, -1)
                qf = feat(e2_world, n2, sq2, cell2p, q_ok, -2)
                rq_all = _mix32_jnp(
                    jnp.arange(ql, dtype=jnp.uint32) ^ salt
                    ^ jnp.uint32(0x9E3779B9)
                )
                # banded liveness: per-tile cell ranges of the SORTED
                # keys (first/last lane of each tile); a (P, Q) tile
                # pair is dead when the ranges don't overlap — a
                # superset test, so every true match survives. Fully
                # invalid tiles carry the int32-max sentinel and are
                # dead against everything (the dynamic grid prunes
                # them too).
                if banded:
                    ptile = min(pl, 256)
                    cloP, chiP = kp_s[::ptile], kp_s[ptile - 1::ptile]
                    cloQ, chiQ = kq_s[::chunk], kq_s[chunk - 1::chunk]
                    live = (
                        (cloP[:, None] <= chiQ[None, :])
                        & (cloQ[None, :] <= chiP[:, None])
                    ).astype(jnp.int32)
                else:
                    live = None
                bits = jax.lax.bitcast_convert_type
                rb, row_counts = pc.dense_gate(
                    pf, qf,
                    bits(rp[:, 0], jnp.int32), bits(rq_all, jnp.int32),
                    alpha, cfg.congruent_cos_tolerance,
                    jnp.float32(dist_thresh),
                    jnp.int32(rand_mask), jnp.int32(marker),
                    live=live,
                    q_tile=chunk, p_tile=min(pl, 256),
                    # the kernel targets TPU Mosaic (pltpu memory spaces);
                    # every other backend — CPU, GPU, anything else — must
                    # run it in the interpreter or lowering fails
                    interpret=jax.default_backend() != "tpu",
                    skip_dist=d2_implied,
                    # compacted-prefix lane counts bound the dynamic grid:
                    # gate work scales with the base's real pair counts,
                    # not the tier cap (production-mix congruent phase
                    # 273 -> 222 ms; a grid-size gate measured WORSE in
                    # the mix despite winning forced-single-tier probes,
                    # docs/RESULTS.md)
                    p_count=p_lanes, q_count=q_lanes,
                )
                row_best = jnp.where(
                    bvalid, rb.astype(jnp.uint32), jnp.uint32(0)
                )
                total = jnp.where(
                    bvalid, jnp.sum(row_counts), jnp.int32(0)
                )
                # fall through to the shared top_k/decode tail below

            def one_block(blk):
                bi, e2w, n2c, sq2c, c2p, qok = blk
                match = jnp.ones((pl, chunk), bool)
                if cfg.congruent_distance_mode == "cell":
                    match &= cell1p[:, None] == c2p[None, :]
                if not d2_implied:
                    # ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b: the cross term
                    # rides the MXU, avoiding a [P, Q, 3] broadcast
                    # intermediate. Skipped when cell equality statically
                    # implies the test (d2_test_implied).
                    d2 = (
                        sq1[:, None] + sq2c[None, :]
                        - 2.0 * jnp.dot(
                            e1_world, e2w.T,
                            preferred_element_type=jnp.float32,
                        )
                    )
                    match &= d2 <= dist_thresh
                if exact_in_gate:
                    # literal cone-rasterization membership as an MXU
                    # matmul: cell(dir_P) in coloredSet(dir_Q, alpha)
                    colored = _colored_onehot(n2c, alpha)
                    match &= jnp.dot(
                        p_oh, colored.T,
                        preferred_element_type=jnp.float32,
                    ) > 0.5
                elif cfg.congruent_cos_tolerance >= 0:
                    cos = n1 @ n2c.T
                    match &= (
                        jnp.abs(cos - alpha) <= cfg.congruent_cos_tolerance
                    )
                match &= p_ok[:, None] & qok[None, :] & bvalid

                cols = (
                    jnp.arange(chunk, dtype=jnp.uint32)
                    + jnp.uint32(chunk) * bi
                )
                rq = _mix32_jnp(cols ^ salt ^ jnp.uint32(0x9E3779B9))
                v = ((rp ^ rq[None, :]) & rand_mask) | marker | cols[None, :]
                v = jnp.where(match, v, jnp.uint32(0))
                total = jnp.sum(match.astype(jnp.int32))
                if full_sel:
                    return v, total
                if small_xla:
                    # strided membership (see the stripe-count comment)
                    vs = v.reshape(pl, chunk // sub, sub)
                    red = lambda a: jnp.max(a, axis=1)
                    mask1 = lambda cur, m: cur == m[:, None, :]
                else:
                    vs = v.reshape(pl, sub, chunk // sub)
                    red = lambda a: jnp.max(a, axis=2)
                    mask1 = lambda cur, m: cur == m[:, :, None]
                # optional top-N levels per stripe. Keys are unique
                # within a row (the column index rides the low bits),
                # so masking the running max and re-reducing is an
                # exact successive maximum.
                outs = [red(vs)]
                cur = vs
                for _ in range(topn - 1):
                    cur = jnp.where(mask1(cur, outs[-1]), jnp.uint32(0), cur)
                    outs.append(red(cur))
                m1 = outs[0] if topn == 1 else jnp.concatenate(outs, axis=1)
                return m1, total

            if use_pallas:
                pass  # row_best/total computed by the kernel above
            elif nb == 1:
                row_best, total = one_block(
                    (jnp.uint32(0), e2_world, n2, sq2, cell2p, q_ok)
                )
            else:
                block_best, btotals = jax.lax.map(
                    one_block,
                    (
                        jnp.arange(nb, dtype=jnp.uint32),
                        e2_world.reshape(nb, chunk, 3),
                        n2.reshape(nb, chunk, 3),
                        sq2.reshape(nb, chunk),
                        cell2p.reshape(nb, chunk),
                        q_ok.reshape(nb, chunk),
                    ),
                )
                row_best = jnp.max(block_best, axis=0)
                total = jnp.sum(btotals)

            # Selection. With the in-gate exact cone (small tiers) every
            # match is already a true congruent set — a plain random
            # top-k suffices. The dense tiers' cos-tolerance gate admits
            # ~half false positives at the default tolerance
            # (docs/RESULTS.md oracle table), so there the selection
            # OVERSAMPLES oversample * k_cap winners, re-checks each with
            # the literal cone rasterization, and keeps the top k_cap
            # survivors by the same random keys — the kept set is a
            # uniform random subsample of TRUE congruent sets, restoring
            # the reference's subsample-over-true-sets contract
            # (stocs_match_one_object.cpp:126-143). (A pre-top-k exact
            # re-check of EVERY stripe winner was measured 2x the whole
            # phase: the cone rasterization then runs over all [pl, SUB]
            # winners or all ql lanes per dense base instead of the
            # k_sel selected ones — docs/RESULTS.md round 5.)
            recheck = cfg.congruent_exact_cone and not exact_in_gate
            k_sel = k_cap
            if recheck:
                k_sel = min(
                    k_cap * max(1, cfg.congruent_cone_oversample),
                    row_best.size,
                )
            top, slot = _topk_segmented(
                row_best.reshape(-1).astype(jnp.int32), k_sel
            )
            gate_ok = top > 0
            # selection width per P row: the stripe count (possibly x
            # topn levels) — row_best is [pl, width] or [pl, chunk]
            pi = slot // row_best.shape[-1]
            qi = top & ((1 << col_bits) - 1)
            if recheck:
                # directions from the live gathered endpoint rows (no new
                # HBM gathers); invalid winners carry garbage rows but are
                # masked by gate_ok before the keep-selection
                dp = p_rows[pi, 3:6] - p_rows[pi, 0:3]
                dq = q_rows[qi, 3:6] - q_rows[qi, 0:3]
                exact_ok = _cone_accept(dp, dq, alpha)
                top, pick = jax.lax.top_k(
                    jnp.where(gate_ok & exact_ok, top, 0), k_cap
                )
                pi = pi[pick]
                qi = qi[pick]
                quad_valid = top > 0
            else:
                quad_valid = gate_ok
            if banded:
                # winners carry SORTED lane positions (keys/stripes);
                # the CSR decode needs the original gather positions
                pi_d, qi_d = permP[pi], permQ[qi]
            else:
                pi_d, qi_d = pi, qi
            pairs = jnp.stack(
                [decode(pi_d, off1, cnt1), decode(qi_d, off2, cnt2)],
                axis=-1,
            ).astype(jnp.int32)
            return pairs, quad_valid, total

        # tiered dispatch: most bins hold far fewer than p_cap pairs, and a
        # cap-c branch does (p_cap/c)^2 times less matrix work; the top tier
        # blocks the Q axis so its gate matrix stays <= [p_cap, 4096].
        # Fixture pair-count distribution (YCB bowl, docs/RESULTS.md):
        # p50=30, p90=535, p99=7887 — the 256 tier carries most bases at
        # ~half the 1024-tier cost (154 vs 323 us/base measured).
        if fixed_tier is not None:
            pairs, quad_valid, total = match_block(*fixed_tier)
        elif not tiers:
            pairs, quad_valid, total = match_block(p_cap, top_qb)
        else:
            def dispatch(remaining):
                if not remaining:
                    return match_block(p_cap, top_qb)
                cap, qb = remaining[0]
                return jax.lax.cond(
                    (p_total <= cap) & (q_total <= cap),
                    lambda _: match_block(cap, qb),
                    lambda _: dispatch(remaining[1:]),
                    None,
                )

            pairs, quad_valid, total = dispatch(tiers)
        return pairs, quad_valid, total, jnp.stack(
            [p_total, q_total]
        ).astype(jnp.int32)

    b = base_indices.shape[0]
    keys = jax.random.split(key, b)
    tr, rot = cfg.ppf_tr_discretization, cfg.ppf_rot_discretization

    def lookups(bidx):
        # one batched PPF-lookup pass for all bases: feeds both the
        # grouped dispatch's tier selection and the per-base matching
        bp, bn = scene_pos[bidx], scene_normal[bidx]
        off1, cnt1 = lookup_pair_range(
            table, ppf_bins(bp[0], bn[0], bp[1], bn[1], tr, rot))
        off2, cnt2 = lookup_pair_range(
            table, ppf_bins(bp[2], bn[2], bp[3], bn[3], tr, rot))
        return off1, cnt1, off2, cnt2

    offs = jax.vmap(lookups)(base_indices)
    args = (keys, base_indices, invariant1, invariant2, base_valid) + offs

    # group width: the configured G, shrunk to the largest divisor of B so
    # any batch size groups (a prime B degenerates to the per-base ladder)
    g = max(1, cfg.congruent_sorted_groups)
    while g > 1 and b % g:
        g -= 1

    if g > 1 and tiers:
        loads = jnp.maximum(
            jnp.sum(offs[1], axis=1), jnp.sum(offs[3], axis=1)
        )
        order = jnp.argsort(loads)  # stable: ties keep batch order
        gargs = jax.tree_util.tree_map(
            lambda a: a[order].reshape((b // g, g) + a.shape[1:]), args
        )
        gmax = loads[order].reshape(b // g, g).max(axis=1)

        # dense tiers (cap >= _PALLAS_MIN_CAP) may batch across the group
        # only when the Pallas gate will take them: the kernel's tiled
        # [p_tile, q_tile] working set is batch-invariant under vmap
        # (scripts/probe_dense_decomp.py: cap-8192 stage E 112 -> 93.5 ms
        # sync-adjusted at bw=8, the dynamic-grid kernel vmaps cleanly),
        # while the XLA fallback would materialize [w, pl, chunk] gate
        # matrices — so non-Pallas configs keep the sequential lax.map
        pallas_on = (
            cfg.congruent_pallas
            if cfg.congruent_pallas is not None
            else jax.default_backend() == "tpu"
        )
        dense_w = (
            min(g, 8)
            if (pallas_on and cfg.congruent_distance_mode == "cell"
                and cfg.congruent_cos_tolerance >= 0)
            else 1
        )

        def run_tier(tier, ga):
            cap = tier[0]
            f = lambda a: one_base(a, fixed_tier=tier)
            # vmap width per tier: Pallas-gated dense tiers batch 8 (see
            # dense_w; the kernel tiles, so its working set is batch-
            # invariant), non-Pallas dense tiers stay sequential (they
            # would materialize [w, pl, chunk] gate matrices), and the
            # XLA tiers batch as wide as a ~16M-element (64 MB f32) gate
            # transient allows — so wider sorted groups amortize fixed
            # per-iteration cost without scaling the transient with G
            if dense_w > 1 and cap >= _PALLAS_MIN_CAP:
                w = dense_w
            elif cap >= _PALLAS_MIN_CAP:
                w = 1
            else:
                w = max(1, min(g, (1 << 24) // (cap * cap)))
            while g % w:
                w -= 1
            if w <= 1:
                return jax.lax.map(f, ga)
            sub_g = jax.tree_util.tree_map(
                lambda a: a.reshape((g // w, w) + a.shape[1:]), ga
            )
            out = jax.lax.map(jax.vmap(f), sub_g)
            return jax.tree_util.tree_map(
                lambda a: a.reshape((g,) + a.shape[2:]), out
            )

        def one_group(inp):
            ga, gm = inp

            def pick(remaining):
                if not remaining:
                    return run_tier((p_cap, top_qb), ga)
                cap, qb = remaining[0]
                return jax.lax.cond(
                    gm <= cap,
                    lambda _: run_tier((cap, qb), ga),
                    lambda _: pick(remaining[1:]),
                    None,
                )

            return pick(tiers)

        out = jax.lax.map(one_group, (gargs, gmax))
        inv = jnp.argsort(order)
        pairs, quad_valid, totals, pair_counts = jax.tree_util.tree_map(
            lambda a: a.reshape((b,) + a.shape[2:])[inv], out
        )
    else:
        pairs, quad_valid, totals, pair_counts = jax.lax.map(
            one_base, args
        )
    return CongruentSets(pairs, quad_valid, totals, pair_counts)

