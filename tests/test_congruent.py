"""Congruent-set extraction invariants: every returned quad must come from
the correct PPF bins and satisfy the geometric gates the reference applies
(src/stocs.cpp:753-869)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from model_matching_tpu import congruent, ppf_table
from model_matching_tpu.config import MatchConfig
from model_matching_tpu.ops import invariants
from tests.test_ppf import random_cloud, ref_map_insert, ref_ppf


def test_congruent_sets_come_from_matching_bins(rng):
    # near-planar cloud: 4-point bases then have genuine segment crossings
    # (the sampling phase only emits near-coplanar bases, stocs.cpp:456-497)
    mpos = rng.uniform(-0.1, 0.1, (60, 3)).astype(np.float32)
    mpos[:, 2] = rng.normal(0, 0.002, 60)
    _junk, mnrm = random_cloud(rng, 60)
    table, _ = ppf_table.build_ppf_table(mpos, mnrm, 5, 5)

    # the literal reference map, for cross-checking pair provenance
    ref_map = {}
    for i in range(60):
        for j in range(60):
            if i != j:
                ref_map_insert(
                    ref_map, ref_ppf(mpos[i], mnrm[i], mpos[j], mnrm[j]),
                    5, 5, (i, j),
                )

    # scene = the model itself (so congruent sets must exist); pick bases
    # directly from model points
    spos, snrm = mpos.copy(), mnrm.copy()
    cfg = MatchConfig(
        max_pairs_per_bin=1024,
        maximum_congruent_sets=64,
        congruent_cos_tolerance=0.3,
    )

    base_candidates = []
    for _ in range(500):
        idx = rng.choice(60, 4, replace=False)
        perm, i1, i2, dist = invariants.reorder_base(jnp.asarray(spos[idx]))
        if float(dist) > 0.003:  # segments must genuinely cross
            continue
        reordered = idx[np.asarray(perm)]
        b = reordered
        bins1 = ref_ppf(spos[b[0]], snrm[b[0]], spos[b[1]], snrm[b[1]])
        bins2 = ref_ppf(spos[b[2]], snrm[b[2]], spos[b[3]], snrm[b[3]])
        if tuple(bins1) in ref_map and tuple(bins2) in ref_map:
            base_candidates.append((reordered, float(i1), float(i2)))
        if len(base_candidates) == 4:
            break
    assert len(base_candidates) >= 1

    bases = np.array([b for b, _, _ in base_candidates], np.int32)
    inv1 = np.array([a for _, a, _ in base_candidates], np.float32)
    inv2 = np.array([a for _, _, a in base_candidates], np.float32)

    sets = congruent.extract_congruent_sets(
        jax.random.PRNGKey(0), table,
        jnp.asarray(mpos), jnp.asarray(spos), jnp.asarray(snrm),
        jnp.asarray(bases), jnp.asarray(inv1), jnp.asarray(inv2),
        jnp.ones(len(bases), bool), cfg,
    )
    quads = np.asarray(congruent.quads_of(table, sets.pairs))
    qvalid = np.asarray(sets.quad_valid)
    assert qvalid.any(), "self-match must produce congruent sets"

    for bi in range(len(bases)):
        b = bases[bi]
        bins1 = ref_ppf(spos[b[0]], snrm[b[0]], spos[b[1]], snrm[b[1]])
        bins2 = ref_ppf(spos[b[2]], snrm[b[2]], spos[b[3]], snrm[b[3]])
        p_set = set(map(tuple, ref_map[tuple(bins1)]))
        q_set = set(map(tuple, ref_map[tuple(bins2)]))
        # cell-mode gating: the identity correspondence is only required
        # when its e1/e2 points share a grid cell (the reference's
        # IndexedNormalSet misses straddling pairs the same way,
        # normalset.hpp:132-140)
        lo, hi = mpos.min(0), mpos.max(0)
        center, ratio = (lo + hi) / 2, (hi - lo + 0.001).max()
        unit = (mpos - center) / ratio + 0.5
        eg = 2.0 ** np.trunc(-np.log2(cfg.distance_threshold / ratio))
        eb = bases[bi]
        e1u = unit[eb[0]] + inv1[bi] * (unit[eb[1]] - unit[eb[0]])
        e2u = unit[eb[2]] + inv2[bi] * (unit[eb[3]] - unit[eb[2]])
        identity_same_cell = (
            np.floor(e1u * eg) == np.floor(e2u * eg)
        ).all()

        found_identity = False
        for k in np.flatnonzero(qvalid[bi]):
            q = quads[bi, k]
            # provenance: the quad's two pairs must come from the base's
            # PPF bins in the reference map
            assert (q[0], q[1]) in p_set, (bi, k, tuple(q))
            assert (q[2], q[3]) in q_set
            # geometric gate: intermediate points within the quirky radius
            e1 = mpos[q[0]] + inv1[bi] * (mpos[q[1]] - mpos[q[0]])
            e2 = mpos[q[2]] + inv2[bi] * (mpos[q[3]] - mpos[q[2]])
            thresh = (
                cfg.distance_threshold
                if cfg.congruent_sqdist_quirk
                else cfg.distance_threshold ** 2
            )
            assert ((e1 - e2) ** 2).sum() <= thresh * 1.0001
            if tuple(q) == (b[0], b[1], b[2], b[3]):
                found_identity = True
        # scene == model: the identity correspondence must be among the
        # matches whenever its cell gate passes and nothing was subsampled
        # away
        total = int(np.asarray(sets.total_found)[bi])
        if identity_same_cell and total <= cfg.maximum_congruent_sets:
            assert found_identity, (bi, total)


def test_dense_bin_blocked_tier_decodes_correctly():
    """PPF bins beyond 8192 pairs take the Q-blocked top tier
    (congruent.py match_block with q_block=4096); the decoded quads must
    still satisfy provenance and the geometric gates — this guards the
    block/segment index arithmetic."""
    rng = np.random.default_rng(0)
    n = 140
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # sphere of radius 0.5 + coarse discretizations concentrate most pairs
    # into a handful of bins (densest ~14.6k pairs, between 8192 and 16384)
    pos = (0.5 * v).astype(np.float32)
    nrm = v.astype(np.float32)
    tr_disc, rot_disc = 1000, 180
    table, _ = ppf_table.build_ppf_table(pos, nrm, tr_disc, rot_disc)

    cfg = MatchConfig(
        ppf_tr_discretization=tr_disc,
        ppf_rot_discretization=rot_disc,
        distance_threshold=0.05,
        max_pairs_per_bin=16384,
        maximum_congruent_sets=128,
        congruent_cos_tolerance=-1.0,  # pure distance gate: easy to verify
    )

    # find a base whose two segment features hit the dense bin
    dense_bins = None
    for _try in range(300):
        idx = rng.choice(n, 4, replace=False)
        perm, i1, i2, _d = invariants.reorder_base(jnp.asarray(pos[idx]))
        b = idx[np.asarray(perm)]
        bins1 = ref_ppf(pos[b[0]], nrm[b[0]], pos[b[1]], nrm[b[1]],
                        tr_disc, rot_disc)
        bins2 = ref_ppf(pos[b[2]], nrm[b[2]], pos[b[3]], nrm[b[3]],
                        tr_disc, rot_disc)
        o1, c1 = ppf_table.lookup_pair_range(table, jnp.asarray(bins1))
        o2, c2 = ppf_table.lookup_pair_range(table, jnp.asarray(bins2))
        t1 = int(np.sum(np.asarray(c1)))
        t2 = int(np.sum(np.asarray(c2)))
        if t1 > 8192 and t2 > 8192:
            dense_bins = (b, float(i1), float(i2), t1, t2)
            break
    assert dense_bins is not None, "no dense-bin base found"
    b, i1, i2, t1, t2 = dense_bins
    assert max(t1, t2) <= cfg.max_pairs_per_bin, "cap must not truncate"

    sets = congruent.extract_congruent_sets(
        jax.random.PRNGKey(1), table,
        jnp.asarray(pos), jnp.asarray(pos), jnp.asarray(nrm),
        jnp.asarray(b[None].astype(np.int32)),
        jnp.asarray([i1], np.float32), jnp.asarray([i2], np.float32),
        jnp.ones(1, bool), cfg,
    )
    quads = np.asarray(congruent.quads_of(table, sets.pairs))[0]
    qvalid = np.asarray(sets.quad_valid)[0]
    assert int(np.asarray(sets.pair_counts).max()) > 8192
    assert qvalid.any(), "dense self-match must produce congruent sets"

    # recompute the gates for every decoded quad
    lo, hi = pos.min(0), pos.max(0)
    center, ratio = (lo + hi) / 2, (hi - lo + 0.001).max()
    unit = (pos - center) / ratio + 0.5
    eg = 2.0 ** np.trunc(-np.log2(cfg.distance_threshold / ratio))
    for k in np.flatnonzero(qvalid):
        q = quads[k]
        assert len({q[0], q[1]}) == 2 and len({q[2], q[3]}) == 2
        e1u = unit[q[0]] + i1 * (unit[q[1]] - unit[q[0]])
        e2u = unit[q[2]] + i2 * (unit[q[3]] - unit[q[2]])
        assert (np.floor(e1u * eg) == np.floor(e2u * eg)).all(), (k, q)
        e1 = pos[q[0]] + i1 * (pos[q[1]] - pos[q[0]])
        e2 = pos[q[2]] + i2 * (pos[q[3]] - pos[q[2]])
        assert ((e1 - e2) ** 2).sum() <= cfg.distance_threshold * 1.0001


def test_config_validates_ppf_discretization():
    import pytest

    with pytest.raises(ValueError, match="rot_discretization"):
        MatchConfig(ppf_rot_discretization=3)
    with pytest.raises(ValueError, match="tr_discretization"):
        MatchConfig(ppf_tr_discretization=0)
    with pytest.raises(ValueError, match="radix"):
        ppf_table.build_ppf_table(
            np.zeros((4, 3), np.float32), np.ones((4, 3), np.float32), 5, 3
        )


def test_sorted_grouped_matches_ladder(monkeypatch):
    """The sorted-grouped dispatch must reproduce the per-base cond ladder
    base-for-base: a base whose group stays inside its own tier is
    bit-identical to the ladder; a base escalated by a tier-straddling
    group is bit-identical to a ladder forced to run everything at the
    escalated (top) cap. tier_plan is pinned to exactly two tiers (256
    and top-1024) for every run here, so those two references cover
    every base — and totals/pair_counts are selection-independent and
    must match the ladder everywhere.

    seed 0 / (160 pts, tr 35, rot 10, 48 bases) is chosen so the sorted
    groups hit all three regimes — a fully-small group, a straddling
    group (escalated bases), and dense top-tier bases — asserted
    below."""
    rng = np.random.default_rng(0)
    mpos = rng.uniform(-0.1, 0.1, (160, 3)).astype(np.float32)
    mpos[:, 2] = rng.normal(0, 0.002, 160)
    mnrm = rng.normal(size=(160, 3)).astype(np.float32)
    mnrm /= np.linalg.norm(mnrm, axis=1, keepdims=True)
    table, _ = ppf_table.build_ppf_table(mpos, mnrm, 35, 10)
    spos, snrm = mpos.copy(), mnrm.copy()
    base = MatchConfig(
        max_pairs_per_bin=1024,
        maximum_congruent_sets=16,  # < densest total: subsampling engages
        congruent_cos_tolerance=0.3,
        ppf_tr_discretization=35,
        ppf_rot_discretization=10,
    )
    cfg_g = dataclasses.replace(base, congruent_sorted_groups=16)
    cfg_l = dataclasses.replace(base, congruent_sorted_groups=0)

    b = 48
    idx = np.stack([rng.choice(160, 4, replace=False) for _ in range(b)])
    perm, i1, i2, _d = invariants.reorder_base(jnp.asarray(spos[idx]))
    bases = np.take_along_axis(idx, np.asarray(perm), axis=-1).astype(
        np.int32
    )
    valid = np.ones(b, bool)
    valid[3] = False  # masked bases must stay masked in both paths

    args = (
        table, jnp.asarray(mpos), jnp.asarray(spos), jnp.asarray(snrm),
        jnp.asarray(bases), i1, i2, jnp.asarray(valid),
    )
    key = jax.random.PRNGKey(5)
    # pin a two-tier plan (256 / top) so the two references below cover
    # every base regardless of how many intermediate tiers production
    # tier_plan grows (512/2048 were added for perf in round 3)
    monkeypatch.setattr(
        congruent, "tier_plan",
        lambda p_cap: ([(256, None)], (p_cap, None)),
    )
    grouped = congruent.extract_congruent_sets(key, *args, cfg_g)
    ladder = congruent.extract_congruent_sets(key, *args, cfg_l)
    # third reference: the ladder with its 256 tier removed, i.e. every
    # base at the top (1024) cap — what an escalated base must equal
    monkeypatch.setattr(
        congruent, "tier_plan", lambda p_cap: ([], (p_cap, None))
    )
    ladder_top = congruent.extract_congruent_sets(key, *args, cfg_l)
    monkeypatch.undo()

    np.testing.assert_array_equal(
        np.asarray(grouped.total_found), np.asarray(ladder.total_found)
    )
    np.testing.assert_array_equal(
        np.asarray(grouped.pair_counts), np.asarray(ladder.pair_counts)
    )

    # replicate the device grouping on the host: stable argsort by
    # max(p_total, q_total), group width = largest divisor of B <= 16
    loads = np.asarray(ladder.pair_counts).max(axis=1)
    g = 16
    while b % g:
        g -= 1
    assert g == 16
    order = np.argsort(loads, kind="stable")
    gmax = loads[order].reshape(b // g, g).max(axis=1)
    base_small = loads <= 256
    group_small = np.repeat(gmax <= 256, g)[np.argsort(order, kind="stable")]

    escalated = base_small & ~group_small
    kept = ~escalated
    # the mixed-density cloud must actually exercise both branches
    assert escalated.any() and (base_small & group_small).any() \
        and (~base_small).any()

    for ref, sel in ((ladder, kept), (ladder_top, escalated)):
        np.testing.assert_array_equal(
            np.asarray(grouped.quad_valid)[sel],
            np.asarray(ref.quad_valid)[sel],
        )
        mv = np.asarray(ref.quad_valid) & sel[:, None]
        np.testing.assert_array_equal(
            np.asarray(grouped.pairs)[mv], np.asarray(ref.pairs)[mv]
        )


def test_tier_plan_shared_construction():
    """Every congruent executor must run the exact same ladder for ANY
    permitted max_pairs_per_bin (ADVICE r2: a 16384-only tier in the
    then-extant partitioned executor broke output-identity for
    p_cap > 16384). tier_plan is the single source of truth; pin its
    shape at the boundary caps."""
    full = [(64, None), (128, None), (256, None), (512, None),
            (1024, None), (2048, None), (4096, None)]
    assert congruent.tier_plan(1024) == (full[:4], (1024, None))
    assert congruent.tier_plan(4096) == (full[:6], (4096, None))
    # p_cap == 8192: top tier Q-blocks (monolithic top_qb uses >= 8192)
    assert congruent.tier_plan(8192) == (full, (8192, 4096))
    assert congruent.tier_plan(16384) == (
        full + [(8192, 4096)], (16384, 4096)
    )
    # p_cap beyond 16384 (packed preset's 24576): a 16384 intermediate
    # tier keeps 8193..16384-pair bases off the top tier. The original
    # ADVICE-r2 concern — executors disagreeing on the ladder — cannot
    # recur because tier_plan is the single source of truth for both the
    # per-base ladder and the sorted-grouped dispatch.
    assert congruent.tier_plan(24576) == (
        full + [(8192, 4096), (16384, 4096)], (24576, 4096)
    )


def test_pair_ep_path_matches_index_gather_path(rng):
    """extract_congruent_sets with a precomputed ModelPack.pair_ep table
    must return bit-identical sets to the pair-index gather fallback: the
    ep rows hold the exact (a, b - a) expressions seg_points evaluates."""
    from model_matching_tpu.model import build_pair_ep

    mpos = rng.uniform(-0.1, 0.1, (60, 3)).astype(np.float32)
    mpos[:, 2] = rng.normal(0, 0.002, 60)
    _junk, mnrm = random_cloud(rng, 60)
    table, _ = ppf_table.build_ppf_table(mpos, mnrm, 5, 5)
    spos, snrm = mpos.copy(), mnrm.copy()
    cfg = MatchConfig(
        max_pairs_per_bin=1024,
        maximum_congruent_sets=64,
        congruent_cos_tolerance=0.3,
    )
    idx = np.stack([rng.choice(60, 4, replace=False) for _ in range(16)])
    inv1 = rng.uniform(0.2, 0.8, 16).astype(np.float32)
    inv2 = rng.uniform(0.2, 0.8, 16).astype(np.float32)
    args = (
        jax.random.PRNGKey(3), table,
        jnp.asarray(mpos), jnp.asarray(spos), jnp.asarray(snrm),
        jnp.asarray(idx.astype(np.int32)), jnp.asarray(inv1),
        jnp.asarray(inv2), jnp.ones(16, bool), cfg,
    )
    plain = congruent.extract_congruent_sets(*args)
    ep = build_pair_ep(jnp.asarray(mpos), table.pairs)
    fast = congruent.extract_congruent_sets(*args, pair_ep=ep)
    np.testing.assert_array_equal(
        np.asarray(plain.quad_valid), np.asarray(fast.quad_valid)
    )
    np.testing.assert_array_equal(
        np.asarray(plain.pairs)[np.asarray(plain.quad_valid)],
        np.asarray(fast.pairs)[np.asarray(fast.quad_valid)],
    )
    np.testing.assert_array_equal(
        np.asarray(plain.total_found), np.asarray(fast.total_found)
    )
