"""Scoring kernel tests: exact grid scorer vs brute force, dense-field
scorer vs exact scorer, hybrid consistency."""

import numpy as np
import jax.numpy as jnp

from model_matching_tpu import scoring
from model_matching_tpu.ops.densefield import build_dense_field
from model_matching_tpu.ops.gridhash import build_neighbor_grid


def _setup(rng, s=600, m=150):
    scene = rng.uniform(-0.2, 0.2, (s, 3)).astype(np.float32)
    snrm = rng.normal(size=(s, 3)).astype(np.float32)
    snrm /= np.linalg.norm(snrm, axis=1, keepdims=True)
    sprob = rng.uniform(0.1, 1.0, s).astype(np.float32)
    # model points = a subset of the scene, so identity is a strong pose
    sel = rng.choice(s, m, replace=False)
    mpos = scene[sel] + rng.normal(0, 0.001, (m, 3)).astype(np.float32)
    mnrm = snrm[sel]
    return scene, snrm, sprob, mpos, mnrm


def _brute_score(tr, mpos, mnrm, scene, snrm, sprob, eps, cos_gate):
    q = mpos @ tr[:3, :3].T + tr[:3, 3]
    nq = mnrm @ tr[:3, :3].T
    d2 = ((q[:, None] - scene[None]) ** 2).sum(-1)
    idx = d2.argmin(1)
    found = d2[np.arange(len(q)), idx] <= eps * eps
    cos = (snrm[idx] * nq).sum(-1)
    w = np.where(found & (cos > cos_gate), sprob[idx], 0.0)
    return w.sum() / len(mpos)


def test_exact_scorer_matches_bruteforce(rng):
    scene, snrm, sprob, mpos, mnrm = _setup(rng)
    eps = 0.01
    grid = build_neighbor_grid(scene, cell_size=eps)
    trs = [np.eye(4, dtype=np.float32)]
    for _ in range(5):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = rng.normal(0, 0.02, 3)
        trs.append(t)
    trs = np.stack(trs)
    got = np.asarray(
        scoring.score_transforms(
            jnp.asarray(trs), jnp.ones(len(trs), bool),
            jnp.asarray(mpos), jnp.asarray(mnrm), jnp.ones(len(mpos), bool),
            grid, jnp.asarray(scene), jnp.asarray(snrm), jnp.asarray(sprob),
            eps, 30.0,
        )
    )
    want = np.array(
        [
            _brute_score(t, mpos, mnrm, scene, snrm, sprob, eps,
                         np.cos(np.radians(30)))
            for t in trs
        ]
    )
    # NN ties can pick different equal-distance points with different probs;
    # allow tiny slack
    np.testing.assert_allclose(got, want, atol=5e-3)
    assert got[0] > 0.3  # identity is a real match


def test_field_scorer_tracks_exact(rng):
    scene, snrm, sprob, mpos, mnrm = _setup(rng)
    eps = 0.01
    grid = build_neighbor_grid(scene, cell_size=eps)
    field = build_dense_field(scene, snrm, eps)
    trs = [np.eye(4, dtype=np.float32)]
    for s in (0.002, 0.005, 0.02, 0.1):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = rng.normal(0, s, 3)
        trs.append(t)
    trs = jnp.asarray(np.stack(trs))
    valid = jnp.ones(trs.shape[0], bool)
    margs = (jnp.asarray(mpos), jnp.asarray(mnrm), jnp.ones(len(mpos), bool))
    exact = np.asarray(
        scoring.score_transforms(
            trs, valid, *margs, grid,
            jnp.asarray(scene), jnp.asarray(snrm), jnp.asarray(sprob),
            eps, 30.0,
        )
    )
    fast = np.asarray(
        scoring.score_transforms_field(
            trs, valid, *margs, field, jnp.asarray(sprob), eps, 30.0
        )
    )
    # field candidate selection is per-cell: small absolute deviation allowed
    np.testing.assert_allclose(fast, exact, atol=0.05)
    # ranking of a strong pose vs junk must agree
    assert fast.argmax() == exact.argmax() == 0


def test_hybrid_final_scores_are_exact(rng):
    scene, snrm, sprob, mpos, mnrm = _setup(rng)
    eps = 0.01
    grid = build_neighbor_grid(scene, cell_size=eps)
    field = build_dense_field(scene, snrm, eps)
    h = 64
    trs = np.tile(np.eye(4, dtype=np.float32), (h, 1, 1))
    trs[:, :3, 3] = rng.normal(0, 0.05, (h, 3)).astype(np.float32)
    trs[0, :3, 3] = 0
    trs = jnp.asarray(trs)
    valid = jnp.ones(h, bool)
    margs = (jnp.asarray(mpos), jnp.asarray(mnrm), jnp.ones(len(mpos), bool))
    sargs = (jnp.asarray(scene), jnp.asarray(snrm), jnp.asarray(sprob))
    hybrid = np.asarray(
        scoring.score_hybrid(
            trs, valid, *margs, field, grid, *sargs, eps, 30.0,
            coarse_points=64, mid_fraction=0.5, refine_count=8,
        )
    )
    exact = np.asarray(
        scoring.score_transforms(trs, valid, *margs, grid, *sargs, eps, 30.0)
    )
    # the winner's hybrid score equals its exact score
    wi = hybrid.argmax()
    assert hybrid[wi] == exact[wi] or abs(hybrid[wi] - exact[wi]) < 1e-6
    assert wi == exact.argmax()


def test_hybrid_compaction_is_score_identical(rng):
    """compact_cap partitions valid slots to the front; as long as the
    valid count fits the cap, per-slot scores must match the uncompacted
    ladder exactly (same ladder inputs, just without dead padding)."""
    scene, snrm, sprob, mpos, mnrm = _setup(rng)
    eps = 0.01
    grid = build_neighbor_grid(scene, cell_size=eps)
    field = build_dense_field(scene, snrm, eps)
    h = 256
    trs = np.tile(np.eye(4, dtype=np.float32), (h, 1, 1))
    trs[:, :3, 3] = rng.normal(0, 0.05, (h, 3)).astype(np.float32)
    trs[5, :3, 3] = 0
    valid = rng.random(h) < 0.2          # ~50 valid of 256 slots
    valid[5] = True
    trs = jnp.asarray(trs)
    margs = (jnp.asarray(mpos), jnp.asarray(mnrm), jnp.ones(len(mpos), bool))
    sargs = (jnp.asarray(scene), jnp.asarray(snrm), jnp.asarray(sprob))
    kw = dict(coarse_points=64, mid_fraction=0.5, refine_count=16)
    plain = np.asarray(scoring.score_hybrid(
        trs, jnp.asarray(valid), *margs, field, grid, *sargs, eps, 30.0, **kw
    ))
    compact = np.asarray(scoring.score_hybrid(
        trs, jnp.asarray(valid), *margs, field, grid, *sargs, eps, 30.0,
        compact_cap=128, **kw
    ))
    # identical winner with identical exact score; both ladders keep exact
    # scores for every hypothesis that can win
    assert compact.argmax() == plain.argmax()
    assert compact.max() == plain.max()
    assert float(compact[5]) > 0
    # no invalid slot ever gets a real score
    assert (compact[~valid] == -1).all()


def test_hybrid_stage1_bucketing_is_bit_identical(rng):
    """When compaction engages, stage 1 runs at a device-picked bucketed
    width (h/8, h/4, h/2, h by valid count). Compacted slots past the
    valid prefix are invalid and score exactly -1.0, so every bucket must
    reproduce the full-width ladder BIT-identically — across a sparse
    batch (narrowest bucket), a dense one (falls through to full width),
    and the boundary where nv lands just over a bucket edge."""
    scene, snrm, sprob, mpos, mnrm = _setup(rng)
    eps = 0.01
    grid = build_neighbor_grid(scene, cell_size=eps)
    field = build_dense_field(scene, snrm, eps)
    h = 16384
    trs = np.tile(np.eye(4, dtype=np.float32), (h, 1, 1))
    trs[:, :3, 3] = rng.normal(0, 0.05, (h, 3)).astype(np.float32)
    trs = jnp.asarray(trs)
    margs = (jnp.asarray(mpos), jnp.asarray(mnrm), jnp.ones(len(mpos), bool))
    sargs = (jnp.asarray(scene), jnp.asarray(snrm), jnp.asarray(sprob))
    kw = dict(coarse_points=64, mid_fraction=0.08, refine_count=32,
              compact_cap=8192)  # compacted h = 8192 >= bucket floor
    for nv_target in (500,       # <= h/8 = 1024: narrowest bucket
                      1500,      # (h/8, h/4]: second bucket
                      7000):     # > h/2: full-width fallthrough
        valid = np.zeros(h, bool)
        valid[rng.choice(h, nv_target, replace=False)] = True
        bucketed = np.asarray(scoring.score_hybrid(
            trs, jnp.asarray(valid), *margs, field, grid, *sargs, eps,
            30.0, **kw
        ))
        full = np.asarray(scoring.score_hybrid(
            trs, jnp.asarray(valid), *margs, field, grid, *sargs, eps,
            30.0, bucket_stage1=False, **kw
        ))
        np.testing.assert_array_equal(bucketed, full)

    # stage-2 width exceeding the narrowest bucket (h//8 < k_mid): the
    # stage-1 top_k is folded into the bucket, so bucketing must disable
    # itself rather than run a top_k wider than its input
    valid = np.zeros(h, bool)
    valid[rng.choice(h, 500, replace=False)] = True
    kw_wide = dict(kw, mid_fraction=0.5)  # k_mid = 4096 > 8192//8
    bucketed = np.asarray(scoring.score_hybrid(
        trs, jnp.asarray(valid), *margs, field, grid, *sargs, eps,
        30.0, **kw_wide
    ))
    full = np.asarray(scoring.score_hybrid(
        trs, jnp.asarray(valid), *margs, field, grid, *sargs, eps,
        30.0, bucket_stage1=False, **kw_wide
    ))
    np.testing.assert_array_equal(bucketed, full)


def test_exact_scorer_payload_on_off_equal(rng):
    """score_transforms must return the same scores whether the grid uses
    the padded-payload fast path (with or without baked normals) or the
    probe + scan path — winners are identical, so scores differ at most
    by f32 summation of the same terms."""
    scene, snrm, sprob, mpos, mnrm = _setup(rng)
    eps = 0.01
    grids = {
        "payload+normals": build_neighbor_grid(
            scene, cell_size=eps, normal=snrm
        ),
        "payload": build_neighbor_grid(scene, cell_size=eps),
        "scan": build_neighbor_grid(scene, cell_size=eps, payload=False),
    }
    trs = [np.eye(4, dtype=np.float32)]
    for _ in range(7):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = rng.normal(0, 0.02, 3)
        trs.append(t)
    trs = jnp.asarray(np.stack(trs))
    args = (
        trs, jnp.ones(trs.shape[0], bool),
        jnp.asarray(mpos), jnp.asarray(mnrm), jnp.ones(len(mpos), bool),
    )
    tail = (jnp.asarray(scene), jnp.asarray(snrm), jnp.asarray(sprob),
            eps, 30.0)
    scores = {
        name: np.asarray(scoring.score_transforms(*args, g, *tail))
        for name, g in grids.items()
    }
    np.testing.assert_allclose(
        scores["payload+normals"], scores["scan"], rtol=1e-6
    )
    np.testing.assert_allclose(
        scores["payload"], scores["scan"], rtol=1e-6
    )

    # baked-prob route: weights read from the payload rows must equal the
    # gathered route exactly (same winners, same prob values)
    baked = build_neighbor_grid(
        scene, cell_size=eps, normal=snrm, prob=sprob
    )
    assert baked.has_probs
    got = np.asarray(scoring.score_transforms(
        *args, baked, jnp.asarray(scene), jnp.asarray(snrm), None,
        eps, 30.0,
    ))
    np.testing.assert_allclose(got, scores["scan"], rtol=1e-6)


def test_field_scorer_baked_probs_equal(rng):
    """score_transforms_field with scene_class_prob=None (prob baked into
    the field rows) must equal the gathered route exactly."""
    scene, snrm, sprob, mpos, mnrm = _setup(rng)
    eps = 0.01
    plain = build_dense_field(scene, snrm, eps)
    baked = build_dense_field(scene, snrm, eps, prob=sprob)
    assert baked.has_probs and not plain.has_probs
    trs = [np.eye(4, dtype=np.float32)]
    for _ in range(7):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = rng.normal(0, 0.02, 3)
        trs.append(t)
    trs = jnp.asarray(np.stack(trs))
    args = (
        trs, jnp.ones(trs.shape[0], bool),
        jnp.asarray(mpos), jnp.asarray(mnrm), jnp.ones(len(mpos), bool),
    )
    want = np.asarray(scoring.score_transforms_field(
        *args, plain, jnp.asarray(sprob), eps, 30.0,
    ))
    got = np.asarray(scoring.score_transforms_field(
        *args, baked, None, eps, 30.0,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert want[0] > 0.2  # identity is a real match


def test_stable_partition_sel_matches_argsort():
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    for h, cap in ((64, 16), (1024, 256), (4096, 4096)):
        v = jnp.asarray(rng.random(h) < 0.13)
        want = jnp.argsort(jnp.logical_not(v))[:cap]
        got = scoring._stable_partition_sel(v, cap)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # all-valid and all-invalid edges
    for v in (jnp.ones(128, bool), jnp.zeros(128, bool)):
        want = jnp.argsort(jnp.logical_not(v))[:32]
        got = scoring._stable_partition_sel(v, 32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
