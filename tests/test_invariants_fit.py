"""Invariant/reordering/rigid-fit tests against literal Python re-derivations
of the reference math (src/stocs.cpp:155-361) and scipy."""

import numpy as np
import jax.numpy as jnp

from model_matching_tpu.ops import fit, invariants


def ref_segment_invariants(p1, p2, q1, q2):
    """Literal scalar transcription of segment_distance_and_invariants
    (src/stocs.cpp:155-222)."""
    eps = 1e-4
    u = p2 - p1
    v = q2 - q1
    w = p1 - q1
    a, b, c = u @ u, u @ v, v @ v
    d, e = u @ w, v @ w
    f = a * c - b * b
    s1, s2, t1, t2 = 0.0, f, 0.0, f
    if f < eps:
        s1, s2, t1, t2 = 0.0, 1.0, e, c
    else:
        s1 = b * e - c * d
        t1 = a * e - b * d
        if s1 < 0.0:
            s1, t1, t2 = 0.0, e, c
        elif s1 > s2:
            s1, t1, t2 = s2, e + b, c
    if t1 < 0.0:
        t1 = 0.0
        if -d < 0.0:
            s1 = 0.0
        elif -d > a:
            s1 = s2
        else:
            s1, s2 = -d, a
    elif t1 > t2:
        t1 = t2
        if (-d + b) < 0.0:
            s1 = 0.0
        elif (-d + b) > a:
            s1 = s2
        else:
            s1, s2 = (-d + b), a
    i1 = 0.0 if abs(s1) < eps else s1 / s2
    i2 = 0.0 if abs(t1) < eps else t1 / t2
    dist = np.linalg.norm(w + i1 * u - i2 * v)
    return dist, i1, i2


def test_segment_invariants_match_reference(rng):
    for _ in range(300):
        pts = rng.normal(size=(4, 3)).astype(np.float32)
        want = ref_segment_invariants(*[p.astype(np.float64) for p in pts])
        got = invariants.segment_invariants(*[jnp.asarray(p) for p in pts])
        got = tuple(float(np.asarray(g)) for g in got)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_segment_invariants_crossing_planar():
    # unit square: diagonals cross at the middle -> invariants 0.5, 0.5
    p1, p2 = np.array([0, 0, 0.0]), np.array([1, 1, 0.0])
    q1, q2 = np.array([1, 0, 0.0]), np.array([0, 1, 0.0])
    d, i1, i2 = (
        float(np.asarray(x))
        for x in invariants.segment_invariants(
            *(jnp.asarray(v, dtype=jnp.float32) for v in (p1, p2, q1, q2))
        )
    )
    assert abs(d) < 1e-6
    assert abs(i1 - 0.5) < 1e-6 and abs(i2 - 0.5) < 1e-6


def test_reorder_base_picks_min_crossing(rng):
    for _ in range(50):
        base = rng.normal(size=(4, 3)).astype(np.float32)
        perm, i1, i2, dist = invariants.reorder_base(jnp.asarray(base))
        perm = np.asarray(perm)
        # brute force over the same 12 permutations
        best = (np.inf, None)
        for p in invariants._PERMS:
            d, a, b = ref_segment_invariants(
                *[base[i].astype(np.float64) for i in p]
            )
            if d < best[0]:
                best = (d, tuple(p), a, b)
        assert float(dist) <= best[0] + 1e-3
        # distances can tie within tolerance across permutations; require the
        # selected distance to match, not the exact permutation
        np.testing.assert_allclose(float(dist), best[0], atol=1e-3)


def _random_rigid(rng):
    from scipy.spatial.transform import Rotation

    r = Rotation.random(rng=rng).as_matrix()
    t = rng.normal(size=3)
    m = np.eye(4)
    m[:3, :3] = r
    m[:3, 3] = t
    return m.astype(np.float32)


def test_fit_recovers_known_transform(rng):
    m = _random_rigid(rng)
    model_quad = rng.normal(size=(4, 3)).astype(np.float32)
    scene_quad = model_quad @ m[:3, :3].T + m[:3, 3]
    out = fit.fit_congruent_pairs(
        jnp.asarray(scene_quad),
        jnp.asarray(model_quad),
        jnp.zeros(3),
        jnp.zeros(3),
    )
    assert bool(np.asarray(out["valid"]))
    got = np.asarray(out["transform"])
    np.testing.assert_allclose(got, m, atol=5e-5)
    np.testing.assert_allclose(np.asarray(out["world_transform"]), m, atol=5e-5)
    assert float(np.asarray(out["rms"])) < 1e-4


def test_fit_world_transform_uncenters(rng):
    m = _random_rigid(rng)
    cs = rng.normal(size=3).astype(np.float32)  # scene centroid
    cm = rng.normal(size=3).astype(np.float32)  # model centroid
    model_world = rng.normal(size=(4, 3)).astype(np.float32)
    scene_world = model_world @ m[:3, :3].T + m[:3, 3]
    out = fit.fit_congruent_pairs(
        jnp.asarray(scene_world - cs),
        jnp.asarray(model_world - cm),
        jnp.asarray(cs),
        jnp.asarray(cm),
    )
    got = np.asarray(out["world_transform"])
    # the world transform must map the original model points onto the
    # original scene points
    mapped = model_world @ got[:3, :3].T + got[:3, 3]
    np.testing.assert_allclose(mapped, scene_world, atol=1e-4)


def test_fit_rejects_degenerate(rng):
    quad = np.zeros((4, 3), np.float32)  # all-coincident
    out = fit.fit_congruent_pairs(
        jnp.asarray(quad), jnp.asarray(quad), jnp.zeros(3), jnp.zeros(3)
    )
    assert not bool(np.asarray(out["valid"]))


def test_fit_batched(rng):
    quads_m = rng.normal(size=(16, 4, 3)).astype(np.float32)
    m = _random_rigid(rng)
    quads_s = quads_m @ m[:3, :3].T + m[:3, 3]
    out = fit.fit_congruent_pairs(
        jnp.asarray(quads_s), jnp.asarray(quads_m), jnp.zeros(3), jnp.zeros(3)
    )
    assert np.asarray(out["valid"]).all()
    np.testing.assert_allclose(
        np.asarray(out["transform"]),
        np.broadcast_to(m, (16, 4, 4)),
        atol=1e-4,
    )
