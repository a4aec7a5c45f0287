"""PPF feature/binning/table tests, cross-checked against a literal
re-derivation of the reference semantics (src/rgbd.cpp:85-154) in pure
Python ints."""

import numpy as np
import jax.numpy as jnp

from model_matching_tpu.ops import ppf
from model_matching_tpu import ppf_table


def ref_closest_bin(value: int, disc: int) -> int:
    lower = value - (value % disc)
    upper = lower + disc
    return lower if (value - lower) < (upper - value) else upper


def ref_ppf(p1, n1, p2, n2, tr=5, rot=5):
    u = p1 - p2
    f1 = int(np.linalg.norm(u) * 1000)

    def ang(a, b):
        return int(
            np.degrees(np.arctan2(np.linalg.norm(np.cross(a, b)), np.dot(a, b)))
        )

    f = [f1, ang(n1, u), ang(n2, u), ang(n1, n2)]
    return [
        ref_closest_bin(f[0], tr),
        ref_closest_bin(f[1], rot),
        ref_closest_bin(f[2], rot),
        ref_closest_bin(f[3], rot),
    ]


def ref_map_insert(ppf_map, bins, tr, rot, pair):
    """Literal transcription of ppf_map_insert (src/rgbd.cpp:123-154)."""
    for p1 in range(bins[0] - tr, bins[0] + tr, tr):
        for p2 in range(bins[1] - 2 * rot, bins[1] + 2 * rot, rot):
            for p3 in range(bins[2] - 2 * rot, bins[2] + 2 * rot, rot):
                for p4 in range(bins[3] - 2 * rot, bins[3] + 2 * rot, rot):
                    if p1 <= 5 or p2 < 0 or p3 < 0 or p4 < 0:
                        continue
                    ppf_map.setdefault((p1, p2, p3, p4), []).append(pair)


def random_cloud(rng, n):
    pos = rng.uniform(-0.1, 0.1, size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return pos, nrm


def test_closest_bin_matches_reference():
    vals = np.arange(0, 400, dtype=np.int32)
    got = np.asarray(ppf.ppf_closest_bin(jnp.asarray(vals), 5))
    want = np.array([ref_closest_bin(int(v), 5) for v in vals])
    np.testing.assert_array_equal(got, want)


def test_ppf_bins_match_reference(rng):
    pos, nrm = random_cloud(rng, 40)
    bins = np.asarray(
        ppf.ppf_bins(
            jnp.asarray(pos[:, None]),
            jnp.asarray(nrm[:, None]),
            jnp.asarray(pos[None, :]),
            jnp.asarray(nrm[None, :]),
            5,
            5,
        )
    )
    mismatch = 0
    for i in range(40):
        for j in range(40):
            if i == j:
                continue
            want = ref_ppf(pos[i], nrm[i], pos[j], nrm[j])
            if list(bins[i, j]) != want:
                # float32-vs-float64 truncation boundary: allow one-bin slack
                # only when the raw feature is within 1 unit of a bin edge
                mismatch += 1
    assert mismatch <= 2  # tolerate rare boundary flips


def test_pack_unpack_roundtrip(rng):
    bins = np.stack(
        [
            rng.integers(10, 1000, 100) // 5 * 5,
            rng.integers(0, 180, 100) // 5 * 5,
            rng.integers(0, 180, 100) // 5 * 5,
            rng.integers(0, 180, 100) // 5 * 5,
        ],
        axis=-1,
    ).astype(np.int32)
    keys = ppf_table.pack_exact_np(bins, 5, 5)
    assert (keys >= 0).all()
    back = ppf_table.unpack_key_np(keys, 5, 5)
    np.testing.assert_array_equal(back, bins)


def test_table_existence_matches_reference_map(rng):
    """Build both the dense table and a literal dict-of-lists reference map,
    then compare existence + pair lists for many query bins."""
    pos, nrm = random_cloud(rng, 25)
    tr, rot = 5, 5

    # literal reference map
    ref_map = {}
    for i in range(25):
        for j in range(25):
            if i == j:
                continue
            bins = ref_ppf(pos[i], nrm[i], pos[j], nrm[j], tr, rot)
            ref_map_insert(ref_map, bins, tr, rot, (i, j))

    table, _maxd = ppf_table.build_ppf_table(pos, nrm, tr, rot)

    # query at the exact bins of scene-like pairs (new random points)
    qpos, qnrm = random_cloud(rng, 30)
    n_checked = n_hits = 0
    for a in range(0, 30, 3):
        for b in range(30):
            if a == b:
                continue
            qbins = ref_ppf(qpos[a], qnrm[a], qpos[b], qnrm[b], tr, rot)
            key = ppf_table.pack_query_np(np.array(qbins), tr, rot)
            want_exists = tuple(qbins) in ref_map
            got_exists = bool(
                np.asarray(ppf_table.ppf_exists(table, jnp.asarray([key])))[0]
            )
            assert got_exists == want_exists, (qbins, want_exists, got_exists)
            n_checked += 1
            n_hits += want_exists

            if want_exists:
                off, cnt = ppf_table.lookup_pair_range(
                    table, jnp.asarray(qbins, dtype=jnp.int32)
                )
                got_pairs, valid, total = ppf_table.gather_pairs(
                    table, off, cnt, 4096
                )
                got = set(
                    map(tuple, np.asarray(got_pairs)[np.asarray(valid)].tolist())
                )
                want = set(ref_map[tuple(qbins)])
                assert got == want
    assert n_checked > 50
    assert n_hits > 0  # the test must actually exercise hits


def test_fast_keys_match_exact(rng):
    pos, nrm = random_cloud(rng, 120)
    p1 = jnp.asarray(pos[:, None])
    n1 = jnp.asarray(nrm[:, None])
    p2 = jnp.asarray(pos[None, :])
    n2 = jnp.asarray(nrm[None, :])
    exact = np.asarray(ppf.ppf_keys(p1, n1, p2, n2, 5, 5))
    fast = np.asarray(ppf.ppf_keys_fast(p1, n1, p2, n2, 5, 5))
    agree = (exact == fast).mean()
    assert agree > 0.9995, agree  # float boundary flips only


def test_angle_bin_index_matches_closest_bin():
    angles = np.linspace(0.0, 180.0, 3601)
    cosv = np.cos(np.radians(angles)).astype(np.float32)
    got = np.asarray(ppf.angle_bin_index(jnp.asarray(cosv), 5)) * 5
    want = np.asarray(
        ppf.ppf_closest_bin(jnp.asarray(angles.astype(np.int32)), 5)
    )
    mismatch = (got != want).sum()
    assert mismatch <= len(angles) * 0.002, mismatch


def test_probe_slots_misses():
    table_keys = jnp.asarray(np.array([-1] * 16, dtype=np.int32))
    out = np.asarray(
        ppf_table.probe_slots(table_keys, jnp.asarray([3, -1, 7]), 4)
    )
    np.testing.assert_array_equal(out, [-1, -1, -1])


def test_fanout_keys_equivalence(rng):
    """fanout_keys (quotient-space numpy + native C++) must reproduce the
    original bins-space derivation pack_query_np(unpack + deltas*scale)
    exactly — it feeds the existence table that gates every sampling
    round."""
    from model_matching_tpu import native
    from model_matching_tpu.ops.ppf import fanout_deltas
    from model_matching_tpu.ppf_table import (
        fanout_keys, pack_exact_np, pack_query_np, unpack_key_np,
    )

    tr, rot = 5, 5
    bins = np.stack([
        rng.integers(0, 300, 400),
        rng.integers(0, 181, 400),
        rng.integers(0, 181, 400),
        rng.integers(0, 181, 400),
    ], axis=-1).astype(np.int32)
    keys = np.unique(pack_exact_np(bins, tr, rot))
    keys = keys[keys >= 0]

    # the original derivation, kept here as the oracle
    uniq_bins = unpack_key_np(keys, tr, rot)
    deltas = fanout_deltas(tr, rot)
    scale = np.array([tr, rot, rot, rot], dtype=np.int32)
    fanned = uniq_bins[:, None, :] + deltas[None, :, :] * scale
    oracle = pack_query_np(fanned, tr, rot).reshape(-1)

    got = fanout_keys(keys, tr, rot)
    np.testing.assert_array_equal(got, oracle)

    if native.available():
        got_native = native.fanout_pack(keys, tr, rot, deltas)
        np.testing.assert_array_equal(got_native, oracle)


def test_direct_mapped_tables_match_probing(rng):
    """The direct-mapped twins (bin_direct / exist_direct) must reproduce
    the probing hash tables' results exactly: lookup_pair_range's
    (offset, count) per fan-out key and ppf_exists membership, including
    misses, negative keys, and out-of-range digits (a radix-64 digit >=
    the dense radix can never have been inserted)."""
    import dataclasses

    import jax

    pos = rng.normal(0, 0.05, (96, 3)).astype(np.float32)
    nrm = rng.normal(0, 1, (96, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    table, _ = ppf_table.build_ppf_table(pos, nrm, 5, 5)
    assert table.bin_direct is not None
    assert table.exist_direct is not None
    stripped = dataclasses.replace(
        table, bin_direct=None, exist_direct=None
    )

    qb = rng.integers(-10, 400, (128, 4)).astype(np.int32)
    qb[:, 1:] = rng.integers(-10, 200, (128, 3))
    f_d = jax.jit(jax.vmap(lambda q: ppf_table.lookup_pair_range(table, q)))
    f_p = jax.jit(jax.vmap(lambda q: ppf_table.lookup_pair_range(stripped, q)))
    od, cd = f_d(jnp.asarray(qb))
    op, cp = f_p(jnp.asarray(qb))
    np.testing.assert_array_equal(np.asarray(cd), np.asarray(cp))
    hit = np.asarray(cp) > 0
    np.testing.assert_array_equal(np.asarray(od)[hit], np.asarray(op)[hit])

    real = np.asarray(table.bin_keys)
    real = real[real >= 0]
    keys = np.concatenate([
        real, rng.integers(-5, 1 << 24, (5000,)).astype(np.int32)
    ])
    ed = np.asarray(ppf_table.ppf_exists(table, jnp.asarray(keys)))
    ep = np.asarray(ppf_table.ppf_exists(stripped, jnp.asarray(keys)))
    np.testing.assert_array_equal(ed, ep)


def test_direct_tables_survive_resize_and_share_shape(rng):
    """resize_table rebuilds the direct twins at a shared min size (the
    standardize / multi-object path) and direct_size=None drops them."""
    # tight cloud: natural dense key space well under the 2M min_size,
    # so the floor is what sets the shape
    pos = rng.normal(0, 0.01, (64, 3)).astype(np.float32)
    nrm = rng.normal(0, 1, (64, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    table, _ = ppf_table.build_ppf_table(pos, nrm, 5, 5)
    big = ppf_table.resize_table(
        table, table.exist_keys.shape[0], table.bin_keys.shape[0],
        table.pairs.shape[0], direct_size=1 << 21,
    )
    assert big.bin_direct.shape[0] == 1 << 21
    assert big.exist_direct.shape[0] == (1 << 21) // 32
    qb = np.asarray(
        ppf_table.unpack_key_np(
            np.asarray(table.bin_keys[table.bin_keys >= 0])[:8], 5, 5
        )
    )
    for i in range(qb.shape[0]):
        o1, c1 = ppf_table.lookup_pair_range(table, jnp.asarray(qb[i]))
        o2, c2 = ppf_table.lookup_pair_range(big, jnp.asarray(qb[i]))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    none = ppf_table.resize_table(
        table, table.exist_keys.shape[0], table.bin_keys.shape[0],
        table.pairs.shape[0], direct_size=None,
    )
    assert none.bin_direct is None and none.exist_direct is None
