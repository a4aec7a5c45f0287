"""Pallas congruent-gate kernel vs the XLA match_block path.

The kernel mirrors the XLA path's Q-blocking and stripe membership, so
with identical per-base keys every selected quad must match exactly
(interpret mode on the CPU mesh)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from model_matching_tpu import congruent, ppf_table
from model_matching_tpu.config import MatchConfig
from model_matching_tpu.ops import invariants
from tests.test_ppf import random_cloud


def _setup(rng, cap):
    mpos = rng.uniform(-0.1, 0.1, (80, 3)).astype(np.float32)
    mpos[:, 2] = rng.normal(0, 0.002, 80)
    _junk, mnrm = random_cloud(rng, 80)
    table, _ = ppf_table.build_ppf_table(mpos, mnrm, 5, 5)
    cfg = MatchConfig(
        max_pairs_per_bin=cap,
        maximum_congruent_sets=32,
        congruent_cos_tolerance=0.3,
    )
    b = 16
    idx = np.stack([rng.choice(80, 4, replace=False) for _ in range(b)])
    perm, i1, i2, _d = invariants.reorder_base(jnp.asarray(mpos[idx]))
    bases = np.take_along_axis(idx, np.asarray(perm), axis=-1).astype(
        np.int32
    )
    valid = np.ones(b, bool)
    valid[2] = False
    args = (
        table, jnp.asarray(mpos), jnp.asarray(mpos), jnp.asarray(mnrm),
        jnp.asarray(bases), i1, i2, jnp.asarray(valid),
    )
    return args, cfg


def test_kernel_matches_xla_path(rng, monkeypatch):
    # production routes only dense tiers (cap >= 4096) to the kernel;
    # lower the threshold so small interpret-mode shapes exercise it
    monkeypatch.setattr(congruent, "_PALLAS_MIN_CAP", 256)
    for cap in (256, 1024):
        args, cfg = _setup(rng, cap)
        key = jax.random.PRNGKey(4)
        ref = congruent.extract_congruent_sets(key, *args, cfg)
        pal = congruent.extract_congruent_sets(
            key, *args, dataclasses.replace(cfg, congruent_pallas=True)
        )
        np.testing.assert_array_equal(
            np.asarray(ref.quad_valid), np.asarray(pal.quad_valid),
            err_msg=f"cap={cap}",
        )
        mv = np.asarray(ref.quad_valid)
        np.testing.assert_array_equal(
            np.asarray(ref.pairs)[mv], np.asarray(pal.pairs)[mv],
            err_msg=f"cap={cap}",
        )
        np.testing.assert_array_equal(
            np.asarray(ref.total_found), np.asarray(pal.total_found),
            err_msg=f"cap={cap}",
        )
        assert np.asarray(ref.quad_valid).any()


def test_dense_gate_accumulates_across_q_tiles(rng):
    """The cross-Q-tile accumulation (max/count merge on tile revisits)
    never runs in the single-tile parity cases above; drive dense_gate
    directly with q_tile < Q against a numpy oracle of the stripe
    semantics."""
    from model_matching_tpu.ops.pallas_congruent import SUB, dense_gate

    p, q, q_tile = 256, 512, 256
    pf = rng.normal(0, 0.05, (16, p)).astype(np.float32)
    qf = rng.normal(0, 0.05, (16, q)).astype(np.float32)
    # shared cell vocabulary so the cell gate passes often
    for f, n in ((pf, p), (qf, q)):
        cells = rng.integers(0, 6, n)
        f[6] = (f[0:3] ** 2).sum(axis=0)
        f[7] = cells
        f[8] = 0.0
    rp = rng.integers(-2**31, 2**31 - 1, p, dtype=np.int64).astype(np.int32)
    rq = rng.integers(-2**31, 2**31 - 1, q, dtype=np.int64).astype(np.int32)
    alpha, tol, thr = 0.1, 0.5, 0.01
    col_bits = 14
    marker = 1 << col_bits
    mask = 0x7FFFFFFF & ~((1 << (col_bits + 1)) - 1)

    rb, counts = dense_gate(
        jnp.asarray(pf), jnp.asarray(qf), jnp.asarray(rp), jnp.asarray(rq),
        alpha, tol, thr, mask, marker,
        q_tile=q_tile, p_tile=p, interpret=True,
    )

    # numpy oracle with identical float32 expressions
    d2 = (pf[6][:, None] + qf[6][None, :]
          - 2.0 * (pf[0:3].T @ qf[0:3]).astype(np.float32))
    cos = (pf[3:6].T @ qf[3:6]).astype(np.float32)
    match = ((pf[7][:, None] == qf[7][None, :])
             & (pf[8][:, None] == qf[8][None, :])
             & (d2 <= thr) & (np.abs(cos - alpha) <= tol))
    assert match.any() and match.sum() < match.size
    cols = np.arange(q, dtype=np.int64)[None, :]
    v = ((rp[:, None].astype(np.int64) ^ rq[None, :].astype(np.int64))
         & 0xFFFFFFFF) & mask | marker | cols
    v = np.where(match, v, 0)
    tiles = v.reshape(p, q // q_tile, SUB, q_tile // SUB)
    expect = tiles.max(axis=3).max(axis=1)  # per-tile stripes, then merge
    np.testing.assert_array_equal(np.asarray(rb), expect)
    np.testing.assert_array_equal(np.asarray(counts), match.sum(axis=1))


def test_fanout_numpy_fallback_matches_native(rng, monkeypatch):
    """fanout_keys' pure-numpy branch is dead code wherever the native
    library builds; force it and pin it against the native result."""
    from model_matching_tpu import native
    from model_matching_tpu.ppf_table import fanout_keys, pack_exact_np

    bins = np.stack([
        rng.integers(0, 300, 300),
        rng.integers(0, 181, 300),
        rng.integers(0, 181, 300),
        rng.integers(0, 181, 300),
    ], axis=-1).astype(np.int32)
    keys = np.unique(pack_exact_np(bins, 5, 5))
    keys = keys[keys >= 0]
    with_native = fanout_keys(keys, 5, 5)
    monkeypatch.setattr(native, "fanout_pack", lambda *a, **k: None)
    pure_numpy = fanout_keys(keys, 5, 5)
    np.testing.assert_array_equal(with_native, pure_numpy)


def test_dense_gate_dynamic_grid_matches_full(rng):
    """p_count/q_count bound the kernel's grid dynamically; lanes are
    compacted valid-first, so every skipped tile is all-invalid and the
    result must equal the full static grid bit-for-bit (including the
    zero-masking of never-executed P-tile rows)."""
    from model_matching_tpu.ops.pallas_congruent import dense_gate

    p, q, q_tile, p_tile = 512, 512, 256, 256
    for p_cnt, q_cnt in ((512, 512), (300, 510), (256, 256), (1, 1), (0, 0)):
        pf = rng.normal(0, 0.05, (16, p)).astype(np.float32)
        qf = rng.normal(0, 0.05, (16, q)).astype(np.float32)
        for f, n, cnt, tag in ((pf, p, p_cnt, -1), (qf, q, q_cnt, -2)):
            cells = rng.integers(0, 6, n).astype(np.float32)
            ok = np.arange(n) < cnt  # valid-first prefix
            f[6] = (f[0:3] ** 2).sum(axis=0)
            f[7] = np.where(ok, cells, tag)
            f[8] = np.where(ok, 0.0, tag)
        rp = rng.integers(-2**31, 2**31 - 1, p, dtype=np.int64).astype(np.int32)
        rq = rng.integers(-2**31, 2**31 - 1, q, dtype=np.int64).astype(np.int32)
        kw = dict(alpha=0.1, tol=0.5, dist_thresh=0.01,
                  rand_mask=0x7FFF8000 & 0x7FFFFFFF, marker=1 << 14,
                  q_tile=q_tile, p_tile=p_tile, interpret=True)
        full = dense_gate(jnp.asarray(pf), jnp.asarray(qf),
                          jnp.asarray(rp), jnp.asarray(rq), **kw)
        dyn = dense_gate(jnp.asarray(pf), jnp.asarray(qf),
                         jnp.asarray(rp), jnp.asarray(rq),
                         p_count=jnp.int32(p_cnt), q_count=jnp.int32(q_cnt),
                         **kw)
        for a, b in zip(full, dyn):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"p_cnt={p_cnt} q_cnt={q_cnt}",
            )


def test_skip_dist_matches_when_implied(rng, monkeypatch):
    """When cell equality statically implies the distance test
    (d2_test_implied), forcing the test back on must not change the
    extraction — on both the XLA and the (interpret-mode) Pallas path."""
    monkeypatch.setattr(congruent, "_PALLAS_MIN_CAP", 256)
    args, cfg = _setup(rng, 1024)
    assert congruent.d2_test_implied(args[1], cfg)
    # non-quirk squares the threshold: 4.5 * cell^2 no longer fits
    assert not congruent.d2_test_implied(
        args[1], dataclasses.replace(cfg, congruent_sqdist_quirk=False)
    )
    assert not congruent.d2_test_implied(
        args[1], dataclasses.replace(cfg, congruent_distance_mode="dist")
    )
    key = jax.random.PRNGKey(11)
    for pallas in (None, True):
        c = dataclasses.replace(cfg, congruent_pallas=pallas)
        skip = congruent.extract_congruent_sets(
            key, *args, c, d2_implied=True
        )
        keep = congruent.extract_congruent_sets(
            key, *args, c, d2_implied=False
        )
        np.testing.assert_array_equal(
            np.asarray(skip.quad_valid), np.asarray(keep.quad_valid)
        )
        mv = np.asarray(keep.quad_valid)
        np.testing.assert_array_equal(
            np.asarray(skip.pairs)[mv], np.asarray(keep.pairs)[mv]
        )
        np.testing.assert_array_equal(
            np.asarray(skip.total_found), np.asarray(keep.total_found)
        )
        assert mv.any()


def test_banded_sorted_gate_matches_unbanded(rng, monkeypatch):
    """Banded execution (lanes sorted by position cell, dead tile pairs
    skipped via the cell-range overlap mask): same TOTALS as the
    unbanded gate (the band is a superset of all matches) and
    kernel-vs-XLA bit-equality on the sorted layout. Exercised by
    lowering both the kernel threshold and congruent_band_min_cap."""
    monkeypatch.setattr(congruent, "_PALLAS_MIN_CAP", 256)
    for cap in (256, 1024):
        args, cfg = _setup(rng, cap)
        cfg_band = dataclasses.replace(cfg, congruent_band_min_cap=256)
        key = jax.random.PRNGKey(4)
        plain = congruent.extract_congruent_sets(key, *args, cfg)
        ref = congruent.extract_congruent_sets(key, *args, cfg_band)
        pal = congruent.extract_congruent_sets(
            key, *args, dataclasses.replace(cfg_band, congruent_pallas=True)
        )
        # banding never changes the match totals (selection may differ)
        np.testing.assert_array_equal(
            np.asarray(plain.total_found), np.asarray(ref.total_found),
            err_msg=f"cap={cap}",
        )
        # every kept banded set is a real set: decode to quads and check
        # they appear in the unbanded candidate universe via totals/valid
        assert int(np.asarray(ref.quad_valid).sum()) > 0
        # kernel == XLA on the banded layout, bit for bit
        np.testing.assert_array_equal(
            np.asarray(ref.quad_valid), np.asarray(pal.quad_valid),
            err_msg=f"cap={cap}",
        )
        mv = np.asarray(ref.quad_valid)
        np.testing.assert_array_equal(
            np.asarray(ref.pairs)[mv], np.asarray(pal.pairs)[mv],
            err_msg=f"cap={cap}",
        )
        np.testing.assert_array_equal(
            np.asarray(ref.total_found), np.asarray(pal.total_found),
            err_msg=f"cap={cap}",
        )
