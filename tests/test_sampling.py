"""Sampling-round gate tests vs literal Python transcriptions of the
reference's probability updates (src/stocs.cpp:393-497)."""

import numpy as np
import jax.numpy as jnp

from model_matching_tpu import ppf_table, sampling
from model_matching_tpu.ops import ppf as ppfops
from tests.test_ppf import random_cloud, ref_map_insert, ref_ppf


def build_env(rng, n_model=30, n_scene=60):
    mpos, mnrm = random_cloud(rng, n_model)
    spos, snrm = random_cloud(rng, n_scene)
    table, _ = ppf_table.build_ppf_table(mpos, mnrm, 5, 5)
    ref_map = {}
    for i in range(n_model):
        for j in range(n_model):
            if i != j:
                ref_map_insert(
                    ref_map, ref_ppf(mpos[i], mnrm[i], mpos[j], mnrm[j]),
                    5, 5, (i, j),
                )
    return table, ref_map, spos, snrm


def test_round2_mask_matches_reference(rng):
    table, ref_map, spos, snrm = build_env(rng)
    n = len(spos)
    idx1 = np.array([3], np.int32)
    idx2 = np.array([17], np.int32)
    got = np.asarray(
        sampling.round2_keep_mask(
            table, jnp.asarray(spos), jnp.asarray(snrm),
            jnp.asarray(idx1), jnp.asarray(idx2), 5, 5, 30.0,
        )
    )[0]

    # literal transcription (stocs.cpp:417-442)
    v1 = spos[17] - spos[3]
    v1 = v1 / np.linalg.norm(v1)
    want = np.ones(n, bool)
    for i in range(n):
        v2 = spos[i] - spos[3]
        nv = np.linalg.norm(v2)
        v2 = v2 / nv if nv > 0 else v2 * np.nan
        ang = np.degrees(np.arccos(np.clip(v1 @ v2, -1, 1)))
        ang = min(ang, 180 - ang)
        bins = ref_ppf(spos[17], snrm[17], spos[i], snrm[i])
        in_map = tuple(bins) in ref_map
        if (not in_map) or i == 17 or (not np.isnan(ang) and ang < 30):
            want[i] = False
    mism = (got != want).sum()
    assert mism <= 1  # allow a float32 bin-boundary flip


def test_round3_mask_matches_reference(rng):
    table, ref_map, spos, snrm = build_env(rng)
    n = len(spos)
    i1, i2, i3 = 3, 17, 41
    got = np.asarray(
        sampling.round3_keep_mask(
            table, jnp.asarray(spos), jnp.asarray(snrm),
            jnp.asarray([i1]), jnp.asarray([i2]), jnp.asarray([i3]),
            5, 5, 0.015, 0.01,
        )
    )[0]

    # literal transcription (stocs.cpp:456-497)
    (x1, y1, z1), (x2, y2, z2), (x3, y3, z3) = (
        spos[i1].astype(np.float64), spos[i2].astype(np.float64),
        spos[i3].astype(np.float64),
    )
    denom = (-x3 * y2 * z1 + x2 * y3 * z1 + x3 * y1 * z2 - x1 * y3 * z2
             - x2 * y1 * z3 + x1 * y2 * z3)
    want = np.ones(n, bool)
    for i in range(n):
        if denom != 0:
            a = (-y2 * z1 + y3 * z1 + y1 * z2 - y3 * z2 - y1 * z3 + y2 * z3) / denom
            b = (x2 * z1 - x3 * z1 - x1 * z2 + x3 * z2 + x1 * z3 - x2 * z3) / denom
            c = (-x2 * y1 + x3 * y1 + x1 * y2 - x3 * y2 - x1 * y3 + x2 * y3) / denom
            pd = abs(a * spos[i][0] + b * spos[i][1] + c * spos[i][2] - 1.0)
        else:
            pd = 1e4
        bins = ref_ppf(spos[i3], snrm[i3], spos[i], snrm[i])
        in_map = tuple(bins) in ref_map
        if (
            pd > 0.015
            or np.linalg.norm(spos[i] - spos[i1]) < 0.01
            or np.linalg.norm(spos[i] - spos[i2]) < 0.01
            or np.linalg.norm(spos[i] - spos[i3]) < 0.01
            or not in_map
            or i == i3
        ):
            want[i] = False
    mism = (got != want).sum()
    assert mism <= 2  # float32 plane/bin boundary slack


def test_class_bases_determinism_and_validity(rng):
    import jax

    table, _m, spos, snrm = build_env(rng, n_model=40, n_scene=80)
    prior = rng.uniform(0.2, 1.0, 80).astype(np.float32)
    args = (
        table, jnp.asarray(spos), jnp.asarray(snrm), jnp.asarray(prior),
        jnp.ones(80, bool),
    )
    kwargs = dict(
        num_bases=16, tr_disc=5, rot_disc=5, plane_threshold=0.015,
        min_distance_base=0.01, internal_angle_threshold=30.0,
    )
    out1 = sampling.sample_class_bases(jax.random.PRNGKey(0), *args, **kwargs)
    out2 = sampling.sample_class_bases(jax.random.PRNGKey(0), *args, **kwargs)
    np.testing.assert_array_equal(np.asarray(out1.indices), np.asarray(out2.indices))
    valid = np.asarray(out1.valid)
    idx = np.asarray(out1.indices)
    # valid bases have 4 distinct points
    for b in np.flatnonzero(valid):
        assert len(set(idx[b].tolist())) == 4
    # invariants live in [0, 1]
    assert (np.asarray(out1.invariant1)[valid] >= 0).all()
    assert (np.asarray(out1.invariant1)[valid] <= 1).all()
