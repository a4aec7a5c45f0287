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
            np.asarray(ref.quads)[mv], np.asarray(pal.quads)[mv],
            err_msg=f"cap={cap}",
        )
        np.testing.assert_array_equal(
            np.asarray(ref.total_found), np.asarray(pal.total_found),
            err_msg=f"cap={cap}",
        )
        assert np.asarray(ref.quad_valid).any()
