"""Graceful-degradation paths: the reference never crashes on empty inputs —
failed bases are skipped and 'no pose found' is reported
(stocs.cpp:386-389, stocs_match_one_object.cpp:171-184). The masked pipeline
must do the same."""

import numpy as np
import jax
import jax.numpy as jnp

from model_matching_tpu import ppf_table, sampling, scoring
from model_matching_tpu.config import MatchConfig
from model_matching_tpu.estimator import StocsEstimator
from model_matching_tpu.model import ModelPack
from model_matching_tpu.ops.densefield import build_dense_field
from model_matching_tpu.ops.gridhash import build_neighbor_grid
from model_matching_tpu.scene import ScenePack
from tests.test_ppf import random_cloud


def test_zero_probability_scene_reports_no_pose(rng):
    cfg = MatchConfig(
        number_of_bases=8, max_scene_points=256, max_model_points=128,
        max_pairs_per_bin=256, maximum_congruent_sets=16,
    )
    mpos, mnrm = random_cloud(rng, 100)
    table, _ = ppf_table.build_ppf_table(mpos, mnrm, 5, 5)
    pad = 128
    def p(a):
        out = np.zeros((pad,) + a.shape[1:], np.float32)
        out[: len(a)] = a
        return jnp.asarray(out)
    model = ModelPack(
        pos=p(mpos - mpos.mean(0)), normal=p(mnrm),
        rgb=p(np.zeros_like(mpos)),
        valid=jnp.asarray(np.arange(pad) < 100),
        centroid=jnp.asarray(mpos.mean(0)), table=table,
    )
    spos, snrm = random_cloud(rng, 200)
    cap = 256
    scene = ScenePack(
        pos=jnp.asarray(np.concatenate(
            [spos, np.zeros((cap - 200, 3), np.float32)])),
        normal=jnp.asarray(np.concatenate(
            [snrm, np.zeros((cap - 200, 3), np.float32)])),
        rgb=jnp.zeros((cap, 3)),
        pixel=jnp.zeros((cap, 2), jnp.int32),
        class_prob=jnp.zeros(cap),  # every point below threshold
        edge_prob=jnp.zeros(cap),
        valid=jnp.asarray(np.arange(cap) < 200),
        centroid=jnp.zeros(3),
        grid=build_neighbor_grid(spos, cfg.distance_threshold),
        field=build_dense_field(spos, snrm, cfg.distance_threshold),
        icp_grid=build_neighbor_grid(spos, cfg.icp_max_corr_dist, cell_cap=64),
        edge_free=jnp.ones((8, 8), bool), has_edge=False,
    )
    result = StocsEstimator(model, scene, cfg).run(verbose=False)
    assert result.num_bases == 0
    assert result.best_index == -1
    assert result.best_transform is None


def test_best_pose_requires_positive_score():
    idx, best = scoring.best_pose(jnp.asarray([-1.0, -1.0, 0.0]))
    assert int(idx) == -1 and float(best) == 0.0
    idx, best = scoring.best_pose(jnp.asarray([-1.0, 0.25, 0.1]))
    assert int(idx) == 1 and abs(float(best) - 0.25) < 1e-7


def test_categorical_rows_zero_mass(rng):
    probs = jnp.zeros((3, 50))
    idx, ok = sampling._categorical_rows(jax.random.PRNGKey(0), probs)
    assert not np.asarray(ok).any()
