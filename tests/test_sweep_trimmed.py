"""run_sweep (chunked large-budget path) + trimmed ICP tests."""

import numpy as np
import jax.numpy as jnp

from model_matching_tpu.estimator import StocsEstimator
from model_matching_tpu import icp
from model_matching_tpu.ops.gridhash import build_neighbor_grid


def test_run_sweep_finds_pose(setup=None):
    from tests.test_pipeline_synthetic import (  # reuse the GT fixture setup
        ground_truth_pose, make_model,
    )
    import tests.test_pipeline_synthetic as tps
    import pytest

    # build the same synthetic scene the module fixture builds
    setup = tps.setup.__wrapped__()
    model, scene, cfg, gt, (mpos, spos_obj) = setup

    est = StocsEstimator(model, scene, cfg)
    best_lcp, best_w, cl_t, cl_s, stats = est.run_sweep(
        total_bases=64, chunk=32, keep_per_chunk=32, verbose=False
    )
    assert best_lcp > 0.4
    from scipy.spatial import cKDTree

    moved = mpos @ best_w[:3, :3].T + best_w[:3, 3]
    d, _ = cKDTree(spos_obj).query(moved)
    assert np.median(d) < 1.5 * cfg.distance_threshold
    assert stats["hypotheses"] > 50
    assert len(cl_s) >= 1 and cl_s[0] == best_lcp


def test_trimmed_icp_ignores_outlier_region(rng):
    # target: plane trio; source adds a cluster of outlier points that plain
    # point-to-plane would chase
    n = 900
    k = n // 3
    t1 = np.stack([rng.uniform(-0.2, 0.2, k), rng.uniform(-0.2, 0.2, k),
                   np.zeros(k)], axis=1)
    t2 = np.stack([rng.uniform(-0.2, 0.2, k), np.zeros(k),
                   rng.uniform(-0.2, 0.2, k)], axis=1)
    t3 = np.stack([np.zeros(k), rng.uniform(-0.2, 0.2, k),
                   rng.uniform(-0.2, 0.2, k)], axis=1)
    target = np.concatenate([t1, t2, t3]).astype(np.float32)
    nrm = np.concatenate([
        np.tile([0, 0, 1.0], (k, 1)), np.tile([0, 1.0, 0], (k, 1)),
        np.tile([1.0, 0, 0], (k, 1)),
    ]).astype(np.float32)

    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0.008, -0.006, 0.01]
    source = target @ gt[:3, :3].T + gt[:3, 3]
    # 15% of source points displaced (occluded region analogue)
    m = int(0.15 * n)
    source[:m] += np.array([0.03, 0.03, 0.0], np.float32)

    grid = build_neighbor_grid(target, cell_size=0.035)
    off = np.asarray(
        icp.trimmed_icp(
            jnp.asarray(source), jnp.ones(n, bool),
            jnp.asarray(target), jnp.asarray(nrm), grid,
            trim_fraction=0.7,
        )
    )
    residual = off @ gt
    assert np.linalg.norm(residual[:3, 3]) < 4e-3
    np.testing.assert_allclose(residual[:3, :3], np.eye(3), atol=6e-3)
