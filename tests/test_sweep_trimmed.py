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


def _synthetic_setup():
    import tests.test_pipeline_synthetic as tps

    return tps.setup.__wrapped__()


def test_run_sweep_checkpoint_resume_bit_identical(tmp_path):
    """An interrupted + resumed sweep must reproduce the uninterrupted one
    bit for bit: chunk PRNG keys are fold_in(key0, ci), so the pooled
    winners are the only cross-chunk state and the checkpoint round-trips
    them exactly."""
    model, scene, cfg, gt, _ = _synthetic_setup()
    ckpt = str(tmp_path / "sweep.ckpt.npz")

    est_a = StocsEstimator(model, scene, cfg)
    ref = est_a.run_sweep(128, chunk=32, keep_per_chunk=32, verbose=False)

    est_b = StocsEstimator(model, scene, cfg)
    part = est_b.run_sweep(
        128, chunk=32, keep_per_chunk=32, verbose=False,
        checkpoint_path=ckpt, stop_after_chunks=2,
    )
    assert part[4]["completed"] is False
    assert part[4]["next_chunk"] == 2
    assert (tmp_path / "sweep.ckpt.npz").exists()

    est_c = StocsEstimator(model, scene, cfg)  # fresh process analogue
    res = est_c.run_sweep(
        128, chunk=32, keep_per_chunk=32, verbose=False,
        checkpoint_path=ckpt,
    )
    assert res[4]["completed"] is True
    assert not (tmp_path / "sweep.ckpt.npz").exists()  # removed when done

    assert res[0] == ref[0]                       # best lcp
    assert np.array_equal(res[1], ref[1])         # best world pose
    assert np.array_equal(res[2], ref[2])         # cluster transforms
    assert np.array_equal(res[3], ref[3])         # cluster lcps
    assert res[4]["hypotheses"] == ref[4]["hypotheses"]


def test_run_sweep_checkpoint_roundtrips_decayed_prior(tmp_path):
    """The decayed probability prior (instance-mode cross-chunk state) is
    saved and restored: a sweep started under a decayed prior and resumed
    in a fresh estimator matches the uninterrupted decayed-prior sweep."""
    import jax.numpy as jnp

    model, scene, cfg, gt, _ = _synthetic_setup()
    decayed = scene.class_prob * 0.7
    ckpt = str(tmp_path / "sweep.ckpt.npz")

    est_a = StocsEstimator(model, scene, cfg)
    est_a.class_prob = decayed
    ref = est_a.run_sweep(64, chunk=32, keep_per_chunk=32, verbose=False)

    est_b = StocsEstimator(model, scene, cfg)
    est_b.class_prob = decayed
    est_b.run_sweep(
        64, chunk=32, keep_per_chunk=32, verbose=False,
        checkpoint_path=ckpt, stop_after_chunks=1,
    )
    est_c = StocsEstimator(model, scene, cfg)  # pristine prior at start
    res = est_c.run_sweep(
        64, chunk=32, keep_per_chunk=32, verbose=False,
        checkpoint_path=ckpt,
    )
    # the restored prior drove chunk 1's sampling and the final scoring
    assert jnp.array_equal(est_c.class_prob, decayed)
    assert res[0] == ref[0]
    assert np.array_equal(res[1], ref[1])


def test_run_sweep_checkpoint_rejects_mismatch(tmp_path):
    import pytest

    model, scene, cfg, gt, _ = _synthetic_setup()
    ckpt = str(tmp_path / "sweep.ckpt.npz")
    est = StocsEstimator(model, scene, cfg)
    est.run_sweep(
        64, chunk=32, keep_per_chunk=32, verbose=False,
        checkpoint_path=ckpt, stop_after_chunks=1,
    )
    with pytest.raises(ValueError, match="seed"):
        est.run_sweep(
            64, chunk=32, keep_per_chunk=32, verbose=False,
            checkpoint_path=ckpt, seed=123,
        )
    with pytest.raises(ValueError, match="chunk"):
        est.run_sweep(
            64, chunk=16, keep_per_chunk=32, verbose=False,
            checkpoint_path=ckpt,
        )


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


def test_run_sweep_checkpoint_v1_migration(tmp_path):
    """A version-1 checkpoint (pre fit-time compaction: no chunk_slot_valid
    array) must resume instead of wedging an unattended requeue loop; the
    missing congruent-valid counts fall back to the fit-valid counts."""
    model, scene, cfg, gt, _ = _synthetic_setup()
    ckpt = str(tmp_path / "sweep.ckpt.npz")

    est_a = StocsEstimator(model, scene, cfg)
    ref = est_a.run_sweep(128, chunk=32, keep_per_chunk=32, verbose=False)

    est_b = StocsEstimator(model, scene, cfg)
    est_b.run_sweep(
        128, chunk=32, keep_per_chunk=32, verbose=False,
        checkpoint_path=ckpt, stop_after_chunks=2,
    )
    # rewrite the checkpoint as a v1 file: drop chunk_slot_valid, version=1
    with np.load(ckpt) as z:
        arrays = {k: z[k] for k in z.files if k != "chunk_slot_valid"}
    arrays["version"] = np.int64(1)
    with open(ckpt, "wb") as f:
        np.savez(f, **arrays)

    est_c = StocsEstimator(model, scene, cfg)
    res = est_c.run_sweep(
        128, chunk=32, keep_per_chunk=32, verbose=False,
        checkpoint_path=ckpt,
    )
    assert res[4]["completed"] is True
    assert res[0] == ref[0]
    assert np.array_equal(res[2], ref[2])
