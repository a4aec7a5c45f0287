"""Instance-path (edge-aware) sampling unit tests.

The instance path (model_matching_tpu/instance.py; reference:
src/stocs.cpp:559-751) was previously covered only through the packed
fixture; these tests pin its sequential semantics on a small synthetic
scene: exists_bits / hash-probe equivalence, stepwise / whole-scan
equivalence, the cross-base dispersion decay (stocs.cpp:571-580), and the
segmentation-cache reuse (rgbd.cpp:326-331).
"""

import jax
import jax.numpy as jnp
import numpy as np

from model_matching_tpu import instance, sampling
from model_matching_tpu import ppf_table
from tests.test_ppf import random_cloud


def build_scene(rng, n=64, h=24, w=32):
    mpos, mnrm = random_cloud(rng, 40)
    table, _ = ppf_table.build_ppf_table(mpos, mnrm, 5, 5)
    spos, snrm = random_cloud(rng, n)
    prob = rng.uniform(0.2, 1.0, n).astype(np.float32)
    # scatter the points over the image; keep pixels unique
    flat = rng.choice(h * w, size=n, replace=False)
    pixel = np.stack([flat // w, flat % w], axis=-1).astype(np.int32)
    edge_prob = np.zeros(n, np.float32)
    # a vertical edge wall down the middle of the image
    edge_free = np.ones((h, w), bool)
    edge_free[:, w // 2] = False
    on_wall = pixel[:, 1] == w // 2
    edge_prob[on_wall] = 1.0
    valid = np.ones(n, bool)
    return (
        table,
        jnp.asarray(spos), jnp.asarray(snrm), jnp.asarray(prob),
        jnp.asarray(edge_prob), jnp.asarray(pixel), jnp.asarray(valid),
        jnp.asarray(edge_free),
    )


def run_stepwise(env, key, bits=None, num_bases=12, block=4):
    table, pos, nrm, prob, edge_prob, pixel, valid, edge_free = env
    return instance.sample_instance_bases_stepwise(
        key, table, pos, nrm, jnp.array(prob), edge_prob, pixel, valid,
        edge_free, num_bases=num_bases, dispersion=0.9, tr_disc=5,
        rot_disc=5, plane_threshold=0.15, min_distance_base=0.01,
        internal_angle_threshold=30.0, flood_max_iters=64, block=block,
        exists_bits=bits,
    )


def test_exists_bits_equivalence(rng):
    """The bit-packed pair-existence matrix must reproduce the hash-probe
    masks exactly: identical draws, segments, and decayed probabilities."""
    env = build_scene(rng)
    table, pos, nrm = env[0], env[1], env[2]
    bits = sampling.build_exists_bits(table, pos, nrm, 5, 5, chunk=32)
    key = jax.random.PRNGKey(11)
    a = run_stepwise(env, key, bits=None)
    b = run_stepwise(env, key, bits=bits)
    np.testing.assert_array_equal(np.asarray(a.indices), np.asarray(b.indices))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(
        np.asarray(a.class_prob), np.asarray(b.class_prob), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(a.seg_masks), np.asarray(b.seg_masks)
    )


def test_stepwise_matches_whole_scan(rng):
    """The host-driven block stepper is a pure performance re-arrangement of
    the single lax.scan (instance.py docstring)."""
    env = build_scene(rng)
    table, pos, nrm, prob, edge_prob, pixel, valid, edge_free = env
    key = jax.random.PRNGKey(3)
    a = run_stepwise(env, key, num_bases=10, block=3)
    b = instance.sample_instance_bases(
        key, table, pos, nrm, jnp.array(prob), edge_prob, pixel, valid,
        edge_free, num_bases=10, dispersion=0.9, tr_disc=5, rot_disc=5,
        plane_threshold=0.15, min_distance_base=0.01,
        internal_angle_threshold=30.0, flood_max_iters=64,
    )
    np.testing.assert_array_equal(np.asarray(a.indices), np.asarray(b.indices))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(
        np.asarray(a.class_prob), np.asarray(b.class_prob), rtol=1e-6
    )


def test_dispersion_decay_and_segments(rng):
    """Points inside an earlier base's segment have their class probability
    decayed by `dispersion` before the next base samples
    (stocs.cpp:571-580), so the final class_prob is prob0 * 0.9^k with k
    bounded by the number of bases whose segment contained the point."""
    env = build_scene(rng)
    prob0 = np.asarray(env[3])
    pixel = np.asarray(env[5])
    out = run_stepwise(env, jax.random.PRNGKey(5), num_bases=12)
    final = np.asarray(out.class_prob)
    masks = np.asarray(out.seg_masks)

    ratio = final / prob0
    # every ratio must be a power of the dispersion (within float error)
    k = np.round(np.log(np.maximum(ratio, 1e-30)) / np.log(0.9))
    np.testing.assert_allclose(ratio, 0.9 ** k, rtol=1e-4)
    assert k.min() >= 0
    # a point decayed k times must lie inside at least min(k, 1) segments
    in_any = masks[1:][:, pixel[:, 0], pixel[:, 1]].any(0)
    assert np.all(in_any[k > 0])
    # and some decay must actually have happened for a sane scene
    if np.asarray(out.valid).any():
        assert (k > 0).any()


def test_segments_respect_edge_wall(rng):
    """No flood-fill segment may cross the edge wall: each segment must be
    entirely on one side of the blocked column (8-connected BFS reachability,
    rgbd.cpp:334-366)."""
    env = build_scene(rng)
    edge_free = np.asarray(env[7])
    wall_col = edge_free.shape[1] // 2
    out = run_stepwise(env, jax.random.PRNGKey(9), num_bases=12)
    masks = np.asarray(out.seg_masks)[1:]
    for m in masks:
        if not m.any():
            continue
        assert not m[:, wall_col].any()
        cols = np.flatnonzero(m.any(axis=0))
        assert (cols < wall_col).all() or (cols > wall_col).all()
