"""Flood-fill segmentation vs a literal BFS re-derivation of the reference
(src/rgbd.cpp:314-367)."""

from collections import deque

import numpy as np
import jax.numpy as jnp

from model_matching_tpu import flood


def ref_bfs(seed, edge_free, max_dist):
    """Literal queue-based transcription: seed always marked; neighbors
    need free space, not-yet-expanded, and dist(seed) < max_dist."""
    h, w = edge_free.shape
    closed = np.zeros((h, w), bool)
    q = deque([tuple(seed)])
    closed[seed[0], seed[1]] = True
    while q:
        r, c = q.popleft()
        for i in range(r - 1, r + 2):
            for j in range(c - 1, c + 2):
                if i < 0 or j < 0 or i >= h or j >= w:
                    continue
                d = np.sqrt((seed[0] - i) ** 2 + (seed[1] - j) ** 2)
                if not closed[i, j] and edge_free[i, j] and d < max_dist:
                    closed[i, j] = True
                    q.append((i, j))
    return closed


def test_flood_fill_matches_bfs(rng):
    h, w = 48, 64
    edge_free = np.ones((h, w), bool)
    # draw walls
    edge_free[20, 5:40] = False
    edge_free[5:20, 30] = False
    edge_free[rng.integers(0, h, 40), rng.integers(0, w, 40)] = False
    seed = np.array([10, 10], np.int32)
    edge_free[10, 10] = True

    for max_dist in (8.0, 20.0, 100.0):
        want = ref_bfs(seed, edge_free, max_dist)
        got = np.asarray(
            flood.flood_fill(
                jnp.asarray(seed), jnp.asarray(edge_free), max_dist,
                max_iters=128,
            )
        )
        np.testing.assert_array_equal(got, want)


def test_flood_fill_matches_bfs_spiral(rng):
    """Worst-case bend count: a spiral corridor. Exercises the sweep
    propagation's convergence, not just simple rooms."""
    h = w = 64
    edge_free = np.ones((h, w), bool)
    # build a rectangular spiral of walls
    top, bot, left, right = 2, h - 3, 2, w - 3
    gap = 3
    while top < bot and left < right:
        edge_free[top, left:right] = False
        edge_free[top:bot, right] = False
        edge_free[bot, left + gap:right] = False
        edge_free[top + gap:bot, left] = False
        top += gap
        bot -= gap
        left += gap
        right -= gap
    seed = np.array([h // 2, w // 2], np.int32)
    edge_free[seed[0], seed[1]] = True
    want = ref_bfs(seed, edge_free, 1000.0)
    got = np.asarray(
        flood.flood_fill(
            jnp.asarray(seed), jnp.asarray(edge_free), 1000.0, max_iters=512
        )
    )
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 100  # the spiral must actually be traversed


def test_flood_fill_blocked_seed():
    edge_free = np.zeros((16, 16), bool)
    got = np.asarray(
        flood.flood_fill(
            jnp.asarray(np.array([8, 8], np.int32)),
            jnp.asarray(edge_free), 100.0, max_iters=32,
        )
    )
    assert got[8, 8]  # seed always marked, like the reference
    assert got.sum() == 1


def ref_bfs_local(seed, edge_free, max_dist, depth_limit=100):
    """Literal transcription of generate_local_segmentation_mask
    (src/rgbd.cpp:369-420): BFS additionally bounded by graph depth."""
    h, w = edge_free.shape
    closed = np.zeros((h, w), bool)
    q = deque([(tuple(seed), 0)])
    closed[seed[0], seed[1]] = True
    while q:
        (r, c), depth = q.popleft()
        for i in range(r - 1, r + 2):
            for j in range(c - 1, c + 2):
                if i < 0 or j < 0 or i >= h or j >= w:
                    continue
                d = np.sqrt((seed[0] - i) ** 2 + (seed[1] - j) ** 2)
                if (not closed[i, j] and edge_free[i, j] and d < max_dist
                        and depth + 1 < depth_limit):
                    closed[i, j] = True
                    q.append(((i, j), depth + 1))
    return closed


def test_local_flood_fill_matches_depth_bounded_bfs(rng):
    h, w = 48, 64
    edge_free = np.ones((h, w), bool)
    edge_free[20, 5:40] = False
    edge_free[rng.integers(0, h, 30), rng.integers(0, w, 30)] = False
    seed = np.array([10, 10], np.int32)
    edge_free[10, 10] = True
    for depth in (5, 12, 200):
        want = ref_bfs_local(seed, edge_free, 100.0, depth_limit=depth)
        got = np.asarray(
            flood.local_flood_fill(
                jnp.asarray(seed), jnp.asarray(edge_free), 100.0,
                depth_limit=depth,
            )
        )
        np.testing.assert_array_equal(got, want)


def test_prune_edge_points():
    probs = jnp.asarray(np.array([0.5, 0.3, 0.2], np.float32))
    edge = jnp.asarray(np.array([0.0, 1.0, 0.5], np.float32))
    out = np.asarray(flood.prune_edge_points(probs, edge))
    np.testing.assert_allclose(out, [0.5, 0.0, 0.2])


def test_fixed_sweeps_matches_bfs_on_fixture_edge_map():
    """The production default (fixed_sweeps=8, config.flood_fill_sweeps)
    must reach the exact BFS fixpoint on the real packed edge map
    (the only bundled fixture with an edge image)."""
    from model_matching_tpu.io import image

    edge = image.read_u8(
        "/root/reference/examples/packed/probability_maps/edge.png"
    )
    edge_free = edge == 255  # reference: free space is value 255
    rng = np.random.default_rng(4)
    free_rc = np.argwhere(edge_free)
    seeds = free_rc[rng.choice(len(free_rc), size=6, replace=False)]
    for seed in seeds:
        for r in (40.0, 150.0, 640.0):
            want = ref_bfs(seed.astype(np.int32), edge_free, r)
            got = np.asarray(
                flood.flood_fill(
                    jnp.asarray(seed.astype(np.int32)),
                    jnp.asarray(edge_free), r, fixed_sweeps=8,
                )
            )
            np.testing.assert_array_equal(got, want)


def test_fixed_sweeps_matches_bfs_spiral_when_enough():
    """On the adversarial spiral (bend count >> 8) a large fixed sweep
    count still reaches the exact fixpoint; the sweep operator is monotone
    and idempotent there, so extra sweeps are harmless."""
    h = w = 64
    edge_free = np.ones((h, w), bool)
    top, bot, left, right = 2, h - 3, 2, w - 3
    gap = 3
    while top < bot and left < right:
        edge_free[top, left:right] = False
        edge_free[top:bot, right] = False
        edge_free[bot, left + gap:right] = False
        edge_free[top + gap:bot, left] = False
        top += gap
        bot -= gap
        left += gap
        right -= gap
    seed = np.array([h // 2, w // 2], np.int32)
    edge_free[seed[0], seed[1]] = True
    want = ref_bfs(seed, edge_free, 1000.0)
    got = np.asarray(
        flood.flood_fill(
            jnp.asarray(seed), jnp.asarray(edge_free), 1000.0,
            fixed_sweeps=64,
        )
    )
    np.testing.assert_array_equal(got, want)
