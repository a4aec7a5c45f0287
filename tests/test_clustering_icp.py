"""Clustering + ICP tests: quaternion/euler parity with a literal
transcription of the reference math (src/pose_clustering.cpp:5-121), greedy
semantics, and ICP convergence on known perturbations."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from model_matching_tpu import clustering, icp
from model_matching_tpu.ops.gridhash import build_neighbor_grid


def ref_quat_to_euler(q):
    w, x, y, z = q
    sinr = 2 * (w * x + y * z)
    cosr = 1 - 2 * (x * x + y * y)
    roll = np.arctan2(sinr, cosr)
    sinp = 2 * (w * y - z * x)
    pitch = np.copysign(np.pi / 2, sinp) if abs(sinp) >= 1 else np.arcsin(sinp)
    siny = 2 * (w * z + x * y)
    cosy = 1 - 2 * (y * y + z * z)
    return np.array([roll, pitch, np.arctan2(siny, cosy)])


def ref_pose_diff(test, base, sym):
    rd = test[:3, :3].T @ base[:3, :3]
    q = Rotation.from_matrix(rd).as_quat()  # x y z w
    e = np.degrees(ref_quat_to_euler([q[3], q[0], q[1], q[2]]))
    e = np.abs(e)
    for d in range(3):
        if sym[d] == 90:
            e[d] = abs(e[d] - 90)
            e[d] = min(e[d], 90 - e[d])
        elif sym[d] == 180:
            e[d] = min(e[d], 180 - e[d])
        elif sym[d] == 360:
            e[d] = 0
    rot = e.max()
    tr = np.linalg.norm(test[:3, 3] - base[:3, 3])
    return rot, tr


def rand_pose(rng):
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = Rotation.random(rng=rng).as_matrix()
    m[:3, 3] = rng.normal(0, 0.1, 3)
    return m


def test_matrix_to_quaternion_roundtrip(rng):
    rots = Rotation.random(64, rng=rng).as_matrix().astype(np.float32)
    q = np.asarray(clustering.matrix_to_quaternion(jnp.asarray(rots)))
    back = Rotation.from_quat(
        np.concatenate([q[:, 1:], q[:, :1]], axis=1)
    ).as_matrix()
    np.testing.assert_allclose(back, rots, atol=1e-4)


def test_pose_difference_matches_reference(rng):
    for sym in ([0, 0, 0], [0, 0, 360], [90, 0, 180]):
        for _ in range(30):
            a, b = rand_pose(rng), rand_pose(rng)
            rot, tr = clustering.pose_difference(
                jnp.asarray(a), jnp.asarray(b),
                jnp.asarray(np.array(sym, np.float32)),
            )
            wrot, wtr = ref_pose_diff(
                a.astype(np.float64), b.astype(np.float64), sym
            )
            # quaternion sign conventions can differ; euler magnitudes match
            np.testing.assert_allclose(float(tr), wtr, atol=1e-5)
            np.testing.assert_allclose(float(rot), wrot, atol=0.1)


def test_greedy_clustering_selects_distinct(rng):
    # three tight clusters of poses with distinct translations
    centers = [np.array([0, 0, 0.5]), np.array([0.2, 0, 0.5]),
               np.array([0, 0.2, 0.5])]
    poses, lcps = [], []
    for ci, c in enumerate(centers):
        for k in range(10):
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = Rotation.from_euler(
                "z", rng.normal(0, 2), degrees=True
            ).as_matrix()
            m[:3, 3] = c + rng.normal(0, 0.002, 3)
            poses.append(m)
            lcps.append(0.9 - 0.1 * ci - 0.01 * k)
    poses = jnp.asarray(np.stack(poses))
    lcps = jnp.asarray(np.array(lcps, np.float32))
    valid = jnp.ones(30, bool)
    idx, mask = clustering.greedy_clustering(
        poses, lcps, valid,
        acceptable_fraction=0.5, best_score=jnp.float32(0.9),
        maximum_pose_count=5, min_distance=0.05, min_angle=10.0,
        sym_info=jnp.zeros(3),
    )
    sel = np.asarray(idx)[np.asarray(mask)]
    assert len(sel) == 3  # one representative per cluster
    got_centers = np.asarray(poses)[sel][:, :3, 3]
    d = np.linalg.norm(
        got_centers[:, None] - np.stack(centers)[None], axis=-1
    )
    assert (d.min(axis=1) < 0.01).all()
    # representatives are the highest-lcp member of each cluster
    assert sel[0] == 0


def test_greedy_clustering_prunes_low_scores():
    poses = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 4))
    lcps = jnp.asarray(np.array([0.9, 0.5, 0.1, 0.05], np.float32))
    idx, mask = clustering.greedy_clustering(
        poses, lcps, jnp.ones(4, bool),
        acceptable_fraction=0.7, best_score=jnp.float32(0.9),
        maximum_pose_count=5, min_distance=1e-6, min_angle=1e-6,
        sym_info=jnp.zeros(3),
    )
    sel = np.asarray(idx)[np.asarray(mask)]
    # 0.5 < 0.7*0.9 pruned; identical poses below threshold never enter
    assert list(sel) == [0]


def test_icp_recovers_perturbation(rng):
    # target: noisy plane-pair surface with normals
    # three mutually orthogonal planes: constrains all 6 DoF
    n = 1500
    k = n // 3
    t1 = np.stack([rng.uniform(-0.2, 0.2, k),
                   rng.uniform(-0.2, 0.2, k), np.zeros(k)], axis=1)
    t2 = np.stack([rng.uniform(-0.2, 0.2, k), np.zeros(k),
                   rng.uniform(-0.2, 0.2, k)], axis=1)
    t3 = np.stack([np.zeros(n - 2 * k), rng.uniform(-0.2, 0.2, n - 2 * k),
                   rng.uniform(-0.2, 0.2, n - 2 * k)], axis=1)
    target = np.concatenate([t1, t2, t3]).astype(np.float32)
    nrm = np.concatenate([
        np.tile([0, 0, 1.0], (k, 1)),
        np.tile([0, 1.0, 0], (k, 1)),
        np.tile([1.0, 0, 0], (n - 2 * k, 1)),
    ]).astype(np.float32)

    # source = target moved by a small rigid perturbation
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = Rotation.from_euler("xyz", [2, -1.5, 1], degrees=True).as_matrix()
    gt[:3, 3] = [0.01, -0.008, 0.012]
    source = target @ gt[:3, :3].T + gt[:3, 3]

    grid = build_neighbor_grid(target, cell_size=0.035)
    offset = np.asarray(
        icp.point_to_plane_icp(
            jnp.asarray(source), jnp.ones(n, bool),
            jnp.asarray(target), jnp.asarray(nrm), grid,
            max_corr_dist=0.035, iterations=5,
        )
    )
    # offset should invert the perturbation
    residual = offset @ gt
    np.testing.assert_allclose(residual[:3, :3], np.eye(3), atol=5e-3)
    assert np.linalg.norm(residual[:3, 3]) < 2e-3


def test_icp_identity_without_correspondences(rng):
    target = rng.uniform(-0.1, 0.1, (100, 3)).astype(np.float32)
    nrm = np.tile([0, 0, 1.0], (100, 1)).astype(np.float32)
    source = target + np.array([10.0, 0, 0], np.float32)  # far away
    grid = build_neighbor_grid(target, cell_size=0.035, cell_cap=64)
    offset = np.asarray(
        icp.point_to_plane_icp(
            jnp.asarray(source), jnp.ones(100, bool),
            jnp.asarray(target), jnp.asarray(nrm), grid,
        )
    )
    np.testing.assert_allclose(offset, np.eye(4), atol=1e-6)
