"""ADD / ADD-S metric tests."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from model_matching_tpu import eval as ev


def test_add_zero_for_identical_pose(rng):
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = Rotation.random(rng=rng).as_matrix()
    m[:3, 3] = rng.normal(0, 0.1, 3)
    pts = rng.normal(0, 0.05, (200, 3)).astype(np.float32)
    assert float(ev.add_metric(jnp.asarray(m), jnp.asarray(m), jnp.asarray(pts))) < 1e-6
    # adds uses the matmul distance identity; float32 cancellation leaves
    # ~1e-5 residue on exact zeros — far below any metric threshold
    assert float(ev.adds_metric(jnp.asarray(m), jnp.asarray(m), jnp.asarray(pts))) < 1e-4


def test_add_equals_translation_offset(rng):
    pts = rng.normal(0, 0.05, (200, 3)).astype(np.float32)
    a = np.eye(4, dtype=np.float32)
    b = a.copy()
    b[:3, 3] = [0.01, 0, 0]
    add = float(ev.add_metric(jnp.asarray(b), jnp.asarray(a), jnp.asarray(pts)))
    np.testing.assert_allclose(add, 0.01, rtol=1e-5)
    # ADD-S <= ADD always
    adds = float(ev.adds_metric(jnp.asarray(b), jnp.asarray(a), jnp.asarray(pts)))
    assert adds <= add + 1e-7


def test_adds_forgives_symmetry(rng):
    # ring of points: rotation about its axis is a perfect symmetry
    t = np.linspace(0, 2 * np.pi, 256, endpoint=False)
    pts = np.stack([np.cos(t) * 0.05, np.sin(t) * 0.05, np.zeros_like(t)],
                   axis=1).astype(np.float32)
    a = np.eye(4, dtype=np.float32)
    b = np.eye(4, dtype=np.float32)
    b[:3, :3] = Rotation.from_euler("z", 45, degrees=True).as_matrix()
    add = float(ev.add_metric(jnp.asarray(b), jnp.asarray(a), jnp.asarray(pts)))
    adds = float(ev.adds_metric(jnp.asarray(b), jnp.asarray(a), jnp.asarray(pts)))
    assert add > 0.02      # ADD punishes the symmetric rotation
    assert adds < 0.001    # ADD-S forgives it
    assert bool(ev.adds_accuracy(jnp.asarray(b), jnp.asarray(a),
                                 jnp.asarray(pts), model_diameter=0.1))


def test_model_diameter_exact_and_reduced(rng):
    # small set: exact pairwise; the diameter of a known segment
    pts = np.array([[0, 0, 0], [0.1, 0, 0], [0.05, 0.02, 0]], np.float32)
    np.testing.assert_allclose(ev.model_diameter(pts), 0.1, rtol=1e-6)
    # large set: the directional-extreme reduction must find the same
    # diameter as exact pairwise on a 5000-point ellipsoid cloud
    n = 5000
    u = rng.uniform(0, 2 * np.pi, n)
    v = np.arccos(rng.uniform(-1, 1, n))
    pts = np.stack([
        0.08 * np.sin(v) * np.cos(u),
        0.05 * np.sin(v) * np.sin(u),
        0.03 * np.cos(v),
    ], axis=1).astype(np.float32)
    d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    exact = float(np.sqrt(d2.max()))
    np.testing.assert_allclose(ev.model_diameter(pts), exact, rtol=1e-3)


def test_pose_file_roundtrip(tmp_path):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [0.1, -0.2, 0.3]
    p = tmp_path / "pose.txt"
    p.write_text(" ".join(
        f"{m[i, j]:g}" for i in range(3) for j in range(4)) + "\n")
    out = ev.read_pose_file(str(p))
    assert out.shape == (1, 4, 4)
    np.testing.assert_allclose(out[0], m)
    # clustered format: 12 floats + score column, several lines
    p2 = tmp_path / "clustered.txt"
    row = " ".join(f"{m[i, j]:g}" for i in range(3) for j in range(4))
    p2.write_text(f"{row} 0.5\n{row} 0.25\n")
    out2 = ev.read_pose_file(str(p2))
    assert out2.shape == (2, 4, 4)


def test_eval_cli_roundtrip(tmp_path, rng):
    """CLI `eval` end to end: write a model PLY + estimated/GT pose
    artifacts, run the subcommand, check the emitted JSON (VERDICT r2
    next-step 8: BASELINE's ADD-S parity criterion as one command)."""
    import json

    from model_matching_tpu.cli import main
    from model_matching_tpu.io import ply
    from scipy.spatial.transform import Rotation

    pts = rng.normal(0, 0.05, (300, 3)).astype(np.float32)
    model_path = tmp_path / "model_search.ply"
    ply.write_ply(str(model_path), pts)

    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = Rotation.random(rng=rng).as_matrix()
    gt[:3, 3] = [0.05, -0.1, 0.8]
    good = gt.copy()
    good[:3, 3] += 0.001  # 1 mm off: passes at 10% of diameter
    bad = gt.copy()
    bad[:3, 3] += 1.0     # 1 m off: fails

    est_dir = tmp_path / "est"
    gt_dir = tmp_path / "gt"
    est_dir.mkdir()
    gt_dir.mkdir()
    for name, est in (("best_pose_candidate_a.txt", good),
                      ("best_pose_candidate_b.txt", bad)):
        for d, mat in ((est_dir, est), (gt_dir, gt)):
            (d / name).write_text(" ".join(
                f"{mat[i, j]:g}" for i in range(3) for j in range(4)) + "\n")

    out_json = tmp_path / "report.json"
    rc = main(["eval", str(est_dir), str(gt_dir),
               "--model", str(model_path), "--out", str(out_json)])
    assert rc == 0
    report = json.loads(out_json.read_text())
    assert report["num_poses"] == 2
    assert report["adds_pass_rate"] == 0.5
    assert report["add_pass_rate"] == 0.5
    a = report["files"]["best_pose_candidate_a.txt"]
    assert a["adds_mean"] < 0.002 and a["adds_pass_rate"] == 1.0
    b = report["files"]["best_pose_candidate_b.txt"]
    assert b["add_mean"] > 0.5 and b["adds_pass_rate"] == 0.0


def test_batched_poses(rng):
    pts = rng.normal(0, 0.05, (100, 3)).astype(np.float32)
    gt = np.eye(4, dtype=np.float32)
    ests = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    ests[:, 0, 3] = np.linspace(0, 0.04, 5)
    out = np.asarray(
        ev.add_metric(jnp.asarray(ests), jnp.asarray(gt), jnp.asarray(pts))
    )
    np.testing.assert_allclose(out, np.linspace(0, 0.04, 5), atol=1e-6)


def test_bop_loader_and_cli(tmp_path, rng):
    """BOP-format GT ingestion (io/bop.py): a synthetic scene_gt.json /
    scene_camera.json fixture in the official layout (mm translations,
    row-major cam_R_m2c, multiple instances per image) parses to meter
    [4, 4] poses, and `cli eval <est> scene_gt.json --im-id --obj-id`
    produces the ADD-S table — the one-command route for real YCB/LINEMOD
    annotations (VERDICT r4 missing #1)."""
    import json

    from model_matching_tpu.cli import main
    from model_matching_tpu.io import bop, ply

    r1 = Rotation.random(rng=rng).as_matrix()
    r2 = Rotation.random(rng=rng).as_matrix()
    scene_gt = {
        "1": [
            {"cam_R_m2c": r1.reshape(-1).tolist(),
             "cam_t_m2c": [50.0, -100.0, 800.0], "obj_id": 5},
            {"cam_R_m2c": r2.reshape(-1).tolist(),
             "cam_t_m2c": [150.0, 40.0, 900.0], "obj_id": 5},
            {"cam_R_m2c": np.eye(3).reshape(-1).tolist(),
             "cam_t_m2c": [0.0, 0.0, 1000.0], "obj_id": 9},
        ],
    }
    scene_camera = {
        "1": {"cam_K": [1066.778, 0.0, 312.986,
                        0.0, 1067.487, 241.310,
                        0.0, 0.0, 1.0],
              "depth_scale": 0.1},
    }
    gt_path = tmp_path / "scene_gt.json"
    cam_path = tmp_path / "scene_camera.json"
    gt_path.write_text(json.dumps(scene_gt))
    cam_path.write_text(json.dumps(scene_camera))

    # loader: mm -> m, row-major R, per-object instance filtering
    parsed = bop.load_scene_gt(str(gt_path))
    poses5 = bop.gt_poses(parsed, 1, 5)
    assert poses5.shape == (2, 4, 4)
    np.testing.assert_allclose(poses5[0, :3, :3], r1, atol=1e-6)
    np.testing.assert_allclose(poses5[0, :3, 3], [0.05, -0.1, 0.8],
                               atol=1e-9)
    np.testing.assert_raises(KeyError, bop.gt_poses, parsed, 1, 7)

    cams = bop.load_scene_camera(str(cam_path))
    assert abs(cams[1]["depth_to_m"] - 1e-4) < 1e-12
    intr = bop.camera_intrinsics(cams, 1)
    assert (intr.fx, intr.cx, intr.fy, intr.cy) == (
        1066.778, 312.986, 1067.487, 241.310
    )

    # CLI end to end: an estimate near instance 2 must be scored against
    # its best-matching instance (multi-instance BOP convention)
    pts = rng.normal(0, 0.05, (300, 3)).astype(np.float32)
    model_path = tmp_path / "model_search.ply"
    ply.write_ply(str(model_path), pts)
    est = poses5[1].copy()
    est[:3, 3] += 0.001
    est_path = tmp_path / "best_pose_candidate_obj5.txt"
    est_path.write_text(" ".join(
        f"{est[i, j]:.9g}" for i in range(3) for j in range(4)) + "\n")

    out_json = tmp_path / "report.json"
    rc = main(["eval", str(est_path), str(gt_path),
               "--model", str(model_path),
               "--im-id", "1", "--obj-id", "5", "--out", str(out_json)])
    assert rc == 0
    report = json.loads(out_json.read_text())
    assert report["num_poses"] == 1
    assert report["adds_pass_rate"] == 1.0
    f = next(iter(report["files"].values()))
    assert f["num_gt"] == 2 and f["adds_mean"] < 0.002

    # missing flags and missing object draw clean errors, not tracebacks
    assert main(["eval", str(est_path), str(gt_path),
                 "--model", str(model_path)]) == 1
    assert main(["eval", str(est_path), str(gt_path),
                 "--model", str(model_path),
                 "--im-id", "1", "--obj-id", "7"]) == 1
