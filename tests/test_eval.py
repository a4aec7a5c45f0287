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


def test_batched_poses(rng):
    pts = rng.normal(0, 0.05, (100, 3)).astype(np.float32)
    gt = np.eye(4, dtype=np.float32)
    ests = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    ests[:, 0, 3] = np.linspace(0, 0.04, 5)
    out = np.asarray(
        ev.add_metric(jnp.asarray(ests), jnp.asarray(gt), jnp.asarray(pts))
    )
    np.testing.assert_allclose(out, np.linspace(0, 0.04, 5), atol=1e-6)
