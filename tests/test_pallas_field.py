"""Pallas field-scoring kernel vs the XLA field scorer (interpret mode on
CPU; the real-TPU comparison runs in bench/perf checks)."""

import numpy as np
import jax.numpy as jnp

from model_matching_tpu import scoring
from model_matching_tpu.ops.densefield import build_dense_field
from model_matching_tpu.ops.pallas_field import score_field_pallas


def test_pallas_field_matches_xla(rng):
    s = 800
    scene = rng.uniform(-0.25, 0.25, (s, 3)).astype(np.float32)
    snrm = rng.normal(size=(s, 3)).astype(np.float32)
    snrm /= np.linalg.norm(snrm, axis=1, keepdims=True)
    sprob = rng.uniform(0.1, 1.0, s).astype(np.float32)
    sel = rng.choice(s, 200, replace=False)
    mpos = (scene[sel] + rng.normal(0, 0.001, (200, 3))).astype(np.float32)
    mc = mpos.mean(0)
    mpos -= mc
    mnrm = snrm[sel]
    eps = 0.01
    field = build_dense_field(scene, snrm, eps)

    h = 16
    from scipy.spatial.transform import Rotation

    trs = np.tile(np.eye(4, dtype=np.float32), (h, 1, 1))
    trs[:, :3, :3] = Rotation.random(h, rng=rng).as_matrix().astype(np.float32)
    trs[:, :3, 3] = mc + rng.normal(0, 0.02, (h, 3)).astype(np.float32)
    trs[0] = np.eye(4)
    trs[0, :3, 3] = mc
    trs = jnp.asarray(trs)
    valid = jnp.ones(h, bool)
    margs = (jnp.asarray(mpos), jnp.asarray(mnrm), jnp.ones(200, bool))

    xla = np.asarray(
        scoring.score_transforms_field(
            trs, valid, *margs, field, jnp.asarray(sprob), eps, 30.0
        )
    )
    diam = float(np.linalg.norm(mpos, axis=1).max() * 2)
    box_c = int(np.ceil(diam / eps)) + 3
    pal = np.asarray(
        score_field_pallas(
            trs, valid, *margs, field.rows, field.origin, field.dims,
            field.cell, jnp.asarray(sprob), eps, 30.0,
            box_cells=box_c, hyp_tile=4, interpret=True,
        )
    )
    np.testing.assert_allclose(pal, xla, atol=1e-6)
    assert xla[0] > 0.3  # the aligned pose really matches
