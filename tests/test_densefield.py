"""Dense NN field vs brute force: the per-cell candidate must be the true
nearest scene point to the cell center within the slack radius."""

import numpy as np
import jax.numpy as jnp

from model_matching_tpu.ops.densefield import (
    _SLACK, build_dense_field, field_lookup,
)


def test_field_cell_candidates_are_nearest(rng):
    scene = rng.uniform(-0.1, 0.1, (300, 3)).astype(np.float32)
    eps = 0.01
    f = build_dense_field(scene, np.tile([0, 0, 1.0], (300, 1)).astype(np.float32), eps)
    rows = np.asarray(f.rows)
    origin = np.asarray(f.origin)
    dims = np.asarray(f.dims)

    occ = rows[:, 7] > 0
    flat = np.flatnonzero(occ)
    # reconstruct cell centers from flat indices
    iz = flat % dims[2]
    iy = (flat // dims[2]) % dims[1]
    ix = flat // (dims[1] * dims[2])
    centers = (np.stack([ix, iy, iz], 1) + 0.5) * eps + origin

    d = np.linalg.norm(centers[:, None] - scene[None], axis=-1)
    want_idx = d.argmin(1)
    want_d = d.min(1)
    got_idx = rows[flat, 6].astype(int)
    got_pos = rows[flat, 0:3]

    # candidate stored = argmin within the slack radius
    np.testing.assert_array_equal(got_idx, want_idx)
    np.testing.assert_allclose(got_pos, scene[want_idx], atol=1e-6)
    assert (want_d <= _SLACK * eps + 1e-6).all()

    # every cell whose center is within slack of some point is occupied
    all_d = np.linalg.norm(
        ((np.argwhere(np.ones(dims, bool)) + 0.5) * eps + origin)[:, None]
        - scene[None],
        axis=-1,
    ).min(1)
    should_occ = all_d <= _SLACK * eps - 1e-6
    assert (occ | ~should_occ).all()

    # lookups route to the right cells
    q = scene[:50] + rng.normal(0, 0.001, (50, 3)).astype(np.float32)
    cp, cn, ci, occq, _s7 = field_lookup(f, jnp.asarray(q))
    assert np.asarray(occq).all()
    d2 = ((q - np.asarray(cp)) ** 2).sum(1)
    assert (d2 <= (eps * 1.2) ** 2).all()
