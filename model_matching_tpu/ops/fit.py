"""Rigid transform fitting from congruent 4-point correspondences.

Batched frame-alignment fit (reference: src/stocs.cpp:270-361
ComputeRigidTransformation + src/stocs.cpp:871-941
get_rigid_transform_from_congruent_pair): build orthonormal frames from the
first three points of each side, R = P^T Q, rms over the three pairs, then
assemble the centered-frame transform and the un-centered world transform.

Divergence from the reference (deliberate, see SURVEY.md hard-parts list):
degenerate triplets (coincident/collinear points) return valid=False here,
whereas the reference's early `return kLargeNumber` paths leak an
*uninitialized* transform that is then accepted (stocs.cpp:299-310,922).
Rejecting is strictly safer and cannot lose a correct pose.
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-6


def _orthonormal_frame(x0, x1, x2):
    """Rows of the frame built from a point triplet; returns (frame [..., 3, 3],
    ok [...])."""
    v1 = x1 - x0
    n1 = jnp.sum(v1 * v1, axis=-1)
    ok1 = n1 > 0
    v1 = v1 / jnp.sqrt(jnp.maximum(n1, _SMALL * _SMALL))[..., None]
    v2 = (x2 - x0) - jnp.sum((x2 - x0) * v1, axis=-1, keepdims=True) * v1
    n2 = jnp.sum(v2 * v2, axis=-1)
    ok2 = n2 > 0
    v2 = v2 / jnp.sqrt(jnp.maximum(n2, _SMALL * _SMALL))[..., None]
    v3 = jnp.cross(v1, v2)
    return jnp.stack([v1, v2, v3], axis=-2), ok1 & ok2


def fit_congruent_pairs(scene_quad, model_quad, scene_centroid, model_centroid):
    """Fit rigid transforms for batched correspondences.

    scene_quad, model_quad: [..., 4, 3] positions in the *centered* frames
    (the estimator shifts both clouds to their centroids up front,
    reference: src/stocs.cpp:943-964).
    scene_centroid, model_centroid: [3] the stored global centroids, used to
    rebuild the world-frame translation (reference: src/stocs.cpp:925-933).

    Returns dict with:
      transform        [..., 4, 4] centered-frame model->scene map
      world_transform  [..., 4, 4] original-coordinates map (file output)
      rms              [...]
      valid            [...]
    """
    p0, p1, p2 = (scene_quad[..., i, :] for i in range(3))
    q0, q1, q2 = (model_quad[..., i, :] for i in range(3))

    c1 = (p0 + p1 + p2) / 3.0
    c2 = (q0 + q1 + q2) / 3.0

    fp, okp = _orthonormal_frame(p0, p1, p2)
    fq, okq = _orthonormal_frame(q0, q1, q2)
    rot = jnp.swapaxes(fp, -1, -2) @ fq  # P^T Q

    # the reference's orthogonality test uses diag(R @ R) (stocs.cpp:329);
    # replicated verbatim for parity (it only trips on numerical blowups)
    diag_rr = jnp.diagonal(rot @ rot, axis1=-2, axis2=-1)
    ortho_ok = ~jnp.any(diag_rr - 1.0 > _SMALL, axis=-1)

    # rms over the three pairs, divided by 4 like the reference
    # (pairs.size() == 4 though only 3 terms, stocs.cpp:339-346)
    rms = jnp.zeros(rot.shape[:-2], rot.dtype)
    for p_i, q_i in ((p0, q0), (p1, q1), (p2, q2)):
        mapped = jnp.einsum("...ij,...j->...i", rot, q_i - c2)
        rms = rms + jnp.linalg.norm(mapped - p_i + c1, axis=-1)
    rms = rms / 4.0

    # centered transform: x -> R (x - c2) + c1
    t_centered = c1 - jnp.einsum("...ij,...j->...i", rot, c2)
    # world transform: x -> R (x - (c2 + C_model)) + c1 + C_scene
    t_world = (c1 + scene_centroid) - jnp.einsum(
        "...ij,...j->...i", rot, c2 + model_centroid
    )

    def assemble(r, t):
        last = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], r.dtype), r.shape[:-2] + (1, 4)
        )
        top = jnp.concatenate([r, t[..., None]], axis=-1)
        return jnp.concatenate([top, last], axis=-2)

    valid = okp & okq & ortho_ok & (rms >= 0.0)
    return {
        "transform": assemble(rot, t_centered),
        "world_transform": assemble(rot, t_world),
        "rms": rms,
        "valid": valid,
    }
