"""Point-to-plane ICP refinement.

Replaces pcl::IterativeClosestPointWithNormals as used by the reference's
point_to_plane_icp (reference: src/pose_clustering.cpp:123-140: 5
iterations, max correspondence distance 0.035, returns the offset transform
or identity). Each iteration solves the standard small-angle linearization

    minimize sum_i ((R p_i + t - q_i) . n_i)^2,  R ~ I + [w]_x

via 6x6 normal equations; correspondences come from the voxel-grid
restricted-NN (ops/gridhash.py). Fixed iteration count -> one jittable
program; batchable over poses with vmap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .ops.gridhash import NeighborGrid, query_restricted_nn


def _solve_point_to_plane(src, tgt, nrm, w):
    """One linearized step. src/tgt/nrm [N, 3]; w [N] weights (0 = unused).
    Returns a 4x4 increment."""
    c = jnp.cross(src, nrm)            # rotation jacobian rows
    j = jnp.concatenate([c, nrm], axis=-1)  # [N, 6]
    r = jnp.sum((tgt - src) * nrm, axis=-1)  # residual along the normal
    jw = j * w[:, None]
    a = jw.T @ j + 1e-9 * jnp.eye(6, dtype=src.dtype)
    b = jw.T @ (r * w)
    x = jnp.linalg.solve(a, b)
    wx, t = x[:3], x[3:]
    # small-angle rotation, re-orthonormalized via Rodrigues
    theta = jnp.linalg.norm(wx)
    k = wx / jnp.maximum(theta, 1e-12)
    kx = jnp.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], src.dtype
    )
    rot = (
        jnp.eye(3, dtype=src.dtype)
        + jnp.sin(theta) * kx
        + (1 - jnp.cos(theta)) * (kx @ kx)
    )
    out = jnp.eye(4, dtype=src.dtype)
    out = out.at[:3, :3].set(rot)
    out = out.at[:3, 3].set(t)
    return out


@partial(jax.jit, static_argnames=("iterations",))
def point_to_plane_icp(
    source_pos: jax.Array,     # [N, 3] cloud to move
    source_valid: jax.Array,   # [N]
    target_pos: jax.Array,     # [S, 3]
    target_normal: jax.Array,  # [S, 3]
    grid: NeighborGrid,        # built over target_pos at cell=max_corr_dist
    max_corr_dist: float = 0.035,
    iterations: int = 5,
):
    """Returns the 4x4 offset transform aligning source onto target (the
    reference's output contract, pose_clustering.cpp:135-138; with no
    correspondences the result stays identity)."""

    def step(_, offset):
        moved = source_pos @ offset[:3, :3].T + offset[:3, 3]
        idx, _d2 = query_restricted_nn(grid, moved, target_pos, max_corr_dist)
        found = (idx >= 0) & source_valid
        safe = jnp.maximum(idx, 0)
        inc = _solve_point_to_plane(
            moved, target_pos[safe], target_normal[safe],
            found.astype(moved.dtype),
        )
        any_corr = jnp.any(found)
        inc = jnp.where(any_corr, inc, jnp.eye(4, dtype=moved.dtype))
        return inc @ offset

    return jax.lax.fori_loop(
        0, iterations, step, jnp.eye(4, dtype=source_pos.dtype)
    )


@partial(jax.jit, static_argnames=("iterations",))
def trimmed_icp(
    source_pos: jax.Array,
    source_valid: jax.Array,
    target_pos: jax.Array,
    target_normal: jax.Array,
    grid: NeighborGrid,
    max_corr_dist: float = 0.035,
    iterations: int = 5,
    trim_fraction: float = 0.8,
):
    """Trimmed point-to-plane ICP: each iteration keeps only the best
    trim_fraction of correspondences by absolute residual, making the fit
    robust to partial overlap. The reference *declares* trimmed_icp but
    never defines it (pose_clustering.hpp:24-28); this supplies the missing
    capability."""

    def step(_, offset):
        moved = source_pos @ offset[:3, :3].T + offset[:3, 3]
        idx, _d2 = query_restricted_nn(grid, moved, target_pos, max_corr_dist)
        found = (idx >= 0) & source_valid
        safe = jnp.maximum(idx, 0)
        tgt = target_pos[safe]
        nrm = target_normal[safe]
        res = jnp.abs(jnp.sum((tgt - moved) * nrm, axis=-1))
        res = jnp.where(found, res, jnp.inf)
        n_keep = jnp.maximum(
            (jnp.sum(found) * trim_fraction).astype(jnp.int32), 6
        )
        # residual threshold = n_keep-th smallest
        order = jnp.sort(res)
        thresh = order[jnp.minimum(n_keep, res.shape[0] - 1)]
        w = (found & (res <= thresh)).astype(moved.dtype)
        inc = _solve_point_to_plane(moved, tgt, nrm, w)
        inc = jnp.where(jnp.sum(w) >= 6, inc, jnp.eye(4, dtype=moved.dtype))
        return inc @ offset

    return jax.lax.fori_loop(
        0, iterations, step, jnp.eye(4, dtype=source_pos.dtype)
    )


def refine_pose(
    pose: jax.Array,           # [4, 4] centered-frame model->scene
    model_pos: jax.Array,      # [M, 3]
    model_valid: jax.Array,    # [M]
    scene_grid: NeighborGrid,
    scene_pos: jax.Array,
    scene_normal: jax.Array,
    max_corr_dist: float = 0.035,
    iterations: int = 5,
):
    """Polish a model->scene pose: run point-to-plane ICP from the posed
    model onto the scene and fold the offset in."""
    moved = model_pos @ pose[:3, :3].T + pose[:3, 3]
    offset = point_to_plane_icp(
        moved, model_valid, scene_pos, scene_normal, scene_grid,
        max_corr_dist=max_corr_dist, iterations=iterations,
    )
    return offset @ pose
