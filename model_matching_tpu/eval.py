"""Pose accuracy metrics: ADD / ADD-S.

The reference repository publishes no accuracy numbers (BASELINE.md); the
STOCS paper reports ADD / ADD-S on YCB and LINEMOD. This module supplies the
metric so downstream datasets with ground-truth poses can be evaluated
(BASELINE.json's parity criterion). Batched over estimated poses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_metric(pose_est, pose_gt, model_pos, model_valid=None):
    """ADD: mean distance between corresponding model points under the two
    poses (Hinterstoisser et al.). poses [..., 4, 4] or [..., 3, 4]."""
    est = model_pos @ jnp.swapaxes(pose_est[..., :3, :3], -1, -2) + pose_est[
        ..., None, :3, 3
    ]
    gt = model_pos @ jnp.swapaxes(pose_gt[..., :3, :3], -1, -2) + pose_gt[
        ..., None, :3, 3
    ]
    d = jnp.linalg.norm(est - gt, axis=-1)
    if model_valid is not None:
        w = model_valid.astype(d.dtype)
        return jnp.sum(d * w, axis=-1) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(d, axis=-1)


def adds_metric(pose_est, pose_gt, model_pos, model_valid=None):
    """ADD-S: mean *closest-point* distance — the symmetric-object variant
    (each gt-posed point matches its nearest est-posed point)."""
    est = model_pos @ jnp.swapaxes(pose_est[..., :3, :3], -1, -2) + pose_est[
        ..., None, :3, 3
    ]
    gt = model_pos @ jnp.swapaxes(pose_gt[..., :3, :3], -1, -2) + pose_gt[
        ..., None, :3, 3
    ]
    # [..., Mgt, Mest] pairwise distances via the matmul identity
    e2 = jnp.sum(est * est, axis=-1)
    g2 = jnp.sum(gt * gt, axis=-1)
    cross = jnp.einsum("...ik,...jk->...ij", gt, est)
    d2 = g2[..., :, None] + e2[..., None, :] - 2.0 * cross
    if model_valid is not None:
        big = jnp.float32(1e12)
        d2 = jnp.where(model_valid[None, :], d2, big)
        dmin = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
        w = model_valid.astype(dmin.dtype)
        return jnp.sum(dmin * w, axis=-1) / jnp.maximum(jnp.sum(w), 1.0)
    dmin = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
    return jnp.mean(dmin, axis=-1)


def adds_accuracy(pose_est, pose_gt, model_pos, model_diameter,
                  threshold_fraction: float = 0.1, model_valid=None):
    """The standard pass criterion: ADD-S < threshold_fraction * diameter."""
    return adds_metric(pose_est, pose_gt, model_pos, model_valid) < (
        threshold_fraction * model_diameter
    )
