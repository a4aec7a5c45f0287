"""Pose accuracy metrics: ADD / ADD-S.

The reference repository publishes no accuracy numbers (BASELINE.md); the
STOCS paper reports ADD / ADD-S on YCB and LINEMOD. This module supplies the
metric so downstream datasets with ground-truth poses can be evaluated
(BASELINE.json's parity criterion). Batched over estimated poses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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


# ---------------------------------------------------------------------------
# file-level evaluation (the CLI `eval` subcommand's engine)
# ---------------------------------------------------------------------------


def model_diameter(pos) -> float:
    """Max pairwise distance over the model points. Exact for <= 4096
    points; beyond that the candidate set is reduced to directional
    extremes (the diameter is attained at convex-hull vertices, and hull
    vertices are extreme along some direction — 512 quasi-uniform probe
    directions make a miss negligible for real scan meshes)."""
    p = np.asarray(pos, np.float64)
    if p.shape[0] > 4096:
        rng = np.random.default_rng(0)
        dirs = rng.normal(size=(512, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        proj = p @ dirs.T  # [N, D]
        cand = np.unique(
            np.concatenate([proj.argmax(axis=0), proj.argmin(axis=0)])
        )
        p = p[cand]
    d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    return float(np.sqrt(d2.max()))


def read_pose_file(path: str):
    """Parse a pose artifact: one pose per line, 12 floats (row-major 3x4,
    the best_pose_candidate format) or 16 (4x4); a trailing 13th/17th float
    (the clustered_poses score column) is ignored. Returns [K, 4, 4]."""
    poses = []
    with open(path) as f:
        for ln in f:
            vals = [float(v) for v in ln.split()]
            if not vals:
                continue
            if len(vals) in (13, 17):
                vals = vals[:-1]
            if len(vals) == 12:
                m = np.eye(4)
                m[:3, :] = np.asarray(vals).reshape(3, 4)
            elif len(vals) == 16:
                m = np.asarray(vals).reshape(4, 4)
            else:
                raise ValueError(
                    f"{path}: expected 12 or 16 floats per line "
                    f"(+optional score), got {len(vals)}"
                )
            poses.append(m)
    if not poses:
        raise ValueError(f"{path}: no poses found")
    return np.stack(poses).astype(np.float32)


def evaluate_poses(est: np.ndarray, gt: np.ndarray, model_pos,
                   threshold_fraction: float = 0.1,
                   diameter: float | None = None) -> dict:
    """ADD / ADD-S / pass-rate for pose arrays [K, 4, 4] (a single GT
    pose broadcasts over multiple estimates; with SEVERAL GT instances —
    a BOP image holding N copies of the object — each estimate is scored
    against its best-matching instance, the BOP convention for ADD-S on
    multi-instance scenes). Returns a JSON-ready dict."""
    est = np.asarray(est, np.float32).reshape(-1, 4, 4)
    gt = np.asarray(gt, np.float32).reshape(-1, 4, 4)
    mp = jnp.asarray(np.asarray(model_pos, np.float32))
    dia = model_diameter(model_pos) if diameter is None else float(diameter)
    if gt.shape[0] == est.shape[0]:
        add = np.asarray(add_metric(jnp.asarray(est), jnp.asarray(gt), mp))
        adds = np.asarray(adds_metric(jnp.asarray(est), jnp.asarray(gt), mp))
    else:
        # instance matching: [E, G] metric matrices, min over GT instances
        add = np.asarray(add_metric(
            jnp.asarray(est)[:, None], jnp.asarray(gt)[None, :], mp
        )).min(axis=1)
        adds = np.asarray(adds_metric(
            jnp.asarray(est)[:, None], jnp.asarray(gt)[None, :], mp
        )).min(axis=1)
    thr = threshold_fraction * dia
    return {
        "num_poses": int(est.shape[0]),
        "num_gt": int(gt.shape[0]),
        "model_diameter": dia,
        "threshold": float(thr),
        "threshold_fraction": float(threshold_fraction),
        "add": [float(v) for v in add],
        "adds": [float(v) for v in adds],
        "add_mean": float(add.mean()),
        "adds_mean": float(adds.mean()),
        "add_pass_rate": float((add < thr).mean()),
        "adds_pass_rate": float((adds < thr).mean()),
    }


def evaluate_pose_files(est_path: str, gt_path: str, model_pos,
                        threshold_fraction: float = 0.1,
                        diameter: float | None = None,
                        gt_poses: np.ndarray | None = None) -> dict:
    """ADD / ADD-S / pass-rate for the pose(s) in `est_path` against
    `gt_path` (same line-per-pose format; a single GT line broadcasts over
    multiple estimates) — or against `gt_poses` directly (the BOP
    scene_gt.json route, io/bop.py). Returns a JSON-ready dict —
    BASELINE.json's "ADD-S parity" criterion is this function over a
    dataset's scenes."""
    est = read_pose_file(est_path)
    gt = gt_poses if gt_poses is not None else read_pose_file(gt_path)
    gt = np.asarray(gt, np.float32).reshape(-1, 4, 4)
    if est.shape[0] != gt.shape[0] and gt.shape[0] != 1 \
            and gt_poses is None:
        raise ValueError(
            f"pose count mismatch: {est_path} has {est.shape[0]}, "
            f"{gt_path} has {gt.shape[0]}"
        )
    return evaluate_poses(
        est, gt, model_pos,
        threshold_fraction=threshold_fraction, diameter=diameter,
    )
