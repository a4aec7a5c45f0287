"""Hypothesis post-processing: symmetry-aware greedy pose clustering.

Re-derivation of the reference's clustering layer (reference:
src/pose_clustering.cpp:5-121: quaternion_to_euler, get_pose_diff,
greedy_clustering). The reference links this but its shipped CLIs never call
it (SURVEY.md L4); it is a required library capability and the CLI here
exposes it via --cluster.

Device implementation: prune below acceptable_fraction * best, sort by LCP,
then a fixed-size greedy scan (fori over sorted candidates against the
accepted buffer) — sequential like the reference but bounded, so it stays
inside jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_RAD2DEG = 180.0 / jnp.pi


def matrix_to_quaternion(r):
    """Rotation matrix [..., 3, 3] -> quaternion (w, x, y, z), Shepperd's
    method (branchless via where), matching Eigen's Quaternionf(Matrix3f)."""
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # four candidate formulations; pick the numerically largest pivot
    qw0 = safe_sqrt(1.0 + tr) / 2.0
    c0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
         (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    c1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
         (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    c2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
         (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    c3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
         (m12 + m21) / (4 * qz3), qz3], axis=-1)

    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22,
                        m22 - m00 - m11], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    return jnp.take_along_axis(
        cands, best[..., None, None], axis=-2
    )[..., 0, :]


def quaternion_to_euler(q):
    """(w, x, y, z) -> (roll, pitch, yaw) radians with the reference's exact
    formulation incl. the gimbal copysign branch (pose_clustering.cpp:5-25)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr = 2.0 * (w * x + y * z)
    cosr = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr, cosr)
    sinp = 2.0 * (w * y - z * x)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.sign(sinp) * jnp.pi / 2.0,
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)),
    )
    siny = 2.0 * (w * z + x * y)
    cosy = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny, cosy)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def pose_difference(test_pose, base_pose, sym_info):
    """(max per-axis symmetry-reduced rotation error [deg], translation
    error) between 4x4 poses (broadcastable). sym_info [3]: 0 / 90 / 180 /
    360 per axis (pose_clustering.cpp:27-71). The reference returns the MAX
    of the per-axis errors despite its variable name."""
    rt = jnp.swapaxes(test_pose[..., :3, :3], -1, -2)  # inverse of rotation
    rdiff = rt @ base_pose[..., :3, :3]
    e = jnp.abs(quaternion_to_euler(matrix_to_quaternion(rdiff)) * _RAD2DEG)

    e90 = jnp.minimum(jnp.abs(e - 90.0), 90.0 - jnp.abs(e - 90.0))
    e180 = jnp.minimum(e, 180.0 - e)
    e = jnp.where(sym_info == 90.0, e90, e)
    e = jnp.where(sym_info == 180.0, e180, e)
    e = jnp.where(sym_info == 360.0, 0.0, e)
    rot_err = jnp.max(e, axis=-1)
    t_err = jnp.linalg.norm(
        test_pose[..., :3, 3] - base_pose[..., :3, 3], axis=-1
    )
    return rot_err, t_err


@partial(jax.jit, static_argnames=("maximum_pose_count",))
def greedy_clustering(
    transforms: jax.Array,   # [H, 4, 4]
    lcp: jax.Array,          # [H]
    valid: jax.Array,        # [H]
    acceptable_fraction: float,
    best_score: jax.Array,
    maximum_pose_count: int,
    min_distance: float,
    min_angle: float,
    sym_info: jax.Array,     # [3]
):
    """Returns (selected indices [K] into transforms (-1 padding),
    selected mask [K]). Keeps the reference's semantics: strictly-greater
    prune (pose_clustering.cpp:93-97), descending-LCP greedy scan rejecting
    any pose within BOTH thresholds of an accepted one, stop once the
    accepted count exceeds maximum_pose_count."""
    h = transforms.shape[0]
    score = jnp.where(valid & (lcp > acceptable_fraction * best_score),
                      lcp, -jnp.inf)
    order = jnp.argsort(-score)
    k = maximum_pose_count + 1  # reference stops AFTER exceeding the cap

    accepted_idx = jnp.full((k,), -1, jnp.int32)
    accepted_pose = jnp.zeros((k, 4, 4), transforms.dtype)
    count = jnp.int32(0)

    def body(i, state):
        accepted_idx, accepted_pose, count = state
        cand = order[i]
        ok = score[cand] > -jnp.inf
        rot_err, t_err = pose_difference(
            transforms[cand], accepted_pose, sym_info
        )
        slot_live = jnp.arange(k) < count
        clash = jnp.any(
            slot_live & (rot_err < min_angle) & (t_err < min_distance)
        )
        take = ok & ~clash & (count < k)
        accepted_idx = jnp.where(
            take, accepted_idx.at[count].set(cand), accepted_idx
        )
        accepted_pose = jnp.where(
            take, accepted_pose.at[count].set(transforms[cand]), accepted_pose
        )
        count = count + take.astype(jnp.int32)
        return accepted_idx, accepted_pose, count

    accepted_idx, _p, count = jax.lax.fori_loop(
        0, h, body, (accepted_idx, accepted_pose, count)
    )
    mask = jnp.arange(k) < count
    return accepted_idx, mask
