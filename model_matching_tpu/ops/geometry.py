"""Camera geometry: back-projection, reprojection, rigid transforms.

Replaces the reference's per-pixel loops (reference: src/rgbd.cpp:208-225,
245-252) with whole-image array math.
"""

from __future__ import annotations

import jax.numpy as jnp


def backproject_depth(depth, fx, cx, fy, cy):
    """Depth image [H, W] (meters) -> points [H, W, 3] in the camera frame
    (reference: src/rgbd.cpp:211-216: x=(col-cx)z/fx, y=(row-cy)z/fy)."""
    h, w = depth.shape
    rows = jnp.arange(h, dtype=depth.dtype)[:, None]
    cols = jnp.arange(w, dtype=depth.dtype)[None, :]
    x = (cols - cx) * depth / fx
    y = (rows - cy) * depth / fy
    return jnp.stack([x, y, depth], axis=-1)


def project_points(points, fx, cx, fy, cy):
    """Points [..., 3] -> integer (row, col) pixels via the pinhole model
    (reference: src/rgbd.cpp:245-252; uses C truncation toward zero)."""
    z = points[..., 2]
    col = (points[..., 0] * fx + cx * z) / z
    row = (points[..., 1] * fy + cy * z) / z
    return jnp.stack([row, col], axis=-1).astype(jnp.int32)


def transform_points(transform, points):
    """Apply a 4x4 (or [*, 4, 4]) homogeneous transform to [..., N, 3]
    positions (reference: src/rgbd.cpp:58-70 transform_pointset, which drops
    normals/attrs — callers rotate normals explicitly when needed)."""
    rot = transform[..., :3, :3]
    t = transform[..., :3, 3]
    return points @ jnp.swapaxes(rot, -1, -2) + t[..., None, :]


def rotate_vectors(transform, vectors):
    """Rotate [..., N, 3] direction vectors by the 3x3 block of a 4x4."""
    rot = transform[..., :3, :3]
    return vectors @ jnp.swapaxes(rot, -1, -2)
