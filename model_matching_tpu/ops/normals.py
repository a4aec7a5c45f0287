"""Surface normal estimation.

Two estimators mirror the reference's two paths:

* `depth_normals` — scene normals from the depth image, replacing
  cv::rgbd::RgbdNormals with the LINEMOD method, window 5 (reference:
  src/rgbd.cpp:202-206). Implemented as a windowed least-squares depth
  gradient + analytic tangent cross product — pure convolutions and
  elementwise math, fully fused by XLA.
* `pca_normals` — model normals, replacing PCL NormalEstimation with radius
  search (reference: src/rgbd.cpp:72-83): covariance of the radius
  neighborhood, smallest eigenvector, oriented toward the viewpoint.
  Neighbor indices come from the host (irregular, offline preprocessing);
  the covariance/eigen math is batched device code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _box_filter(img, k: int):
    """Separable k x k box sum via cumulative sums (zero padding)."""
    pad = k // 2

    def along(a, axis):
        c = jnp.cumsum(a, axis=axis)
        c = jnp.moveaxis(c, axis, 0)
        n = c.shape[0]
        zeros = jnp.zeros_like(c[:1])
        cpad = jnp.concatenate([zeros, c], axis=0)
        hi = jnp.clip(jnp.arange(n) + pad + 1, 0, n)
        lo = jnp.clip(jnp.arange(n) - pad, 0, n)
        out = cpad[hi] - cpad[lo]
        return jnp.moveaxis(out, 0, axis)

    return along(along(img, 0), 1)


def depth_normals(depth, fx, cx, fy, cy, window: int = 5):
    """Normals [H, W, 3] + validity [H, W] from a metric depth image.

    Method: least-squares plane fit of depth over a `window` x `window`
    neighborhood gives gradients (dz/du, dz/dv); the surface tangents of the
    back-projection P(u,v) = z * K^-1 (u,v,1) are

        dP/du = ((z + (u-cx) z_u)/fx, (v-cy) z_u / fy, z_u)
        dP/dv = ((u-cx) z_v / fx, (z + (v-cy) z_v)/fy, z_v)

    and n = normalize(dPdu x dPdv), oriented toward the camera. A pixel is
    invalid when any depth sample in its window is missing (<= 0) — matching
    the reference's NaN/zero-normal rejection downstream
    (src/rgbd.cpp:264-267).
    """
    h, w = depth.shape
    z = depth.astype(jnp.float32)
    valid = z > 0

    # windowed least-squares gradient: slope_u = sum(du * z) / sum(du^2)
    # computed with box sums so the window is separable.
    rows = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32)

    vf = valid.astype(jnp.float32)
    s1 = _box_filter(vf, window)
    su = _box_filter(cols * vf, window)
    sv = _box_filter(rows * vf, window)
    sz = _box_filter(z * vf, window)
    suu = _box_filter(cols * cols * vf, window)
    svv = _box_filter(rows * rows * vf, window)
    suz = _box_filter(cols * z * vf, window)
    svz = _box_filter(rows * z * vf, window)

    # centered least squares per axis (u and v are independent over a
    # rectangular window with full validity; with partial validity this is a
    # diagonal approximation, and those pixels are marked invalid anyway)
    du_var = suu * s1 - su * su
    dv_var = svv * s1 - sv * sv
    zu = jnp.where(du_var > 1e-6, (suz * s1 - su * sz) / jnp.maximum(du_var, 1e-6), 0.0)
    zv = jnp.where(dv_var > 1e-6, (svz * s1 - sv * sz) / jnp.maximum(dv_var, 1e-6), 0.0)

    full_window = s1 >= float(window * window) - 0.5

    ucx = cols - cx
    vcy = rows - cy
    tu = jnp.stack(
        [(z + ucx * zu) / fx, vcy * zu / fy, zu], axis=-1
    )
    tv = jnp.stack(
        [ucx * zv / fx, (z + vcy * zv) / fy, zv], axis=-1
    )
    n = jnp.cross(tu, tv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    ok = full_window & valid & (norm[..., 0] > 1e-12)
    n = jnp.where(ok[..., None], n / jnp.maximum(norm, 1e-12), 0.0)

    # orient toward the camera (viewpoint at origin): n . p < 0
    p = jnp.stack([ucx * z / fx, vcy * z / fy, z], axis=-1)
    flip = jnp.sum(n * p, axis=-1) > 0
    n = jnp.where(flip[..., None], -n, n)
    return n, ok


def grid_pca_normals(pos, valid, radius: float, cell_cap: int = 64,
                     min_neighbors: int = 3, orient: str = "camera"):
    """Device-side radius-PCA normals over a padded cloud, via the same
    sorted-voxel-grid 27-cell pattern as ops.voxel.radius_outlier_mask:
    accumulate neighbor first/second moments, then take the smallest
    covariance eigenvector.

    orient="camera": toward the camera at the origin (n . p < 0), the scene
    convention (cv::rgbd::RgbdNormals; LCP consumes them at
    stocs.cpp:1026-1032). orient="outward": away from the origin
    (n . p > 0), the model convention (PCL's toward-viewpoint orientation
    negated by the reference, src/stocs.cpp:47-52).

    Returns (normal [N, 3], ok [N])."""
    n = pos.shape[0]
    big = jnp.float32(3.0e38)
    masked_pos = jnp.where(valid[:, None], pos, big)
    origin = jnp.min(masked_pos, axis=0)
    ijk = jnp.clip(
        jnp.floor((pos - origin) / radius).astype(jnp.int32), 0, 1023
    )
    key = jnp.where(
        valid, (ijk[..., 0] * 1024 + ijk[..., 1]) * 1024 + ijk[..., 2],
        jnp.int32(2**31 - 1),
    )
    order = jnp.argsort(key)
    key_s = key[order]
    pos_s = pos[order]

    r2 = jnp.float32(radius * radius)
    cnt = jnp.zeros((n,), jnp.float32)
    s1 = jnp.zeros((n, 3), jnp.float32)
    s2 = jnp.zeros((n, 3, 3), jnp.float32)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nkey = key + (dx * 1024 + dy) * 1024 + dz
                start = jnp.searchsorted(key_s, nkey, side="left")
                end = jnp.searchsorted(key_s, nkey, side="right")
                span = jnp.minimum(end - start, cell_cap)

                def body(k, state):
                    cnt, s1, s2 = state
                    idx = jnp.minimum(start + k, n - 1)
                    p = pos_s[idx]
                    d2 = jnp.sum((pos - p) ** 2, axis=-1)
                    w = ((k < span) & (d2 <= r2)).astype(jnp.float32)
                    cnt = cnt + w
                    s1 = s1 + w[:, None] * p
                    s2 = s2 + w[:, None, None] * (p[:, :, None] * p[:, None, :])
                    return cnt, s1, s2

                cnt, s1, s2 = jax.lax.fori_loop(
                    0, cell_cap, body, (cnt, s1, s2)
                )

    denom = jnp.maximum(cnt, 1.0)
    mean = s1 / denom[:, None]
    cov = s2 / denom[:, None, None] - mean[:, :, None] * mean[:, None, :]
    nrm = smallest_eigenvector_3x3(cov)
    dot = jnp.sum(nrm * pos, axis=-1)
    flip = dot > 0 if orient == "camera" else dot < 0
    nrm = jnp.where(flip[:, None], -nrm, nrm)
    ok = valid & (cnt >= min_neighbors)
    return jnp.where(ok[:, None], nrm, 0.0), ok


def radius_neighbor_indices(pos: np.ndarray, radius: float, cap: int):
    """Host-side irregular neighbor search for offline model preprocessing
    (the online scene path never calls this). Returns padded [N, cap] int32
    indices + [N] counts; self is included like PCL's radiusSearch."""
    from scipy.spatial import cKDTree

    tree = cKDTree(pos)
    idx = np.full((pos.shape[0], cap), -1, dtype=np.int32)
    counts = np.zeros(pos.shape[0], dtype=np.int32)
    for i, nbrs in enumerate(tree.query_ball_point(pos, radius)):
        k = min(len(nbrs), cap)
        idx[i, :k] = nbrs[:k]
        counts[i] = k
    return idx, counts


def smallest_eigenvector_3x3(cov):
    """Unit eigenvector of the smallest eigenvalue of symmetric [..., 3, 3]
    matrices, via the analytic trigonometric eigenvalue formula + nullspace
    cross products. Avoids jnp.linalg.eigh's general-purpose machinery for
    this tiny fixed-size problem."""
    a = cov
    tr = jnp.trace(a, axis1=-2, axis2=-1)
    q = tr / 3.0
    b = a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)
    p2 = jnp.sum(b * b, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detb = jnp.linalg.det(b)
    r = detb / (2.0 * p**3)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eigenvalues: q + 2p cos(phi + 2k pi / 3); smallest at k=1 shifted
    eig_small = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    m = a - eig_small[..., None, None] * jnp.eye(3, dtype=a.dtype)
    # nullspace direction: the largest cross product of two rows of m
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    cands = jnp.stack([c01, c02, c12], axis=-2)
    norms = jnp.linalg.norm(cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # degenerate (isotropic) neighborhoods: fall back to +z
    fallback = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=a.dtype), v.shape
    )
    return jnp.where(vn > 1e-12, v / jnp.maximum(vn, 1e-12), fallback)


def pca_normals_from_neighbors(pos, nbr_idx, nbr_count, orient_outward_from_origin):
    """Batched PCA normals from padded neighbor lists.

    pos [N, 3]; nbr_idx [N, cap] (-1 padding); nbr_count [N].
    PCL flips toward the viewpoint at the origin (n . p <= 0); the reference
    then negates to point outward (src/stocs.cpp:47-52). Pass
    orient_outward_from_origin=True for that combined convention (n . p >= 0).
    """
    cap = nbr_idx.shape[1]
    mask = (jnp.arange(cap)[None, :] < nbr_count[:, None]).astype(pos.dtype)
    nbrs = pos[jnp.maximum(nbr_idx, 0)]  # [N, cap, 3]
    cnt = jnp.maximum(nbr_count.astype(pos.dtype), 1.0)[:, None]
    mean = jnp.sum(nbrs * mask[..., None], axis=1) / cnt
    centered = (nbrs - mean[:, None, :]) * mask[..., None]
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / cnt[..., None]
    n = smallest_eigenvector_3x3(cov)
    sign = jnp.sum(n * pos, axis=-1, keepdims=True)
    if orient_outward_from_origin:
        n = jnp.where(sign < 0, -n, n)
    else:
        n = jnp.where(sign > 0, -n, n)
    degenerate = nbr_count < 3
    return jnp.where(degenerate[:, None], jnp.nan, n)
