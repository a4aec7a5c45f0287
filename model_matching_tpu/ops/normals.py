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


def depth_normals(depth, fx, cx, fy, cy, window: int = 5,
                  diff_threshold: float = 50.0):
    """Normals [H, W, 3] + validity [H, W] from a depth image — an exact
    transcription of cv::rgbd::RgbdNormals' LINEMOD method (the estimator
    the reference constructs at src/rgbd.cpp:202-206), whose semantics
    were pinned empirically against the real OpenCV 4.6 library
    (tests/ref_rgbd_normals.cpp + tests/test_scene_oracle.py):

      * samples a fixed 3x3 grid at +-5 pixel spacing around each pixel
        (OpenCV hardcodes r = 5 and IGNORES the window_size argument —
        the `window` parameter here is kept for signature compatibility
        and ignored the same way);
      * per sample: delta = depth(sample) - depth(center); samples with
        |delta| > diff_threshold are discarded (edge-aware gating; the
        threshold is 50 in the units of `depth` — OpenCV compares raw
        u16 values, so pass raw-unit depth for exact parity; normal
        DIRECTIONS are invariant to uniform depth scaling);
      * depth gradient = the no-intercept least-squares fit over the
        accepted offsets (the full coupled 2x2 solve — verified against
        the real library on asymmetric acceptance patterns);
      * normal = normalize(dP/du x dP/dv) of the perspective
        back-projection P(u,v) = z K^-1 (u,v,1):
          dP/du = ((z + (u-cx) g_u)/fx, (v-cy) g_u / fy, g_u)
          dP/dv = ((u-cx) g_v / fx, (z + (v-cy) g_v)/fy, g_v)
        flipped camera-facing on the z component (signNormal: c > 0);
      * pixels within 5 of the left/top border or 6 of the right/bottom
        border are invalid (OpenCV's asymmetric loop bound, measured:
        valid rows/cols are [5, H-7] on the real library), as are pixels
        whose accepted-sample pattern is rank-deficient (OpenCV emits
        NaN there; the loader rejects both, src/rgbd.cpp:264-267).
    """
    h, w = depth.shape
    z = depth.astype(jnp.float32)
    r = 5  # OpenCV's hardcoded LINEMOD radius ("used to be 7")
    zpad = jnp.pad(z, r)

    sxx = jnp.zeros((h, w), jnp.float32)
    syy = jnp.zeros((h, w), jnp.float32)
    sxy = jnp.zeros((h, w), jnp.float32)
    bx = jnp.zeros((h, w), jnp.float32)
    by = jnp.zeros((h, w), jnp.float32)
    for oy in (-r, 0, r):
        for ox in (-r, 0, r):
            sample = jax.lax.dynamic_slice(zpad, (oy + r, ox + r), (h, w))
            delta = sample - z
            acc = jnp.abs(delta) <= diff_threshold
            af = acc.astype(jnp.float32)
            sxx += af * float(ox * ox)
            syy += af * float(oy * oy)
            sxy += af * float(ox * oy)
            bx += jnp.where(acc, float(ox) * delta, 0.0)
            by += jnp.where(acc, float(oy) * delta, 0.0)

    det = sxx * syy - sxy * sxy
    ok_det = det > 0.5  # det is a multiple of r^4; any nonzero det >= 625
    safe_det = jnp.where(ok_det, det, 1.0)
    zu = (syy * bx - sxy * by) / safe_det
    zv = (sxx * by - sxy * bx) / safe_det

    rows = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones(
        (1, w), jnp.float32
    )
    cols = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones(
        (h, 1), jnp.float32
    )
    ucx = cols - cx
    vcy = rows - cy
    tu = jnp.stack([(z + ucx * zu) / fx, vcy * zu / fy, zu], axis=-1)
    tv = jnp.stack([ucx * zv / fx, (z + vcy * zv) / fy, zv], axis=-1)
    n = jnp.cross(tu, tv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)

    border = (
        (rows >= r) & (rows <= h - r - 2) & (cols >= r) & (cols <= w - r - 2)
    )
    ok = border & (z > 0) & ok_det & (norm[..., 0] > 1e-12)
    n = jnp.where(ok[..., None], n / jnp.maximum(norm, 1e-12), 0.0)
    # camera-facing: negate when the z component is positive (OpenCV
    # signNormal's c > 0 test — NOT an n.p test)
    flip = n[..., 2] > 0
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
