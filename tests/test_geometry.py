"""Geometry kernel tests: back-projection, normals, voxel ops, grid NN —
validated against brute-force / closed-form ground truth."""

import numpy as np
import jax.numpy as jnp

from model_matching_tpu.ops import geometry, gridhash, normals, voxel


FX, CX, FY, CY = 600.0, 320.0, 600.0, 240.0


def test_backproject_project_roundtrip(rng):
    depth = rng.uniform(0.5, 2.0, size=(48, 64)).astype(np.float32)
    pts = geometry.backproject_depth(jnp.asarray(depth), FX, CX, FY, CY)
    pix = np.asarray(geometry.project_points(pts, FX, CX, FY, CY))
    rr, cc = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    # project truncates toward zero like the reference's C int casts
    # (rgbd.cpp:251-252), so float32 noise can land one pixel low
    assert np.abs(pix[..., 0] - rr).max() <= 1
    assert np.abs(pix[..., 1] - cc).max() <= 1
    assert (pix[..., 0] == rr).mean() > 0.4  # truncation, not garbage
    assert (pix[..., 1] == cc).mean() > 0.4


def test_depth_normals_on_plane():
    # synthetic tilted plane z = 1 + 0.2x + 0.1y in camera coords,
    # expressed in raw-ish units (x10000 like a u16 depth at the YCB
    # depth_scale) so the LINEMOD |delta| <= 50 gate is exercised in its
    # native units; directions are scale-invariant
    h, w = 60, 80
    rr, cc = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    # solve depth from plane equation: z = 1 + a*x + b*y with
    # x=(c-cx)z/fx, y=(r-cy)z/fy  =>  z (1 - a(c-cx)/fx - b(r-cy)/fy) = 1
    a, b = 0.2, 0.1
    denom = 1 - a * (cc - CX) / FX - b * (rr - CY) / FY
    depth = (10000.0 / denom).astype(np.float32)

    n, ok = normals.depth_normals(jnp.asarray(depth), FX, CX, FY, CY)
    n = np.asarray(n)
    ok = np.asarray(ok)
    # OpenCV's asymmetric border (measured on the real library,
    # ops/normals.py docstring): valid rows/cols are [5, size-7]
    assert ok[5:h - 6, 5:w - 6].all()
    assert not ok[:5].any() and not ok[h - 6:].any()
    assert not ok[:, :5].any() and not ok[:, w - 6:].any()
    # plane z - a x - b y = 1 -> normal prop to (-a, -b, 1); camera-facing flips
    expect = np.array([-a, -b, 1.0])
    expect /= np.linalg.norm(expect)
    if np.dot(expect, [0, 0, 1]) > 0:
        expect = -expect  # camera-facing: n_z <= 0
    inner = ok[5:h - 6, 5:w - 6]
    dots = (n[5:h - 6, 5:w - 6] * expect).sum(-1)[inner]
    assert np.abs(dots).min() > 0.995  # < 6 deg worst case (30 deg gates downstream)


def test_depth_normals_invalid_near_holes():
    # raw-unit depth: a zero-depth hole produces |delta| = 10000 > 50 at
    # its neighbors, so the hole SAMPLE is discarded (OpenCV's edge-aware
    # gate) while the neighbors stay valid with clean plane normals —
    # unlike the pre-transcription estimator, which invalidated the whole
    # window around a hole
    depth = np.full((40, 40), 10000.0, np.float32)
    depth[20, 20] = 0.0
    n, ok = normals.depth_normals(jnp.asarray(depth), FX, CX, FY, CY)
    ok = np.asarray(ok)
    n = np.asarray(n)
    assert not ok[20, 20]  # the hole itself (z <= 0)
    assert ok[15, 20] and ok[25, 25]
    # neighbors reject the hole sample: their normals stay the flat plane's
    assert abs(n[15, 20] @ np.array([0.0, 0.0, -1.0])) > 0.999
    assert ok[10, 10]


def test_pca_normals_on_sphere(rng):
    # points on a unit sphere: outward normal == position
    v = rng.normal(size=(500, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    idx, cnt = normals.radius_neighbor_indices(v, 0.3, cap=64)
    n = np.asarray(
        normals.pca_normals_from_neighbors(
            jnp.asarray(v.astype(np.float32)),
            jnp.asarray(idx),
            jnp.asarray(cnt),
            orient_outward_from_origin=True,
        )
    )
    dots = (n * v).sum(-1)
    assert np.isfinite(n).all()
    assert dots.min() > 0.9  # outward within ~25 deg on a coarse sphere


def test_voxel_centroid_matches_bruteforce(rng):
    pos = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    valid = np.ones(300, bool)
    valid[250:] = False
    leaf = 0.25
    out_pos, out_valid, attrs = voxel.voxel_downsample_centroid(
        jnp.asarray(pos), jnp.asarray(valid), leaf,
        attrs={"w": jnp.asarray(np.arange(300, dtype=np.float32))},
    )
    out_pos = np.asarray(out_pos)[np.asarray(out_valid)]
    got_w = np.asarray(attrs["w"])[np.asarray(out_valid)]

    # brute force — pcl::VoxelGrid bins on the ABSOLUTE lattice via the
    # float32 reciprocal (ops/voxel._voxel_ijk; tests/test_scene_oracle.py
    # pins this against the real loader)
    p = pos[:250]
    inv_leaf = np.float32(1.0) / np.float32(leaf)
    keys = tuple(map(tuple, np.floor(p * inv_leaf).astype(int)))
    groups = {}
    for i, k in enumerate(keys):
        groups.setdefault(k, []).append(i)
    want = {
        tuple(np.round(p[g].mean(0), 5)): np.mean(np.arange(300, dtype=np.float32)[g])
        for g in map(np.array, groups.values())
    }
    assert len(want) == len(out_pos)
    for c, w in zip(out_pos, got_w):
        key = tuple(np.round(c, 5))
        assert key in want
        assert abs(want[key] - w) < 1e-3


def test_voxel_first_keeps_first_input_point(rng):
    pos = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
    valid = np.ones(200, bool)
    keep = np.asarray(voxel.voxel_downsample_first(jnp.asarray(pos), jnp.asarray(valid), 0.3))
    # brute force: first input index per floor(p/leaf) voxel
    seen = set()
    want = np.zeros(200, bool)
    for i, p in enumerate(pos):
        k = tuple(np.floor(p / 0.3).astype(int))
        if k not in seen:
            seen.add(k)
            want[i] = True
    np.testing.assert_array_equal(keep, want)


def test_radius_outlier_matches_bruteforce(rng):
    pos = rng.uniform(-0.5, 0.5, size=(250, 3)).astype(np.float32)
    # add isolated far points
    pos[:5] += 10.0
    valid = np.ones(250, bool)
    r, minn = 0.2, 8
    keep = np.asarray(
        voxel.radius_outlier_mask(jnp.asarray(pos), jnp.asarray(valid), r, minn)
    )
    d2 = ((pos[:, None] - pos[None, :]) ** 2).sum(-1)
    want = (d2 <= r * r).sum(1) >= minn  # self included
    np.testing.assert_array_equal(keep, want)


def test_grid_nn_matches_bruteforce(rng):
    scene = rng.uniform(-0.3, 0.3, size=(400, 3)).astype(np.float32)
    grid = gridhash.build_neighbor_grid(scene, cell_size=0.05)
    queries = rng.uniform(-0.35, 0.35, size=(300, 3)).astype(np.float32)
    idx, d2 = gridhash.query_restricted_nn(
        grid, jnp.asarray(queries), jnp.asarray(scene), 0.05
    )
    idx = np.asarray(idx)
    d2 = np.asarray(d2)

    bd2 = ((queries[:, None] - scene[None, :]) ** 2).sum(-1)
    want_idx = bd2.argmin(1)
    want_d2 = bd2.min(1)
    inside = want_d2 <= 0.05**2
    np.testing.assert_array_equal(idx >= 0, inside)
    np.testing.assert_allclose(d2[inside], want_d2[inside], rtol=1e-5)
    # matching index (distance ties are fine either way)
    same = idx[inside] == want_idx[inside]
    close = np.abs(d2[inside] - want_d2[inside]) < 1e-10
    assert (same | close).all()


def test_grid_nn_payload_matches_scan_path(rng):
    """The padded-payload fast path must return the same winners as the
    probe + scan path — same candidate order, same first-minimum
    tie-break — with d2 equal up to XLA fusion (FMA) in the last ULP
    (gridhash._query_payload docstring)."""
    scene = rng.uniform(-0.3, 0.3, size=(500, 3)).astype(np.float32)
    normal = rng.normal(size=(500, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    fast = gridhash.build_neighbor_grid(scene, cell_size=0.05, normal=normal)
    slow = gridhash.build_neighbor_grid(scene, cell_size=0.05, payload=False)
    assert fast.payload is not None and fast.has_normals
    assert slow.payload is None

    # in-grid, out-of-grid, and exactly-on-boundary queries
    queries = np.concatenate(
        [
            rng.uniform(-0.35, 0.35, size=(400, 3)),
            rng.uniform(-2.0, 2.0, size=(50, 3)),
            scene[:50],  # d2 == 0 exact hits
        ]
    ).astype(np.float32)
    qi = jnp.asarray(queries)
    si = jnp.asarray(scene)
    for radius in (0.05, 0.02):
        fi, fd = gridhash.query_restricted_nn(fast, qi, si, radius)
        wi, wd = gridhash.query_restricted_nn(slow, qi, si, radius)
        np.testing.assert_array_equal(np.asarray(fi), np.asarray(wi))
        np.testing.assert_allclose(
            np.asarray(fd), np.asarray(wd), rtol=1e-6
        )

    # normal variant: payload-baked normals equal gathered ones wherever
    # a neighbor was found
    fi, fd, fn = gridhash.query_restricted_nn_normal(
        fast, qi, si, jnp.asarray(normal), 0.05
    )
    wi, wd, wn = gridhash.query_restricted_nn_normal(
        slow, qi, si, jnp.asarray(normal), 0.05
    )
    found = np.asarray(fi) >= 0
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(wi))
    np.testing.assert_array_equal(
        np.asarray(fn)[found], np.asarray(wn)[found]
    )
