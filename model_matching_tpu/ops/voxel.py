"""Voxel downsampling and radius outlier removal as sort/segment device ops.

Replaces pcl::VoxelGrid (centroid per voxel; reference: src/rgbd.cpp:227-230,
src/stocs.cpp:54-57), the reference's first-point-per-voxel hash sampler
(include/sampler.hpp:10-72 — declared at src/stocs.cpp:40,112 but never
invoked; provided here for capability parity), and
pcl::RadiusOutlierRemoval (reference: src/rgbd.cpp:232-236).

All ops take padded [N, ...] arrays + validity masks and emit same-capacity
padded outputs, so they compose inside one jit program.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# Cells per axis for linearized voxel keys. 1024^3 fits int32; the grid is
# anchored at the cloud minimum so indices are non-negative. Points beyond
# the range clamp into the boundary cell (logged upstream via grid_overflow).
_GRID_AXIS = 1024


def _voxel_ijk(pos, origin, leaf):
    # pcl::VoxelGrid binning, bit-for-bit: floor(p * (1/leaf)) with the
    # reciprocal rounded to float32 first (PCL stores inverse_leaf_size_
    # as Array4f), absolute — not anchored at the cloud minimum. This
    # matters beyond pedantry: u16 depth values are exact multiples of
    # the leaf on the bundled fixtures (leaf 5 mm = 50 raw units), so
    # thousands of points sit exactly ON a z boundary and any other f32
    # evaluation order flips ~2% of them, shifting ~12% of the output
    # centroids (tests/test_scene_oracle.py pins the partition). The
    # origin shift happens in INTEGER space (zero rounding) and only
    # keeps indices non-negative for the linear key.
    inv = jnp.float32(1.0) / jnp.float32(leaf)
    k = jnp.floor(pos * inv).astype(jnp.int32)
    k0 = jnp.floor(origin * inv).astype(jnp.int32)
    return jnp.clip(k - k0, 0, _GRID_AXIS - 1)


def _linear_key(ijk):
    return (ijk[..., 0] * _GRID_AXIS + ijk[..., 1]) * _GRID_AXIS + ijk[..., 2]


# plain Python int, NOT jnp.int32(...): a module-level device constant
# would initialize the XLA backend at import time, which breaks multi-host
# bootstrap (jax.distributed.initialize must run before any backend touch)
_INVALID_KEY = 2**31 - 1


def voxel_downsample_centroid(
    pos: jax.Array,
    valid: jax.Array,
    leaf: float,
    attrs: Dict[str, jax.Array] | None = None,
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Centroid-per-voxel downsampling (pcl::VoxelGrid semantics: every field
    is averaged over the voxel's members). Returns (pos, valid, attrs) padded
    to the input capacity; output order is ascending voxel key."""
    attrs = attrs or {}
    n = pos.shape[0]
    big = jnp.float32(3.0e38)
    masked_pos = jnp.where(valid[:, None], pos, big)
    origin = jnp.min(masked_pos, axis=0)

    key = jnp.where(valid, _linear_key(_voxel_ijk(pos, origin, leaf)), _INVALID_KEY)
    order = jnp.argsort(key)
    key_s = key[order]

    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
    )
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # [N] segment ids

    def seg_mean(x_sorted):
        s = jax.ops.segment_sum(x_sorted, seg, num_segments=n)
        return s

    ones = valid[order].astype(pos.dtype)
    counts = seg_mean(ones)
    denom = jnp.maximum(counts, 1.0)

    out_pos = seg_mean(pos[order] * ones[:, None]) / denom[:, None]
    out_attrs = {
        k: seg_mean(
            (v[order].astype(pos.dtype).reshape(n, -1) * ones[:, None])
        ).reshape((n,) + v.shape[1:]) / denom.reshape((n,) + (1,) * (v.ndim - 1))
        for k, v in attrs.items()
    }
    out_valid = counts > 0.5
    return out_pos, out_valid, out_attrs


def voxel_downsample_first(pos: jax.Array, valid: jax.Array, leaf: float):
    """First-point-per-voxel selection mask (the reference's hash sampler
    keeps the first input-order point of each voxel, sampler.hpp:56-71;
    voxels are floor(p / leaf) in absolute coordinates). Returns a [N] bool
    keep-mask over the *input* order."""
    n = pos.shape[0]
    ijk = jnp.floor(pos / leaf).astype(jnp.int32)
    # absolute coords can be negative: shift into the unsigned range
    ijk = jnp.clip(ijk + _GRID_AXIS // 2, 0, _GRID_AXIS - 1)
    key = jnp.where(valid, _linear_key(ijk), _INVALID_KEY)
    order = jnp.argsort(key, stable=True)  # ties keep input order
    key_s = key[order]
    is_first = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    keep_sorted = is_first & (key_s != _INVALID_KEY)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def radius_outlier_mask(
    pos: jax.Array,
    valid: jax.Array,
    radius: float,
    min_neighbors: int,
    cell_cap: int = 64,
) -> jax.Array:
    """Keep-mask for points with >= min_neighbors within `radius` (self
    included, like pcl::RadiusOutlierRemoval's radiusSearch). Implemented as
    a sorted voxel-grid (cell = radius) with a 27-cell capped count."""
    n = pos.shape[0]
    big = jnp.float32(3.0e38)
    masked_pos = jnp.where(valid[:, None], pos, big)
    origin = jnp.min(masked_pos, axis=0)
    ijk = _voxel_ijk(pos, origin, radius)
    key = jnp.where(valid, _linear_key(ijk), _INVALID_KEY)

    order = jnp.argsort(key)
    key_s = key[order]
    pos_s = pos[order]

    r2 = jnp.float32(radius * radius)
    counts = jnp.zeros((n,), jnp.int32)
    # For each of the 27 neighbor cells: locate that cell's run in the sorted
    # key array with searchsorted, then scan up to cell_cap members.
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nkey = key + (dx * _GRID_AXIS + dy) * _GRID_AXIS + dz
                start = jnp.searchsorted(key_s, nkey, side="left")
                end = jnp.searchsorted(key_s, nkey, side="right")
                span = jnp.minimum(end - start, cell_cap)

                def body(k, c):
                    idx = jnp.minimum(start + k, n - 1)
                    inside = k < span
                    d2 = jnp.sum((pos - pos_s[idx]) ** 2, axis=-1)
                    hit = inside & (d2 <= r2)
                    return c + hit.astype(jnp.int32)

                counts = jax.lax.fori_loop(0, cell_cap, body, counts)
    return valid & (counts >= min_neighbors)
