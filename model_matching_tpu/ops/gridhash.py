"""Voxel-grid spatial hash for restricted nearest-neighbor queries.

Replaces the reference's Super4PCS kd-tree and its stack-based
doQueryRestrictedClosestIndex (reference:
include/super4pcs/accelerators/kdtree.h:142,394-459, built at
src/stocs.cpp:966-980) with a TPU-friendly structure: the scene is binned
into cells of size epsilon (the query radius), and every cell in the
*dilated* occupied set stores the flat candidate list of its own 3x3x3
neighborhood. A query is then one bounded hash probe + a fixed-cap masked
scan — no tree walks, no data-dependent control flow.

Built on the host once per scene (the scene itself arrives through host
I/O); queried on device from inside jit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ppf_table import _build_open_table, _mix32_jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NeighborGrid:
    origin: jax.Array       # [3] f32 — grid corner (min - 1 cell)
    dims: jax.Array         # [3] i32 — cells per axis
    cell_size: jax.Array    # [] f32
    table_keys: jax.Array   # [T] i32 open addressing (-1 empty)
    table_offset: jax.Array  # [T] i32 into cand_idx
    table_count: jax.Array   # [T] i32
    cand_idx: jax.Array      # [C] i32 point indices
    max_probes: int = dataclasses.field(metadata=dict(static=True))
    cell_cap: int = dataclasses.field(metadata=dict(static=True))
    # padded-payload fast path (see build_neighbor_grid): a dense
    # cell -> compact-row map plus one [cell_cap, 8] f32 row per dilated
    # cell (px py pz nx ny nz idx valid), so a restricted-NN query costs
    # 2 row gathers instead of max_probes + 2 * cell_cap — the scan
    # path's gather-issue rate (~64M rows/s on v5e, docs/RESULTS.md) is
    # the whole cost of exact scoring. None when disabled or over the
    # memory guards; queries then use the probe + scan path.
    cell_map: jax.Array | None = None   # [prod(dims)] i32, -1 = empty
    payload: jax.Array | None = None    # [U, cell_cap, 8] f32
    has_normals: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )
    # payload slot 7 holds the candidate's class probability when built
    # with `prob` (scorers skip the winner-prob gather; only valid for the
    # undecayed vector the grid was built with), else a 1.0 validity
    # placeholder. Candidate validity is always slot 6 (idx) >= 0.
    has_probs: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )


#: candidates further than this many cell-sizes from a cell center can never
#: be the NN of a query in that cell when the query radius <= cell_size
#: (query within cell: dist(center) <= radius + sqrt(3)/2 * cell)
_BALL_SLACK = 1.0 + np.sqrt(3.0) / 2.0


#: payload fast-path memory guards: skip the dense map when the grid has
#: more cells than this (map = 4 bytes/cell), and skip the padded payload
#: when it would exceed this many bytes — the probe + scan path still
#: answers every query exactly, just slower.
_MAX_MAP_CELLS = 1 << 26
_MAX_PAYLOAD_BYTES = 512 << 20


def build_neighbor_grid(
    pos: np.ndarray,
    cell_size: float,
    cell_cap: int | None = None,
    normal: np.ndarray | None = None,
    prob: np.ndarray | None = None,
    payload: bool = True,
) -> NeighborGrid:
    """Host-side build. `pos` [N, 3] float32 (no padding).

    Candidate lists hold only points within _BALL_SLACK * cell_size of the
    cell center (a strict subset of the 3x3x3 neighborhood union), which is
    sufficient for exact restricted-NN queries with radius <= cell_size —
    and typically 4-6x shorter, which directly shortens the query's
    candidate scan. cell_cap=None (default) sizes the scan cap to the
    longest surviving list (exact, no truncation); an explicit cap bounds
    memory and warns when it truncates.

    `payload=True` (default) additionally materializes the padded-row fast
    path (see NeighborGrid.cell_map/payload): identical query results, one
    aligned row gather per query instead of a probe loop + candidate scan.
    Pass the matching `normal` array to bake per-candidate normals into
    the payload so scorers skip the winner's normal gather too."""
    pos = np.asarray(pos, dtype=np.float32)
    n = pos.shape[0]
    lo = pos.min(axis=0) - cell_size
    hi = pos.max(axis=0) + cell_size
    dims = np.maximum(np.ceil((hi - lo) / cell_size).astype(np.int64) + 1, 1)

    ijk = np.floor((pos - lo) / cell_size).astype(np.int64)
    ijk = np.clip(ijk, 0, dims - 1)

    def linear(c):
        return (c[..., 0] * dims[1] + c[..., 1]) * dims[2] + c[..., 2]

    keys = linear(ijk)

    # dilated cell set: every cell adjacent to an occupied cell gets an entry
    offsets = np.array(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        dtype=np.int64,
    )
    dilated = ijk[:, None, :] + offsets[None, :, :]
    ok = ((dilated >= 0) & (dilated < dims)).all(axis=-1)
    dilated_keys = np.unique(linear(dilated[ok]))

    # candidate list of each dilated cell: its 27-neighborhood points, ball-
    # filtered to dist(cell center) <= _BALL_SLACK * cell (exactness-
    # preserving for query radius <= cell_size, and 4-6x shorter lists)
    order = np.argsort(keys, kind="stable")
    keys_sorted = keys[order]

    u = len(dilated_keys)
    starts = np.empty((27, u), dtype=np.int64)
    ends = np.empty((27, u), dtype=np.int64)
    for oi, (dx, dy, dz) in enumerate(offsets):
        nkeys = dilated_keys + (dx * dims[1] + dy) * dims[2] + dz
        starts[oi] = np.searchsorted(keys_sorted, nkeys, side="left")
        ends[oi] = np.searchsorted(keys_sorted, nkeys, side="right")
    # note: linear-key adjacency can alias across axis boundaries; the ball
    # filter below removes stray candidates anyway.
    counts_per = ends - starts  # [27, U]

    # expand every (offset, cell) range into a flat candidate array
    tt = counts_per.ravel()
    total = int(tt.sum())
    seg_base = np.cumsum(tt) - tt
    r = np.arange(total, dtype=np.int64) - np.repeat(seg_base, tt)
    src = np.repeat(starts.ravel(), tt) + r
    cand_pt = order[src]
    cell_for = np.repeat(np.tile(np.arange(u, dtype=np.int64), 27), tt)

    # ball filter against the owning cell's center
    cz = dilated_keys % dims[2]
    cy = (dilated_keys // dims[2]) % dims[1]
    cx = dilated_keys // (dims[1] * dims[2])
    centers = lo + (
        np.stack([cx, cy, cz], axis=1).astype(np.float32) + 0.5
    ) * cell_size
    d = np.linalg.norm(pos[cand_pt] - centers[cell_for], axis=1)
    keep = d <= _BALL_SLACK * cell_size * (1.0 + 1e-5)
    cand_pt = cand_pt[keep]
    cell_for = cell_for[keep]

    # group by cell (stable sort keeps deterministic within-cell order)
    o2 = np.argsort(cell_for, kind="stable")
    cand_pt = cand_pt[o2]
    cell_for = cell_for[o2]
    counts = np.bincount(cell_for, minlength=u).astype(np.int64)
    max_count = int(counts.max()) if u else 0

    if cell_cap is None:
        # exact: the scan cap covers the longest list (multiple of 8 for
        # loop friendliness)
        cap = max(8, -(-max_count // 8) * 8)
    else:
        cap = cell_cap
        dropped = int(np.maximum(counts - cap, 0).sum())
        if dropped:
            # a truncated cell can hide the true nearest neighbor from
            # query_restricted_nn; surface it like other capacity overflows
            from ..utils.log import warn

            warn(
                f"neighbor grid dropped {dropped} candidate entries in "
                f"{int((counts > cap).sum())}/{u} cells — NN queries in "
                f"those cells may miss the true nearest point; raise "
                f"cell_cap or pass None for the exact auto cap",
                cell_cap=cap, densest=max_count,
            )

    group_start = np.cumsum(counts) - counts
    within = np.arange(len(cand_pt), dtype=np.int64) - np.repeat(
        group_start, counts
    )
    keep2 = within < cap
    flat = cand_pt[keep2]
    cand_count = np.minimum(counts, cap)
    cand_offset = np.cumsum(cand_count) - cand_count

    g_total = int(np.prod(dims))
    pay = cmap = None
    has_normals = False
    if (
        payload
        and u
        and n < (1 << 24)                      # point idx exact in f32
        and g_total <= _MAX_MAP_CELLS
        and u * cap * 32 <= _MAX_PAYLOAD_BYTES
    ):
        payf = np.zeros((u, cap, 8), np.float32)
        payf[:, :, 0:3] = np.inf               # pad positions never win
        payf[:, :, 6] = -1.0
        rows_ = np.repeat(np.arange(u, dtype=np.int64), cand_count)
        cols_ = np.arange(len(flat), dtype=np.int64) - np.repeat(
            cand_offset, cand_count
        )
        payf[rows_, cols_, 0:3] = pos[flat]
        if normal is not None:
            payf[rows_, cols_, 3:6] = np.asarray(normal, np.float32)[flat]
            has_normals = True
        payf[rows_, cols_, 6] = flat.astype(np.float32)
        payf[rows_, cols_, 7] = (
            1.0 if prob is None else np.asarray(prob, np.float32)[flat]
        )
        cmap_np = np.full(g_total, -1, np.int32)
        cmap_np[dilated_keys] = np.arange(u, dtype=np.int32)
        pay = jnp.asarray(payf)
        cmap = jnp.asarray(cmap_np)

    table_idx, max_probes = _build_open_table(dilated_keys.astype(np.int32))
    t = table_idx.shape[0]
    table_keys = np.full(t, -1, dtype=np.int32)
    table_offset = np.zeros(t, dtype=np.int32)
    table_count = np.zeros(t, dtype=np.int32)
    occ = table_idx >= 0
    table_keys[occ] = dilated_keys[table_idx[occ]].astype(np.int32)
    table_offset[occ] = cand_offset[table_idx[occ]].astype(np.int32)
    table_count[occ] = cand_count[table_idx[occ]].astype(np.int32)

    return NeighborGrid(
        origin=jnp.asarray(lo),
        dims=jnp.asarray(dims.astype(np.int32)),
        cell_size=jnp.asarray(np.float32(cell_size)),
        table_keys=jnp.asarray(table_keys),
        table_offset=jnp.asarray(table_offset),
        table_count=jnp.asarray(table_count),
        cand_idx=jnp.asarray(flat.astype(np.int32)),
        max_probes=int(max_probes),
        cell_cap=int(cap),
        cell_map=cmap,
        payload=pay,
        has_normals=has_normals,
        has_probs=pay is not None and prob is not None,
    )


def _query_payload(grid: NeighborGrid, points: jax.Array, radius):
    """Fast-path restricted NN: one map gather + one padded-row gather per
    query. Candidate order inside a payload row equals the scan path's
    candidate list order and d2 is the same elementwise expression with
    the same first-minimum tie-break, so winners match the probe + scan
    path (d2 may differ in the final ULP from XLA fusion/FMA). Returns
    (idx, sqdist, k, pay) where k/pay let callers read more of the
    winner's row (e.g. its baked normal)."""
    ijk = jnp.floor((points - grid.origin) / grid.cell_size).astype(jnp.int32)
    in_grid = ((ijk >= 0) & (ijk < grid.dims)).all(axis=-1)
    flat = (ijk[..., 0] * grid.dims[1] + ijk[..., 1]) * grid.dims[2] + ijk[..., 2]
    rid = grid.cell_map[jnp.clip(flat, 0, grid.cell_map.shape[0] - 1)]
    rid = jnp.where(in_grid, rid, -1)
    pay = grid.payload[jnp.maximum(rid, 0)]        # [..., cap, 8]
    d2 = jnp.sum((points[..., None, :] - pay[..., 0:3]) ** 2, axis=-1)
    live = (rid >= 0)[..., None] & (pay[..., 6] >= 0)
    d2 = jnp.where(live, d2, jnp.inf)
    k = jnp.argmin(d2, axis=-1)
    best_d2 = jnp.take_along_axis(d2, k[..., None], axis=-1)[..., 0]
    idx = jnp.take_along_axis(pay[..., 6], k[..., None], axis=-1)[..., 0]
    ok = best_d2 <= radius * radius
    return (
        jnp.where(ok, idx.astype(jnp.int32), -1),
        jnp.where(ok, best_d2, jnp.inf),
        k,
        pay,
    )


def query_restricted_nn(
    grid: NeighborGrid,
    points: jax.Array,      # [..., 3] query positions
    target_pos: jax.Array,  # [S, 3] the scene positions the grid indexes
    radius,
):
    """Nearest target index within `radius` per query (or -1), matching the
    kd-tree's <=-radius semantics (kdtree.h:424 keeps sqdist <= bound).
    Returns (index [...], sqdist [...])."""
    if grid.payload is not None:
        idx, d2, _k, _pay = _query_payload(grid, points, radius)
        return idx, d2
    ijk = jnp.floor((points - grid.origin) / grid.cell_size).astype(jnp.int32)
    in_grid = ((ijk >= 0) & (ijk < grid.dims)).all(axis=-1)
    key = (ijk[..., 0] * grid.dims[1] + ijk[..., 1]) * grid.dims[2] + ijk[..., 2]
    key = jnp.where(in_grid, key, -1)

    # bounded linear probe
    tsize = grid.table_keys.shape[0]
    mask = jnp.uint32(tsize - 1)
    h0 = _mix32_jnp(key) & mask

    def probe_body(i, state):
        slot, done = state
        h = ((h0 + jnp.uint32(i)) & mask).astype(jnp.int32)
        k = grid.table_keys[h]
        found = (k == key) & ~done
        slot = jnp.where(found, h, slot)
        done = done | found | (k == -1)
        return slot, done

    slot, _ = jax.lax.fori_loop(
        0, grid.max_probes, probe_body,
        (jnp.full(key.shape, -1, jnp.int32), key < 0),
    )
    hit = slot >= 0
    off = jnp.where(hit, grid.table_offset[jnp.maximum(slot, 0)], 0)
    cnt = jnp.where(hit, grid.table_count[jnp.maximum(slot, 0)], 0)

    r2 = radius * radius
    best_d2 = jnp.full(key.shape, jnp.inf, points.dtype)
    best_idx = jnp.full(key.shape, -1, jnp.int32)

    def scan_body(k, state):
        best_d2, best_idx = state
        live = k < cnt
        ci = grid.cand_idx[jnp.clip(off + k, 0, grid.cand_idx.shape[0] - 1)]
        tp = target_pos[ci]
        d2 = jnp.sum((points - tp) ** 2, axis=-1)
        better = live & (d2 <= r2) & (d2 < best_d2)
        best_d2 = jnp.where(better, d2, best_d2)
        best_idx = jnp.where(better, ci, best_idx)
        return best_d2, best_idx

    best_d2, best_idx = jax.lax.fori_loop(
        0, grid.cell_cap, scan_body, (best_d2, best_idx)
    )
    return best_idx, best_d2


def query_restricted_nn_normal(
    grid: NeighborGrid,
    points: jax.Array,       # [..., 3] query positions
    target_pos: jax.Array,   # [S, 3]
    target_normal: jax.Array,  # [S, 3]
    radius,
):
    """query_restricted_nn plus the winner's normal (the scorer's gate
    input, stocs.cpp:1026-1032). With a normal-baked payload the normal
    comes from the winner's padded row — no [.., 3] row gather; otherwise
    it is gathered from target_normal at the (clamped) winner index. The
    normal at idx == -1 slots is target_normal[0] / the clamped row —
    callers gate on idx >= 0 before using it."""
    if grid.payload is not None and grid.has_normals:
        idx, d2, k, pay = _query_payload(grid, points, radius)
        nrm = jnp.take_along_axis(
            pay[..., 3:6], k[..., None, None], axis=-2
        )[..., 0, :]
        return idx, d2, nrm
    idx, d2 = query_restricted_nn(grid, points, target_pos, radius)
    nrm = target_normal[jnp.maximum(idx, 0)]
    return idx, d2, nrm


def query_restricted_nn_scored(
    grid: NeighborGrid,
    points: jax.Array,   # [..., 3] query positions
    radius,
):
    """query_restricted_nn plus the winner's baked normal AND class
    probability, entirely from the payload row — zero extra gathers per
    query. Requires a payload built with both `normal` and `prob`
    (grid.has_normals and grid.has_probs); callers gate the returned
    normal/prob on idx >= 0."""
    if grid.payload is None or not (grid.has_normals and grid.has_probs):
        raise ValueError(
            "query_restricted_nn_scored needs a payload grid built with "
            "normal= and prob= (see build_neighbor_grid)"
        )
    idx, d2, k, pay = _query_payload(grid, points, radius)
    nrm = jnp.take_along_axis(
        pay[..., 3:6], k[..., None, None], axis=-2
    )[..., 0, :]
    prob = jnp.take_along_axis(pay[..., 7], k[..., None], axis=-1)[..., 0]
    return idx, d2, nrm, prob
