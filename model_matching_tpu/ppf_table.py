"""Dense PPF hash table: the load-bearing data structure of the pipeline.

The reference stores the model's point-pair features in a
std::map<vector<int>4, vector<pair<int,int>>> with a 2x4x4x4 = 128-bin
insertion fan-out for tolerance (reference: include/rgbd.hpp:23,
src/rgbd.cpp:123-154), serialized with Boost (src/rgbd.cpp:156-177). Pointer
maps don't exist on a TPU, so the same semantics are re-laid-out as dense
HBM arrays:

  * pairs are stored ONCE under their exact feature bin, as a CSR layout
    (sorted flat [P, 2] index array + per-bin offset/count), reached through
    an open-addressing int32-key hash table;
  * the 128-way insertion fan-out is inverted into a 128-way *query* fan-out
    (query bin q matches source bin f iff q in fanout(f) iff f in q - fanout),
    which shrinks storage by ~128x and is only paid on the ~2 congruent-set
    lookups per base;
  * the hot [B, N] "does PPF(b, i) exist?" checks of base sampling
    (reference: src/stocs.cpp:395-407,424-442,456-497) hit a second
    keys-only open-addressing table holding the fanned-out key set, so an
    existence check is a single bounded linear-probe: a few vectorized
    gathers.

Built offline on the host (numpy), persisted as npz (replacing the Boost
binary archive), probed on device with bounded `lax.fori_loop` linear probing.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.ppf import (
    MIN_DISTANCE_BIN_MM,
    _ANGLE_RADIX,
    fanout_deltas,
)

FORMAT_VERSION = 1

# Direct-mapped table guard: the dense (offset, count) array is only built
# when the model's dense key space fits in this many entries (8 bytes per
# entry). PPF distance bins are bounded by the MODEL's diameter, so small
# objects (every bundled fixture: ~2M dense keys, 16 MB) qualify easily;
# meter-scale models fall back to the probing hash tables.
DIRECT_CAP = 1 << 23


def _dense_radix(rot_disc: int) -> int:
    """Digit radix of the DENSE key packing used by the direct-mapped
    tables. pack_key's radix-64 digits (ops/ppf.py:31) waste 64/37 per
    angle digit at the default rot_disc=5 (angle quotients reach only
    180/rot_disc); repacking at the tight radix shrinks the dense key
    space ~5x, which is what makes a one-gather direct-mapped table
    affordable. Must exceed every inserted angle quotient: snapped angle
    bins reach exactly 180 (ppf binning, ops/ppf.py), so quotients reach
    180 // rot_disc."""
    return 180 // rot_disc + 1


def dense_index_np(keys: np.ndarray, rot_disc: int, size: int) -> np.ndarray:
    """Radix-64 packed key -> dense direct-table index, -1 when out of
    range (alias-free: any digit >= the dense radix can never have been
    inserted, so it is a guaranteed miss). Mirror of dense_index_jnp."""
    ar = _dense_radix(rot_disc)
    a3 = keys & 63
    a2 = (keys >> 6) & 63
    a1 = (keys >> 12) & 63
    dq = (keys >> 18).astype(np.int64)
    ok = (keys >= 0) & (a1 < ar) & (a2 < ar) & (a3 < ar)
    idx = ((dq * ar + a1) * ar + a2) * ar + a3
    ok &= idx < size
    return np.where(ok, idx, -1).astype(np.int64)


def dense_index_jnp(keys: jax.Array, rot_disc: int, size: int) -> jax.Array:
    ar = _dense_radix(rot_disc)
    a3 = keys & 63
    a2 = (keys >> 6) & 63
    a1 = (keys >> 12) & 63
    dq = keys >> 18
    ok = (keys >= 0) & (a1 < ar) & (a2 < ar) & (a3 < ar)
    idx = ((dq * ar + a1) * ar + a2) * ar + a3
    ok = ok & (idx < size)
    return jnp.where(ok, idx, jnp.int32(-1))


def _build_direct_np(
    uniq_keys: np.ndarray,
    offsets: np.ndarray,
    counts: np.ndarray,
    fan_keys: np.ndarray,
    rot_disc: int,
    min_size: int = 0,
    cap: int = DIRECT_CAP,
):
    """Dense direct-mapped twins of the two hash tables:

      * bin_direct [S, 2] int32 — (offset, count) at the dense key index,
        zeros elsewhere (count 0 == miss), so a pair-range lookup is ONE
        row gather instead of a bounded probe loop over the open table;
      * exist_direct [S/32] uint32 — membership bitmap of the fanned-out
        key set, so an existence check is one word gather + bit test.

    S is the power-of-two cover of the model's largest dense key (>=
    min_size for shape sharing across standardized models). Returns
    (None, None) when S would exceed `cap` entries."""
    ar = _dense_radix(rot_disc)
    if ar > 64:
        return None, None  # dense digits would not round-trip radix 64
    kmax = -1
    for k in (uniq_keys, fan_keys):
        if k.size:
            kmax = max(kmax, int(dense_index_np(k, rot_disc, 1 << 62).max()))
    if kmax < 0:
        return None, None
    size = 1 << int(np.ceil(np.log2(max(kmax + 1, 32))))
    size = max(size, min_size)
    if size > cap:
        return None, None
    bin_direct = np.zeros((size, 2), np.int32)
    bidx = dense_index_np(uniq_keys, rot_disc, size)
    good = bidx >= 0
    bin_direct[bidx[good], 0] = offsets[good].astype(np.int32)
    bin_direct[bidx[good], 1] = counts[good].astype(np.int32)
    exist_direct = np.zeros(size // 32, np.uint32)
    eidx = dense_index_np(fan_keys, rot_disc, size)
    eidx = eidx[eidx >= 0]
    np.bitwise_or.at(
        exist_direct, eidx >> 5, np.uint32(1) << (eidx & 31).astype(np.uint32)
    )
    return bin_direct, exist_direct


def _mix32_np(key: np.ndarray) -> np.ndarray:
    """murmur3 finalizer — full-avalanche 32-bit mixer. PPF keys are highly
    correlated (neighboring bins differ in one digit), so a plain
    multiplicative hash clusters badly; this keeps linear-probe runs short.
    Must stay bit-identical with _mix32_jnp."""
    h = key.astype(np.uint32)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h *= np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h


def _mix32_jnp(key: jax.Array) -> jax.Array:
    h = key.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


# ---------------------------------------------------------------------------
# key packing (numpy-side mirrors of ops.ppf.pack_key, kept separate because
# the build path needs the ungated "exact bin" variant as well)
# ---------------------------------------------------------------------------

def pack_exact_np(bins: np.ndarray, tr_disc: int, rot_disc: int) -> np.ndarray:
    """Pack exact feature bins [..., 4] -> int32 keys; -1 if out of range."""
    q = np.empty(bins.shape, dtype=np.int64)
    q[..., 0] = bins[..., 0] // tr_disc
    q[..., 1:] = bins[..., 1:] // rot_disc
    key = (
        (q[..., 0] * _ANGLE_RADIX + q[..., 1]) * _ANGLE_RADIX + q[..., 2]
    ) * _ANGLE_RADIX + q[..., 3]
    bad = (
        (bins < 0).any(axis=-1)
        | (q[..., 1:] >= _ANGLE_RADIX).any(axis=-1)
        | (key > np.iinfo(np.int32).max)
    )
    return np.where(bad, -1, key).astype(np.int32)


def pack_query_np(bins: np.ndarray, tr_disc: int, rot_disc: int) -> np.ndarray:
    """Pack with the reference's insert-side rejection (distance bin <= 5mm or
    negative angles never enter the map, src/rgbd.cpp:135-136), so gated
    queries simply miss."""
    key = pack_exact_np(bins, tr_disc, rot_disc)
    bad = (bins[..., 0] <= MIN_DISTANCE_BIN_MM) | (bins < 0).any(axis=-1)
    return np.where(bad, -1, key).astype(np.int32)


def fanout_keys(uniq_keys: np.ndarray, tr_disc: int, rot_disc: int
                ) -> np.ndarray:
    """[U*128] packed fan-out keys (-1 where the insert-side rejection
    applies) of the existence-set build: the deltas act directly in
    quotient space (fanout bins are quotient-aligned), so no unpack-to-
    bins round trip is needed. Semantics identical to
    pack_query_np(unpack + deltas*disc); tests/test_ppf.py pins the
    equivalence. Threaded C++ when available, vectorized numpy fallback
    (the old bins-space path cost 81 s on obj_06's 22.8M fanned rows)."""
    from . import native

    deltas = fanout_deltas(tr_disc, rot_disc)
    out = native.fanout_pack(
        uniq_keys, tr_disc, MIN_DISTANCE_BIN_MM, deltas
    )
    if out is not None:
        return out
    k = uniq_keys.astype(np.int64)
    q = np.empty((k.shape[0], 4), np.int32)
    q[:, 3] = k % _ANGLE_RADIX
    k //= _ANGLE_RADIX
    q[:, 2] = k % _ANGLE_RADIX
    k //= _ANGLE_RADIX
    q[:, 1] = k % _ANGLE_RADIX
    q[:, 0] = k // _ANGLE_RADIX
    nq = q[:, None, :] + deltas[None, :, :]          # [U, 128, 4] int32
    key = (
        (nq[..., 0].astype(np.int64) * _ANGLE_RADIX + nq[..., 1])
        * _ANGLE_RADIX + nq[..., 2]
    ) * _ANGLE_RADIX + nq[..., 3]
    bad = (
        (nq[..., 0] * tr_disc <= MIN_DISTANCE_BIN_MM)
        | (nq[..., 1:] < 0).any(axis=-1)
        | (nq[..., 1:] >= _ANGLE_RADIX).any(axis=-1)
        | (key > np.iinfo(np.int32).max)
    )
    return np.where(bad, -1, key).astype(np.int32).reshape(-1)


def unpack_key_np(keys: np.ndarray, tr_disc: int, rot_disc: int) -> np.ndarray:
    k = keys.astype(np.int64)
    q4 = k % _ANGLE_RADIX
    k //= _ANGLE_RADIX
    q3 = k % _ANGLE_RADIX
    k //= _ANGLE_RADIX
    q2 = k % _ANGLE_RADIX
    q1 = k // _ANGLE_RADIX
    return np.stack(
        [q1 * tr_disc, q2 * rot_disc, q3 * rot_disc, q4 * rot_disc], axis=-1
    ).astype(np.int32)


# ---------------------------------------------------------------------------
# host-side open-addressing construction
# ---------------------------------------------------------------------------

def _build_open_table(
    keys: np.ndarray, min_size: int = 0, oversize: int = 4
) -> Tuple[np.ndarray, int]:
    """Insert sorted unique int32 keys into a power-of-two linear-probe table.

    Returns (table of indices into `keys`, -1 = empty; max_probes bound valid
    for both hits and misses). min_size forces a larger table (used to give
    several models identical table shapes for vmapped multi-object runs).

    `oversize` sets the inverse load factor (table >= oversize * keys):
    the device lookup is a batched while_loop that runs until the SLOWEST
    key in the batch resolves, so the longest probe run — not the mean —
    prices every lookup. Load 1/4 measured max_probes 14 on the YCB bin
    table; 1/16 cuts it to ~4 for a few MB of int32 arrays."""
    u = keys.shape[0]
    size = 1 << int(np.ceil(np.log2(max(oversize * u, 16, min_size))))
    mask = np.uint32(size - 1)
    table = np.full(size, -1, dtype=np.int64)
    slot = (_mix32_np(keys) & mask).astype(np.int64)
    remaining = np.arange(u, dtype=np.int64)
    rounds = 0
    while remaining.size:
        s = slot[remaining]
        open_mask = table[s] == -1
        cand = remaining[open_mask]
        cand_slots = s[open_mask]
        uniq_slots, first = np.unique(cand_slots, return_index=True)
        table[uniq_slots] = cand[first]
        placed = np.zeros(u, dtype=bool)
        placed[cand[first]] = True
        remaining = remaining[~placed[remaining]]
        slot[remaining] = (slot[remaining] + 1) & int(mask)
        rounds += 1
        if rounds > size:
            raise RuntimeError("open addressing failed to converge")

    # A missing key scans until the first empty slot, so the miss bound is the
    # longest circular run of occupied slots + 1.
    occ = table != -1
    if occ.all():
        raise RuntimeError("hash table is full")
    # rotate so position 0 is empty, then measure runs
    first_empty = int(np.argmin(occ))
    occ_rot = np.roll(occ, -first_empty)
    # run lengths of consecutive True
    padded = np.concatenate([[False], occ_rot, [False]])
    edges = np.flatnonzero(np.diff(padded.astype(np.int8)))
    longest_run = int((edges[1::2] - edges[0::2]).max()) if edges.size else 0
    max_probes = max(rounds, longest_run + 1)
    return table, max_probes


# ---------------------------------------------------------------------------
# the table itself
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PPFTable:
    """Device-resident PPF map. See module docstring for the layout."""

    # keys-only table of the fanned-out key set (existence checks)
    exist_keys: jax.Array   # [Te] int32, -1 = empty
    # exact-bin CSR (congruent-set pair lookups)
    bin_keys: jax.Array     # [Tb] int32, -1 = empty
    bin_offset: jax.Array   # [Tb] int32
    bin_count: jax.Array    # [Tb] int32
    pairs: jax.Array        # [P, 2] int32, sorted by exact bin

    tr_disc: int = dataclasses.field(metadata=dict(static=True))
    rot_disc: int = dataclasses.field(metadata=dict(static=True))
    exist_max_probes: int = dataclasses.field(metadata=dict(static=True))
    bin_max_probes: int = dataclasses.field(metadata=dict(static=True))

    # direct-mapped twins (see _build_direct_np): present whenever the
    # model's dense key space fits DIRECT_CAP — every bundled fixture does.
    # When present, lookup_pair_range / ppf_exists are single gathers; the
    # probing tables above remain the fallback (and the persisted format).
    bin_direct: jax.Array | None = None    # [S, 2] int32 (offset, count)
    exist_direct: jax.Array | None = None  # [S/32] uint32 bitmap

    @property
    def num_pairs(self) -> int:
        return self.pairs.shape[0]


def _features_chunked(
    pos: np.ndarray, normal: np.ndarray, tr_disc: int, rot_disc: int,
    chunk: int = 256,
):
    """Exact PPF bins for all ordered pairs i != j, chunked over i.

    Yields (i0, bins [c, M, 4] int32, dist [c, M] f32)."""
    m = pos.shape[0]
    for i0 in range(0, m, chunk):
        p1 = pos[i0 : i0 + chunk, None, :]
        n1 = normal[i0 : i0 + chunk, None, :]
        p2 = pos[None, :, :]
        n2 = normal[None, :, :]
        u = p1 - p2
        d = np.linalg.norm(u, axis=-1)

        def angle(a, b):
            cr = np.cross(np.broadcast_to(a, np.broadcast_shapes(a.shape, b.shape)),
                          np.broadcast_to(b, np.broadcast_shapes(a.shape, b.shape)))
            s = np.linalg.norm(cr, axis=-1)
            c = np.sum(a * b, axis=-1)
            return np.degrees(np.arctan2(s, c))

        f = np.empty(d.shape + (4,), dtype=np.int32)
        f[..., 0] = (d * 1000.0).astype(np.int32)
        f[..., 1] = angle(n1, u).astype(np.int32)
        f[..., 2] = angle(n2, u).astype(np.int32)
        f[..., 3] = angle(n1, n2).astype(np.int32)

        def snap(v, disc):
            lower = v - v % disc
            upper = lower + disc
            return np.where(v - lower < upper - v, lower, upper)

        bins = np.empty_like(f)
        bins[..., 0] = snap(f[..., 0], tr_disc)
        bins[..., 1:] = snap(f[..., 1:], rot_disc)
        yield i0, bins, d


def build_ppf_table(
    pos: np.ndarray,
    normal: np.ndarray,
    tr_disc: int,
    rot_disc: int,
) -> Tuple["PPFTable", float]:
    """Offline O(M^2) build over all ordered pairs (reference:
    src/stocs.cpp:63-78). Returns (table, max pairwise distance)."""
    # the base-64 angle packing of pack_key/ppf_keys_fast aliases when an
    # angle quotient reaches 64, i.e. rot_disc <= 3 (ops/ppf.py:28-31)
    if rot_disc < 4:
        raise ValueError(
            f"ppf_rot_discretization must be >= 4 (got {rot_disc}): the "
            f"packed angle radix of 64 would alias keys"
        )
    if tr_disc < 1:
        raise ValueError(f"ppf_tr_discretization must be >= 1 (got {tr_disc})")
    m = pos.shape[0]
    pos = np.asarray(pos, dtype=np.float32)
    normal = np.asarray(normal, dtype=np.float32)

    from . import native

    native_out = native.ppf_pair_keys(pos, normal, tr_disc, rot_disc)
    if native_out is not None:
        all_keys, max_distance = native_out
    else:
        all_keys = np.empty((m, m), dtype=np.int32)
        max_distance = 0.0
        for i0, bins, d in _features_chunked(pos, normal, tr_disc, rot_disc):
            all_keys[i0 : i0 + bins.shape[0]] = pack_exact_np(
                bins, tr_disc, rot_disc
            )
            if d.size:
                max_distance = max(max_distance, float(d.max()))

    ii, jj = np.meshgrid(
        np.arange(m, dtype=np.int32), np.arange(m, dtype=np.int32), indexing="ij"
    )
    flat_keys = all_keys.reshape(-1)
    flat_pairs = np.stack([ii.reshape(-1), jj.reshape(-1)], axis=1)
    keep = (ii.reshape(-1) != jj.reshape(-1)) & (flat_keys >= 0)
    flat_keys = flat_keys[keep]
    flat_pairs = flat_pairs[keep]

    order = np.argsort(flat_keys, kind="stable")
    flat_keys = flat_keys[order]
    flat_pairs = flat_pairs[order]

    uniq_keys, offsets, counts = np.unique(
        flat_keys, return_index=True, return_counts=True
    )

    bin_table_idx, bin_probes = _build_open_table(uniq_keys, oversize=16)
    tb = bin_table_idx.shape[0]
    bin_keys = np.full(tb, -1, dtype=np.int32)
    bin_offset = np.zeros(tb, dtype=np.int32)
    bin_count = np.zeros(tb, dtype=np.int32)
    occ = bin_table_idx >= 0
    bin_keys[occ] = uniq_keys[bin_table_idx[occ]]
    bin_offset[occ] = offsets[bin_table_idx[occ]].astype(np.int32)
    bin_count[occ] = counts[bin_table_idx[occ]].astype(np.int32)

    # existence set: fan each unique exact bin out by the 128 insertion
    # deltas, apply the insert-side rejection, dedupe
    fan_keys = fanout_keys(uniq_keys, tr_disc, rot_disc)
    fan_keys = np.unique(fan_keys[fan_keys >= 0])

    exist_table_idx, exist_probes = _build_open_table(fan_keys, oversize=8)
    te = exist_table_idx.shape[0]
    exist_keys = np.full(te, -1, dtype=np.int32)
    eocc = exist_table_idx >= 0
    exist_keys[eocc] = fan_keys[exist_table_idx[eocc]]

    bin_direct, exist_direct = _build_direct_np(
        uniq_keys, offsets, counts, fan_keys, rot_disc
    )

    table = PPFTable(
        exist_keys=jnp.asarray(exist_keys),
        bin_keys=jnp.asarray(bin_keys),
        bin_offset=jnp.asarray(bin_offset),
        bin_count=jnp.asarray(bin_count),
        pairs=jnp.asarray(flat_pairs.astype(np.int32)),
        tr_disc=int(tr_disc),
        rot_disc=int(rot_disc),
        exist_max_probes=int(exist_probes),
        bin_max_probes=int(bin_probes),
        bin_direct=None if bin_direct is None else jnp.asarray(bin_direct),
        exist_direct=(
            None if exist_direct is None else jnp.asarray(exist_direct)
        ),
    )
    return table, max_distance


def _direct_from_tables(
    bin_keys: np.ndarray,
    bin_offset: np.ndarray,
    bin_count: np.ndarray,
    exist_keys: np.ndarray,
    rot_disc: int,
    min_size: int = 0,
):
    """Rebuild the direct-mapped twins from the persisted open-addressing
    content (loaders + resize; the npz format carries only the probing
    tables, so old artifacts gain the direct path transparently)."""
    occ = bin_keys >= 0
    eocc = exist_keys >= 0
    return _build_direct_np(
        bin_keys[occ], bin_offset[occ], bin_count[occ],
        exist_keys[eocc], rot_disc, min_size=min_size,
    )


def resize_table(
    table: PPFTable, exist_size: int, bin_size: int, num_pairs: int,
    direct_size: int | None = 0,
) -> PPFTable:
    """Rebuild a table's open-addressing layouts at the given power-of-two
    sizes and pad the pair array, so several models share identical shapes
    (vmapped multi-object matching stacks them on a leading axis). The
    stored keys/CSR content is unchanged."""
    exist_keys = np.asarray(table.exist_keys)
    bin_keys = np.asarray(table.bin_keys)
    bin_offset = np.asarray(table.bin_offset)
    bin_count = np.asarray(table.bin_count)

    ek = np.sort(exist_keys[exist_keys >= 0])
    et_idx, e_probes = _build_open_table(ek, min_size=exist_size)
    new_exist = np.full(et_idx.shape[0], -1, np.int32)
    occ = et_idx >= 0
    new_exist[occ] = ek[et_idx[occ]]

    bocc = bin_keys >= 0
    order = np.argsort(bin_keys[bocc])
    bk = bin_keys[bocc][order]
    bo = bin_offset[bocc][order]
    bc = bin_count[bocc][order]
    bt_idx, b_probes = _build_open_table(bk, min_size=bin_size)
    nb_keys = np.full(bt_idx.shape[0], -1, np.int32)
    nb_off = np.zeros(bt_idx.shape[0], np.int32)
    nb_cnt = np.zeros(bt_idx.shape[0], np.int32)
    occ2 = bt_idx >= 0
    nb_keys[occ2] = bk[bt_idx[occ2]]
    nb_off[occ2] = bo[bt_idx[occ2]]
    nb_cnt[occ2] = bc[bt_idx[occ2]]

    pairs = np.asarray(table.pairs)
    if pairs.shape[0] < num_pairs:
        pairs = np.concatenate(
            [pairs, np.zeros((num_pairs - pairs.shape[0], 2), np.int32)]
        )

    if direct_size is None:
        # caller needs a direct-free table (multi-object stacking where
        # one model's key space exceeds DIRECT_CAP: every stacked table
        # must share a treedef)
        bin_direct, exist_direct = None, None
    else:
        bin_direct, exist_direct = _direct_from_tables(
            nb_keys, nb_off, nb_cnt, new_exist, table.rot_disc,
            min_size=direct_size,
        )
    return PPFTable(
        exist_keys=jnp.asarray(new_exist),
        bin_keys=jnp.asarray(nb_keys),
        bin_offset=jnp.asarray(nb_off),
        bin_count=jnp.asarray(nb_cnt),
        pairs=jnp.asarray(pairs),
        tr_disc=table.tr_disc,
        rot_disc=table.rot_disc,
        exist_max_probes=int(e_probes),
        bin_max_probes=int(b_probes),
        bin_direct=None if bin_direct is None else jnp.asarray(bin_direct),
        exist_direct=(
            None if exist_direct is None else jnp.asarray(exist_direct)
        ),
    )


# ---------------------------------------------------------------------------
# persistence (npz replaces the reference's Boost binary archive,
# src/rgbd.cpp:156-177)
# ---------------------------------------------------------------------------

def save_ppf_table(path: str, table: PPFTable, extra_meta: dict | None = None):
    meta = {
        "format_version": FORMAT_VERSION,
        "tr_disc": table.tr_disc,
        "rot_disc": table.rot_disc,
        "exist_max_probes": table.exist_max_probes,
        "bin_max_probes": table.bin_max_probes,
    }
    if extra_meta:
        meta.update(extra_meta)
    np.savez_compressed(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        exist_keys=np.asarray(table.exist_keys),
        bin_keys=np.asarray(table.bin_keys),
        bin_offset=np.asarray(table.bin_offset),
        bin_count=np.asarray(table.bin_count),
        pairs=np.asarray(table.pairs),
    )


def load_ppf_table(path: str) -> Tuple[PPFTable, dict]:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"unsupported ppf table version {meta.get('format_version')}"
            )
        bin_direct, exist_direct = _direct_from_tables(
            z["bin_keys"], z["bin_offset"], z["bin_count"],
            z["exist_keys"], int(meta["rot_disc"]),
        )
        table = PPFTable(
            exist_keys=jnp.asarray(z["exist_keys"]),
            bin_keys=jnp.asarray(z["bin_keys"]),
            bin_offset=jnp.asarray(z["bin_offset"]),
            bin_count=jnp.asarray(z["bin_count"]),
            pairs=jnp.asarray(z["pairs"]),
            tr_disc=int(meta["tr_disc"]),
            rot_disc=int(meta["rot_disc"]),
            exist_max_probes=int(meta["exist_max_probes"]),
            bin_max_probes=int(meta["bin_max_probes"]),
            bin_direct=(
                None if bin_direct is None else jnp.asarray(bin_direct)
            ),
            exist_direct=(
                None if exist_direct is None else jnp.asarray(exist_direct)
            ),
        )
    return table, meta


# ---------------------------------------------------------------------------
# device-side probing
# ---------------------------------------------------------------------------

def probe_slots(table_keys: jax.Array, keys: jax.Array, max_probes: int):
    """Vectorized bounded linear probing. keys int32 [...]; returns the slot
    index per key, or -1 on miss (keys of -1 always miss)."""
    size = table_keys.shape[0]
    mask = jnp.uint32(size - 1)
    h0 = _mix32_jnp(keys) & mask
    init_slot = jnp.full(keys.shape, -1, dtype=jnp.int32)
    init_done = keys < 0

    # while_loop with a global all-done test: the mean probe count is ~1.3
    # at load 0.25, so nearly every batch stops after 2-3 sweeps instead of
    # paying the worst-case bound every time
    def cond(state):
        i, _slot, done = state
        return (i < max_probes) & ~jnp.all(done)

    def body(state):
        i, slot, done = state
        h = ((h0 + jnp.uint32(i)) & mask).astype(jnp.int32)
        k = table_keys[h]
        found = (k == keys) & ~done
        slot = jnp.where(found, h, slot)
        done = done | found | (k == -1)
        return i + 1, slot, done

    _, slot, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), init_slot, init_done)
    )
    return slot


def ppf_exists(table: PPFTable, keys: jax.Array) -> jax.Array:
    """[B, N]-shaped existence check: the hot lookup of base sampling
    (reference does one std::map::find per scene point per round,
    src/stocs.cpp:403-405). With the direct-mapped bitmap this is one
    word gather + bit test instead of a bounded probe loop."""
    if table.exist_direct is not None:
        nbits = table.exist_direct.shape[0] * 32
        didx = dense_index_jnp(keys, table.rot_disc, nbits)
        word = table.exist_direct[jnp.maximum(didx >> 5, 0)]
        bit = (word >> (didx & 31).astype(jnp.uint32)) & jnp.uint32(1)
        return (didx >= 0) & (bit == jnp.uint32(1))
    return probe_slots(table.exist_keys, keys, table.exist_max_probes) >= 0


def lookup_pair_range(table: PPFTable, query_bins: jax.Array):
    """Offsets/counts of all exact bins matching one query bin [4] via the
    128-way inverse fan-out. Returns (offset [128], count [128]) with count=0
    for misses. The concatenation of those CSR ranges reproduces the
    reference's P_pairs/Q_pairs lists (src/stocs.cpp:780-786) exactly
    (each pair is stored once, ranges are disjoint)."""
    deltas = jnp.asarray(fanout_deltas(table.tr_disc, table.rot_disc))
    scale = jnp.asarray(
        [table.tr_disc, table.rot_disc, table.rot_disc, table.rot_disc],
        dtype=jnp.int32,
    )
    src_bins = query_bins[None, :] - deltas * scale  # [128, 4]

    q1 = src_bins[:, 0] // table.tr_disc
    qr = src_bins[:, 1:] // table.rot_disc
    key = ((q1 * _ANGLE_RADIX + qr[:, 0]) * _ANGLE_RADIX + qr[:, 1]) * _ANGLE_RADIX + qr[:, 2]
    src_ok = (src_bins >= 0).all(axis=1) & (qr < _ANGLE_RADIX).all(axis=1)

    # query-side gate: bins the reference never inserted (q1 <= 5mm or any
    # negative component) have no entries
    gate = (query_bins[0] > MIN_DISTANCE_BIN_MM) & (query_bins >= 0).all()
    keys = jnp.where(src_ok & gate, key, -1).astype(jnp.int32)

    if table.bin_direct is not None:
        # direct path: ONE [128, 2] row gather — the probing loop below
        # cost 56.6 ms of a 2048-base fixture chunk's congruent phase
        # (scripts/probe_onebase_decomp.py stage A)
        didx = dense_index_jnp(keys, table.rot_disc,
                               table.bin_direct.shape[0])
        row = table.bin_direct[jnp.maximum(didx, 0)]
        hit = didx >= 0
        return jnp.where(hit, row[:, 0], 0), jnp.where(hit, row[:, 1], 0)

    slots = probe_slots(table.bin_keys, keys, table.bin_max_probes)
    hit = slots >= 0
    offset = jnp.where(hit, table.bin_offset[jnp.maximum(slots, 0)], 0)
    count = jnp.where(hit, table.bin_count[jnp.maximum(slots, 0)], 0)
    return offset, count


def gather_pair_srcs(
    table: PPFTable, offset: jax.Array, count: jax.Array, cap: int
):
    """Flatten the <=128 CSR ranges into padded [cap] source positions
    into table.pairs + validity mask — no pair gather, so callers that
    read per-pair features from a precomputed table (ModelPack.pair_ep)
    fetch pair indices only for their selected winners. Overflow beyond
    `cap` is truncated (the reference would keep all pairs; truncation is
    logged upstream)."""
    total_before = jnp.cumsum(count) - count  # start position of each range
    total = jnp.sum(count)

    # For each output slot s in [0, cap): find which range it falls into —
    # searchsorted(ends, s, side="right") computed as a [cap, 128]
    # broadcast compare + row sum. The closed form vectorizes on the VPU;
    # jnp.searchsorted lowers to a binary-search gather chain whose cost
    # scales with cap (measured ~0.9 ms/base at cap 8192 on v5e — it was
    # the dominant dense-tier cost, scripts/probe_onebase_decomp.py).
    s = jnp.arange(cap, dtype=jnp.int32)
    # range r covers [total_before[r], total_before[r] + count[r])
    ends = total_before + count
    r_idx = jnp.sum(
        (ends[None, :] <= s[:, None]).astype(jnp.int32), axis=1
    )
    r_idx = jnp.minimum(r_idx, count.shape[0] - 1)
    within = s - total_before[r_idx]
    valid = s < total
    src = offset[r_idx] + within
    src = jnp.clip(src, 0, table.pairs.shape[0] - 1)
    return src, valid, total


def gather_pairs(table: PPFTable, offset: jax.Array, count: jax.Array, cap: int):
    """gather_pair_srcs + the [cap, 2] pair-index gather."""
    src, valid, total = gather_pair_srcs(table, offset, count, cap)
    return table.pairs[src], valid, total


def gather_pair_block_srcs(
    table: PPFTable, offset: jax.Array, count: jax.Array, cap: int,
    block: int = 4, slack: int = 128,
):
    """Block-granular variant of gather_pair_srcs: flatten the <=128 CSR
    ranges into `block`-pair-aligned block positions, so a caller reading
    per-pair rows from an aligned table (ModelPack.pair_ep viewed as
    [P/block, block*6]) issues ONE row gather per `block` pairs instead of
    one per pair. XLA row gathers issue at a fixed rows/s rate regardless
    of row width (docs/RESULTS.md, round-2 gather profile), so this cuts
    the dense congruent tiers' dominant gather traffic ~block-fold.

    Returns (bsrc [capb] block indices, lane_ok [capb, block], total
    pairs) with capb = cap // block + slack. Each range covers blocks
    [offset//block, ceil((offset+count)/block)); a block shared by two
    adjacent ranges appears once per range with disjoint lane masks, so
    every pair in range is produced exactly once. slack must be >= the
    number of ranges (one boundary block each); callers may raise it for
    tile-divisibility. On overflow (> cap total pairs) truncation happens
    at block granularity, keeping slightly MORE than `cap` pairs —
    callers treat cap as a tier floor, and the top tier warns upstream."""
    capb = cap // block + slack
    bstart = offset // block
    bcnt = jnp.where(
        count > 0, (offset + count + block - 1) // block - bstart, 0
    )
    cumb = jnp.cumsum(bcnt) - bcnt
    ends = cumb + bcnt
    t = jnp.arange(capb, dtype=jnp.int32)
    r_idx = jnp.sum((ends[None, :] <= t[:, None]).astype(jnp.int32), axis=1)
    r_idx = jnp.minimum(r_idx, count.shape[0] - 1)
    g = bstart[r_idx] + (t - cumb[r_idx])
    bvalid = t < jnp.sum(bcnt)
    pair_lo = offset[r_idx]
    pair_hi = offset[r_idx] + count[r_idx]
    lanes = g[:, None] * block + jnp.arange(block, dtype=jnp.int32)[None, :]
    lane_ok = (
        bvalid[:, None]
        & (lanes >= pair_lo[:, None])
        & (lanes < pair_hi[:, None])
    )
    max_block = (table.pairs.shape[0] + block - 1) // block
    bsrc = jnp.clip(g, 0, max_block - 1)
    return bsrc, lane_ok, jnp.sum(count)
