"""Preprocessed-model loading: the search cloud + its PPF table.

Replaces the reference's load_object_info (reference: src/stocs.cpp:86-97:
PLY read + preloaded Boost map). The artifact pair is model_search.ply +
ppf_table.npz, produced by preprocess.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .io import ply
from .ppf_table import PPFTable, load_ppf_table, resize_table

# Shape floors for the device tables: every model whose tables fit inside
# them gets IDENTICAL array shapes and probe bounds, so jitted phases
# compiled for one object are reused verbatim for the next (different
# objects/datasets otherwise force recompiles through differing shapes).
_EXIST_FLOOR = 1 << 20
_BIN_FLOOR = 1 << 19
_PAIRS_FLOOR = 1 << 20
# direct-mapped table floor: 2M dense keys (16 MB + 256 KB bitmap) covers
# every bundled fixture; models needing more simply standardize at their
# own (power-of-two) size and compile once
_DIRECT_FLOOR = 1 << 21


def _bucket_probes(p: int) -> int:
    return max(16, -(-p // 8) * 8)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ModelPack:
    pos: jax.Array       # [M, 3] centered, padded
    normal: jax.Array    # [M, 3]
    rgb: jax.Array       # [M, 3]
    valid: jax.Array     # [M]
    centroid: jax.Array  # [3]
    table: PPFTable
    # optional [total_pairs, 6] f32 (endpoint-a xyz, endpoint-b xyz) in the
    # CENTERED frame, precomputed once per model so the congruent gate's
    # feature stage gathers one 24-byte row per pair instead of the pair
    # indices plus two position rows, and the rigid fit reads both model
    # points of a winner pair from one row (build_pair_ep). None falls
    # back to the index-gather path in the gate; fit-side callers build
    # it on the fly (estimator._pair_ep_of).
    pair_ep: jax.Array | None = None

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def build_pair_ep(centered_pos, pairs) -> jax.Array:
    """[total_pairs (padded to 4), 6] f32 rows (a.xyz, b.xyz) from centered
    model positions — the raw pair endpoints. The congruent gate derives
    its interpolants from these (d = b - a in seg_from_rows, bit-identical
    to the previously-baked difference), and the rigid fit reads its two
    model points per pair straight from the row — 2 row gathers per
    hypothesis instead of a winner-quad decode plus 4 position gathers.
    Rows are padded to a multiple of 4 so the dense tiers can view the
    table as [P/4, 24] and gather one row per FOUR pairs
    (gather_pair_block_srcs)."""
    a = centered_pos[pairs[:, 0]]
    b = centered_pos[pairs[:, 1]]
    ep = jnp.concatenate([a, b], axis=1)
    pad = (-ep.shape[0]) % 4
    if pad:
        ep = jnp.pad(ep, ((0, pad), (0, 0)))
    return ep


def load_model_pack(model_ply_path: str, table_path: str, capacity: int,
                    standardize: bool = False) -> ModelPack:
    """standardize=True pads the tables to common shape floors and buckets
    the probe bounds, so jitted phases compiled for one object are reused
    verbatim for others (serve/batch/multi paths). Costs some gather
    bandwidth — single-object runs keep exact-size tables by default."""
    pos, normal, rgb = ply.read_ply_cloud(model_ply_path, scale=1.0)
    if normal is None:
        raise ValueError(f"{model_ply_path} has no normals; run model-preprocess")
    n = pos.shape[0]
    if n > capacity:
        raise ValueError(
            f"model has {n} points > capacity {capacity}; raise max_model_points"
        )
    table, _meta = load_ppf_table(table_path)
    if standardize:
        pairs_size = max(_PAIRS_FLOOR, 1 << int(np.ceil(np.log2(
            max(table.pairs.shape[0], 2)
        ))))
        if (
            table.exist_keys.shape[0] < _EXIST_FLOOR
            or table.bin_keys.shape[0] < _BIN_FLOOR
            or table.pairs.shape[0] != pairs_size
            or (
                table.bin_direct is not None
                and table.bin_direct.shape[0] < _DIRECT_FLOOR
            )
        ):
            table = resize_table(
                table,
                max(_EXIST_FLOOR, table.exist_keys.shape[0]),
                max(_BIN_FLOOR, table.bin_keys.shape[0]),
                pairs_size,
                direct_size=_DIRECT_FLOOR,
            )
        import dataclasses as _dc

        table = _dc.replace(
            table,
            exist_max_probes=_bucket_probes(table.exist_max_probes),
            bin_max_probes=_bucket_probes(table.bin_max_probes),
        )

    centroid = pos.mean(axis=0)
    pos = pos - centroid

    # pad only to the next lane multiple — every scoring stage walks the
    # whole padded array, so slack here is a direct multiplier on the
    # hottest loops (capacity is just an upper-bound check). standardize
    # buckets to a 512-floor power of two instead: model size then rarely
    # differs across objects, so the jitted phases are reused verbatim
    # (the padding slack is the price of zero recompiles in serve/batch)
    if standardize:
        padded = min(capacity, max(512, 1 << int(np.ceil(np.log2(max(n, 2))))))
    else:
        padded = min(capacity, max(128, -(-n // 128) * 128))

    def pad(a, fill=0.0):
        out = np.full((padded, a.shape[1]), fill, dtype=np.float32)
        out[:n] = a
        return jnp.asarray(out)

    valid = np.zeros(padded, bool)
    valid[:n] = True
    pos_padded = pad(pos)
    return ModelPack(
        pos=pos_padded,
        normal=pad(normal),
        rgb=pad(rgb if rgb is not None else np.full((n, 3), -1.0, np.float32)),
        valid=jnp.asarray(valid),
        centroid=jnp.asarray(centroid.astype(np.float32)),
        table=table,
        # built from the PADDED positions so standardized models share the
        # build program's shapes (zero recompiles across serve requests);
        # pairs only reference real points, so values are unaffected
        pair_ep=build_pair_ep(pos_padded, table.pairs),
    )
