"""Dense nearest-neighbor field: the speed-of-light scoring layout for TPU.

The exact grid-hash NN (ops/gridhash.py) costs ~100 scattered HBM gathers
per query (bounded probe + fixed-cap candidate scan). For scoring millions
of hypotheses that is the whole runtime. This module trades a little
precision in *candidate selection* for a layout where one query costs ONE
aligned 32-byte row gather:

  For every cell of a dense eps-grid over the scene bbox, precompute the
  scene point nearest to the cell center within eps * (1 + sqrt(3)/2) — the
  radius that covers every possible query position inside the cell. A query
  then gathers its cell's row (point position, normal, index) and applies
  the EXACT distance and normal gates against that stored candidate.

Differences from the exact kd-tree semantics (reference: kdtree.h:394-459):
the candidate is chosen per-cell rather than per-query, so when several
scene points sit within eps of a query the field may test a different one
than the true NN; scores shift by well under the argmax margin. The
production scorer uses this field to rank all hypotheses and re-scores the
leaders with the exact grid (scoring.score_hybrid), so final LCP values
keep reference semantics.

Built once per scene on the host; scored on device.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_SLACK = 1.0 + np.sqrt(3.0) / 2.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DenseField:
    rows: jax.Array    # [G, 8] f32: px py pz nx ny nz idx occupancy/prob
    origin: jax.Array  # [3]
    dims: jax.Array    # [3] i32
    cell: jax.Array    # [] f32 (= eps)
    # slot 7 semantics: without baked probs it is the occupancy flag
    # (1 occupied / 0 empty); with them it holds the candidate's class
    # probability (>= 0) and -1 marks empty cells — scorers that receive
    # scene_class_prob=None read the weight straight from the row instead
    # of a second [H, M] prob gather (half of stage 1's gather traffic).
    # Only valid for the UNDECAYED prob vector the field was built with;
    # the instance path's decayed copies must keep gathering.
    has_probs: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )


def build_dense_field(
    pos: np.ndarray, normal: np.ndarray, eps: float,
    prob: np.ndarray | None = None,
) -> DenseField:
    pos = np.asarray(pos, np.float32)
    normal = np.asarray(normal, np.float32)
    n = pos.shape[0]
    lo = pos.min(0) - 2 * eps
    hi = pos.max(0) + 2 * eps
    dims = np.maximum(np.ceil((hi - lo) / eps).astype(np.int64) + 1, 1)
    g = int(dims.prod())

    # candidate (cell, point) pairs: each point covers cells whose center is
    # within SLACK * eps
    reach = int(np.ceil(_SLACK))  # 2 cells
    offs = np.array(
        [
            (dx, dy, dz)
            for dx in range(-reach, reach + 1)
            for dy in range(-reach, reach + 1)
            for dz in range(-reach, reach + 1)
        ],
        np.int64,
    )
    pc = np.floor((pos - lo) / eps).astype(np.int64)  # [N, 3]
    cells = pc[:, None, :] + offs[None, :, :]         # [N, O, 3]
    centers = (cells.astype(np.float32) + 0.5) * eps + lo
    d = np.linalg.norm(centers - pos[:, None, :], axis=-1)  # [N, O]
    ok = (
        (d <= _SLACK * eps)
        & (cells >= 0).all(-1)
        & (cells < dims).all(-1)
    )
    flat = (cells[..., 0] * dims[1] + cells[..., 1]) * dims[2] + cells[..., 2]

    flat = flat[ok]
    dist = d[ok]
    pidx = np.broadcast_to(np.arange(n, dtype=np.int64)[:, None], ok.shape)[ok]

    # per cell: candidate with min distance to center
    order = np.lexsort((dist, flat))
    flat_s = flat[order]
    first = np.concatenate([[True], flat_s[1:] != flat_s[:-1]])
    win_cell = flat_s[first]
    win_point = pidx[order][first]

    rows = np.zeros((g, 8), np.float32)
    rows[win_cell, 0:3] = pos[win_point]
    rows[win_cell, 3:6] = normal[win_point]
    rows[win_cell, 6] = win_point.astype(np.float32)
    if prob is None:
        rows[win_cell, 7] = 1.0
    else:
        rows[:, 7] = -1.0
        rows[win_cell, 7] = np.asarray(prob, np.float32)[win_point]

    return DenseField(
        rows=jnp.asarray(rows),
        origin=jnp.asarray(lo),
        dims=jnp.asarray(dims.astype(np.int32)),
        cell=jnp.asarray(np.float32(eps)),
        has_probs=prob is not None,
    )


def field_lookup(field: DenseField, points: jax.Array):
    """[..., 3] query positions -> (cand_pos [..., 3], cand_normal [..., 3],
    cand_idx [...] i32, occupied [...] bool, slot7 [...] f32 — the
    occupancy flag, or the baked class probability when field.has_probs)."""
    ijk = jnp.floor((points - field.origin) / field.cell).astype(jnp.int32)
    inb = ((ijk >= 0) & (ijk < field.dims)).all(axis=-1)
    flat = (ijk[..., 0] * field.dims[1] + ijk[..., 1]) * field.dims[2] + ijk[..., 2]
    flat = jnp.clip(flat, 0, field.rows.shape[0] - 1)
    row = field.rows[flat]
    s7 = row[..., 7]
    occupied = inb & (s7 >= 0 if field.has_probs else s7 > 0)
    return row[..., 0:3], row[..., 3:6], row[..., 6].astype(jnp.int32), occupied, s7
