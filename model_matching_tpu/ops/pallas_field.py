"""Pallas TPU kernel for dense-field LCP scoring.

The XLA field scorer (scoring.score_transforms_field) spends its time in one
big random gather from the [G, 8] field in HBM (~30 bytes/query at a few
GB/s effective). This kernel exploits the structure XLA cannot see: all M
queries of one hypothesis lie inside a model-diameter box. Per grid step it

  1. DMAs the hypothesis' [C, C, C, 8] field subvolume HBM -> VMEM once
     (contiguous strided copy at full bandwidth, ~C^3*32 bytes),
  2. transforms the model points (VPU),
  3. gathers the M candidate rows from the VMEM-resident box,
  4. applies the exact distance/normal/probability gates and reduces.

The box edge C = ceil(model_diameter / cell) + 3 is static per model. When
the box would not fit VMEM the caller falls back to the XLA path.

STATUS: correct (bit-identical to the XLA scorer) under interpret mode and
covered by tests/test_pallas_field.py, but NOT the production path. Probed
twice on real v5e hardware:

* round 1: any take/take_along_axis in-kernel crashed remote_compile
  (HTTP 500) before reaching a diagnostic.
* round 2: the toolchain now has a tpu.dynamic_gather lowering, but it
  requires same-shape input/indices ("Shape mismatch in input, indices and
  output") and, with that satisfied via broadcast-index take_along_axis,
  refuses multi-vreg tables ("Not implemented: Multiple source vregs along
  gather dimension") — a VMEM gather may only span ONE 8x128 vreg, far
  below the [C^3, 8] box this kernel needs.
* one-hot-matmul fallback (cand = onehot(flat) @ box_rows) was priced out:
  with 8 output lanes the MXU runs at 8/128 efficiency, ~30-60 us/hyp for
  C^3 ~ 43k — 10x slower than the XLA ladder; the [C^3/128, 1024]
  lane-packed relayout that fixes efficiency lands at ~2-4 us/hyp, i.e.
  parity with the ladder, not a win.
* measured gather ceiling (artifacts/prof_gather.py, v5e): XLA HBM row
  gathers issue at ~64 M rows/s regardless of row size (32-byte f32 rows
  and 4-byte scalars gather at the same rate; bf16/16-byte rows are
  SLOWER). The dense-field layout already sits at this issue-rate
  speed-of-light, which is why the ladder beats the north star without
  this kernel.

The XLA three-stage ladder in scoring.py remains the production scorer;
this kernel is the ready design for a future toolchain with general VMEM
gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEG2RAD = jnp.pi / 180.0


def _kernel(
    # scalar-prefetch (SMEM)
    params_ref,        # [8] f32: origin xyz, cell, eps2, cos_gate, mcount, pad
    # inputs
    transforms_ref,    # [HT, 4, 4] VMEM (block over hypotheses)
    model_pos_ref,     # [M, 3] VMEM
    model_nrm_ref,     # [M, 3] VMEM
    model_w_ref,       # [M] f32 VMEM (validity as 0/1)
    prob_ref,          # [S] f32 VMEM (scene class probabilities)
    field_ref,         # [Gx, Gy, Gz, 8] ANY/HBM
    dims_ref,          # [4] i32 SMEM: Gx Gy Gz pad
    # output
    out_ref,           # [HT] f32 VMEM
    # scratch
    box_ref,           # [C, C, C, 8] VMEM
    sem,               # DMA semaphore
    *, box_c: int, ht: int,
):
    ox = params_ref[0]
    oy = params_ref[1]
    oz = params_ref[2]
    cell = params_ref[3]
    eps2 = params_ref[4]
    cos_gate = params_ref[5]
    mcount = params_ref[6]

    gx = dims_ref[0]
    gy = dims_ref[1]
    gz = dims_ref[2]

    c = box_c

    def one_hyp(hi, _):
        t = transforms_ref[hi]               # [4, 4]
        rot = t[:3, :3]
        tr = t[:3, 3]

        # box anchored at the transformed model centroid (model is centered,
        # so the centroid maps to tr)
        def anchor(tcoord, o, g):
            lo = jnp.floor((tcoord - o) / cell).astype(jnp.int32) - c // 2
            return jnp.clip(lo, 0, jnp.maximum(g - c, 0))

        x0 = anchor(tr[0], ox, gx)
        y0 = anchor(tr[1], oy, gy)
        z0 = anchor(tr[2], oz, gz)

        copy = pltpu.make_async_copy(
            field_ref.at[pl.ds(x0, c), pl.ds(y0, c), pl.ds(z0, c), :],
            box_ref, sem,
        )
        copy.start()

        q = jnp.dot(model_pos_ref[:], rot.T, preferred_element_type=jnp.float32)
        q = q + tr[None, :]
        nq = jnp.dot(model_nrm_ref[:], rot.T, preferred_element_type=jnp.float32)

        ix = jnp.floor((q[:, 0] - ox) / cell).astype(jnp.int32) - x0
        iy = jnp.floor((q[:, 1] - oy) / cell).astype(jnp.int32) - y0
        iz = jnp.floor((q[:, 2] - oz) / cell).astype(jnp.int32) - z0
        inbox = (
            (ix >= 0) & (ix < c) & (iy >= 0) & (iy < c) & (iz >= 0) & (iz < c)
        )
        flat = (ix * c + iy) * c + iz
        flat = jnp.where(inbox, flat, 0)

        copy.wait()
        rows = box_ref[:].reshape(c * c * c, 8)
        cand = jnp.take(rows, flat, axis=0)   # [M, 8] VMEM gather

        d2 = (
            (q[:, 0] - cand[:, 0]) ** 2
            + (q[:, 1] - cand[:, 1]) ** 2
            + (q[:, 2] - cand[:, 2]) ** 2
        )
        cos = (
            nq[:, 0] * cand[:, 3] + nq[:, 1] * cand[:, 4] + nq[:, 2] * cand[:, 5]
        )
        idx = cand[:, 6].astype(jnp.int32)
        occupied = cand[:, 7] > 0.0
        w = jnp.take(prob_ref[:], jnp.maximum(idx, 0), axis=0)
        match = (
            inbox & occupied & (d2 <= eps2) & (cos > cos_gate)
        ) & (model_w_ref[:] > 0)
        out_ref[hi] = jnp.sum(jnp.where(match, w, 0.0)) / mcount
        return 0

    jax.lax.fori_loop(0, ht, one_hyp, 0)


def score_field_pallas(
    transforms,     # [H, 4, 4]
    valid,          # [H]
    model_pos,      # [M, 3] centered
    model_normal,   # [M, 3]
    model_valid,    # [M]
    field_rows,     # [G, 8] (flattened) or [Gx, Gy, Gz, 8]
    origin,         # [3]
    grid_dims,      # static (Gx, Gy, Gz) python ints
    cell,           # scalar
    scene_prob,     # [S]
    distance_threshold: float,
    normal_angle_threshold_deg: float,
    box_cells: int,
    hyp_tile: int = 32,
    interpret: bool = False,
):
    h = transforms.shape[0]
    gx, gy, gz = (int(d) for d in grid_dims)
    field4 = field_rows.reshape(gx, gy, gz, 8)
    c = min(box_cells, gx, gy, gz)

    pad = (-h) % hyp_tile
    tpad = jnp.pad(transforms, ((0, pad), (0, 0), (0, 0)))
    n_tiles = tpad.shape[0] // hyp_tile

    cos_gate = jnp.cos(normal_angle_threshold_deg * _DEG2RAD)
    mcount = jnp.maximum(jnp.sum(model_valid.astype(jnp.float32)), 1.0)
    params = jnp.stack(
        [origin[0], origin[1], origin[2],
         jnp.float32(cell),
         jnp.float32(distance_threshold) ** 2,
         cos_gate.astype(jnp.float32), mcount, jnp.float32(0)]
    )
    dims4 = jnp.asarray([gx, gy, gz, 0], dtype=jnp.int32)

    kernel = functools.partial(_kernel, box_c=c, ht=hyp_tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (hyp_tile, 4, 4), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (hyp_tile,), lambda i, *_: (i,), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((c, c, c, 8), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tpad.shape[0],), jnp.float32),
        interpret=interpret,
    )(
        params, tpad,
        model_pos.astype(jnp.float32),
        model_normal.astype(jnp.float32),
        model_valid.astype(jnp.float32),
        scene_prob.astype(jnp.float32),
        field4, dims4,
    )[:h]
    return jnp.where(valid, out, -1.0)
