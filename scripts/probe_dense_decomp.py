"""Decompose the congruent DENSE-tier per-base cost (cap 8192, blocked
gathers + Pallas gate), mirroring congruent.one_base's production path.

The fixture chunk's ~130 dense bases carry ~2/3 of the congruent phase;
this probe isolates where their per-base time goes, cumulative stages
over the REAL dense bases (loads > 2048), sequential lax.map like the
production Q-blocked tiers:

  A  block flatten (gather_pair_block_srcs, 2 sides)
  B  A + endpoint-row gathers (ep4[bsrc]) + lane src indices
  C  B + seg_from_rows + cell pack + feature build
  D  C + dense_gate Pallas kernel (dynamic grid)
  E  D + top_k + winner pair gathers  (= full one_base at the tier)

Usage (TPU): python scripts/probe_dense_decomp.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_battery import _fixture, _pipeline_poses, _time

CAP = 8192
QB = 4096
SUB = 16


def main():
    import jax
    import jax.numpy as jnp
    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from model_matching_tpu.congruent import (
        _topk_segmented, _unit_cube_params, d2_test_implied,
    )
    from model_matching_tpu.ops import pallas_congruent as pc
    from model_matching_tpu.ops.ppf import ppf_bins
    from model_matching_tpu.ppf_table import (
        _mix32_jnp, gather_pair_block_srcs, lookup_pair_range,
    )

    model, scene, cfg = _fixture()
    est, bases, sets, _poses = _pipeline_poses(model, scene, cfg)
    table = model.table
    pair_ep = model.pair_ep
    mpos = model.pos - model.centroid
    spos = scene.pos - scene.centroid
    snrm = scene.normal
    center, ratio = _unit_cube_params(mpos)
    eps_n = cfg.distance_threshold / ratio
    eg_size = jnp.exp2(jnp.trunc(-jnp.log2(eps_n)))
    tr, rot = cfg.ppf_tr_discretization, cfg.ppf_rot_discretization
    skip_dist = d2_test_implied(mpos, cfg)

    loads = np.maximum(
        np.asarray(sets.pair_counts[:, 0]),
        np.asarray(sets.pair_counts[:, 1]),
    )
    dense = np.where((loads > 2048) & (loads <= CAP))[0]
    nd = len(dense)
    print(f"dense bases (2048 < load <= {CAP}): {nd}", flush=True)
    sel = jnp.asarray(dense)
    keys = jax.random.split(jax.random.PRNGKey(7), len(loads))[sel]
    bidx = bases.indices[sel]
    inv1 = bases.invariant1[sel]
    inv2 = bases.invariant2[sel]
    bval = bases.valid[sel]

    dist_thresh = (
        cfg.distance_threshold
        if cfg.congruent_sqdist_quirk
        else cfg.distance_threshold ** 2
    )
    slack = 128
    lanes = CAP + 4 * slack
    ep4 = pair_ep.reshape(-1, 24)
    npairs = table.pairs.shape[0]
    lane4 = jnp.arange(4, dtype=jnp.int32)[None, :]

    def stage(upto):
        def one(args):
            bkey, bx, i1, i2, bv = args
            b, bn = spos[bx], snrm[bx]
            off1, cnt1 = lookup_pair_range(
                table, ppf_bins(b[0], bn[0], b[1], bn[1], tr, rot))
            off2, cnt2 = lookup_pair_range(
                table, ppf_bins(b[2], bn[2], b[3], bn[3], tr, rot))

            def side_a(off, cnt):
                bsrc, lok, _t = gather_pair_block_srcs(
                    table, off, cnt, CAP, 4, slack)
                bcnt = jnp.where(cnt > 0, (off + cnt + 3) // 4 - off // 4, 0)
                nl = jnp.minimum(jnp.sum(bcnt), bsrc.shape[0]) * 4
                return bsrc, lok, nl

            if upto == "L":  # lookups only: isolates lax.map dispatch
                return off1 + cnt1 + off2 + cnt2

            p_bsrc, p_lok, p_lanes = side_a(off1, cnt1)
            q_bsrc, q_lok, q_lanes = side_a(off2, cnt2)
            if upto == "A":
                return p_bsrc.sum() + q_bsrc.sum()

            def side_b(bsrc, lok):
                rows = ep4[bsrc].reshape(lanes, 6)
                src = jnp.clip(
                    (bsrc[:, None] * 4 + lane4).reshape(lanes),
                    0, npairs - 1)
                return rows, lok.reshape(lanes), src

            p_rows, p_ok, p_srcl = side_b(p_bsrc, p_lok)
            q_rows, q_ok, q_srcl = side_b(q_bsrc, q_lok)
            if upto == "B":
                return p_rows.sum() + q_rows.sum()

            d01 = b[1] - b[0]
            d23 = b[3] - b[2]
            alpha = jnp.sum(
                d01 / jnp.maximum(jnp.linalg.norm(d01), 1e-30)
                * (d23 / jnp.maximum(jnp.linalg.norm(d23), 1e-30)))

            def seg(rows, inv):
                aw, d = rows[:, 0:3], rows[:, 3:6]
                e_world = aw + inv * d
                e_unit = (e_world - center) / ratio + 0.5
                dirs = d / jnp.maximum(
                    jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-30)
                return e_unit, e_world, dirs

            e1u, e1w, n1 = seg(p_rows, i1)
            e2u, e2w, n2 = seg(q_rows, i2)
            pack = lambda c: (c[:, 0] * 1024 + c[:, 1]) * 1024 + c[:, 2]
            c1p = pack(jnp.floor(e1u * eg_size).astype(jnp.int32))
            c2p = pack(jnp.floor(e2u * eg_size).astype(jnp.int32))
            sq1 = jnp.sum(e1w * e1w, axis=-1)
            sq2 = jnp.sum(e2w * e2w, axis=-1)

            salt = jax.random.bits(bkey, dtype=jnp.uint32)
            rp = _mix32_jnp(jnp.arange(lanes, dtype=jnp.uint32) ^ salt)
            col_bits = max(14, (lanes - 1).bit_length())
            marker = jnp.uint32(1 << col_bits)
            rand_mask = jnp.uint32(0x7FFFFFFF & ~((1 << (col_bits + 1)) - 1))

            def feat(e, n, sq, cell, ok, tag):
                lo = jnp.where(ok, cell & 0xFFFF, tag)
                hi = jnp.where(ok, (cell >> 16) & 0xFFFF, tag)
                return jnp.concatenate([
                    e.T, n.T, sq[None],
                    lo.astype(jnp.float32)[None],
                    hi.astype(jnp.float32)[None],
                    jnp.zeros((7, e.shape[0]), jnp.float32),
                ], axis=0)

            pf = feat(e1w, n1, sq1, c1p, p_ok, -1)
            qf = feat(e2w, n2, sq2, c2p, q_ok, -2)
            if upto == "C":
                return pf.sum() + qf.sum()
            if upto == "C2":
                # force the [16, lanes] features to MATERIALIZE (the
                # transposes are free at stage C where fusion sums them)
                pf2, qf2 = jax.lax.optimization_barrier((pf, qf))
                return pf2.sum() + qf2.sum()

            rq_all = _mix32_jnp(
                jnp.arange(lanes, dtype=jnp.uint32) ^ salt
                ^ jnp.uint32(0x9E3779B9))
            bits = jax.lax.bitcast_convert_type
            counts = dict(p_count=p_lanes, q_count=q_lanes)
            if upto == "D2":  # static full grid: dynamic-dim overhead?
                counts = {}
            rb, row_counts = pc.dense_gate(
                pf, qf, bits(rp, jnp.int32), bits(rq_all, jnp.int32),
                alpha, cfg.congruent_cos_tolerance,
                jnp.float32(dist_thresh),
                jnp.int32(rand_mask), jnp.int32(marker),
                q_tile=lanes // 2 if lanes % 4096 else 4096,
                p_tile=256,
                interpret=jax.default_backend() != "tpu",
                skip_dist=skip_dist,
                **counts,
            )
            row_best = jnp.where(bv, rb.astype(jnp.uint32), jnp.uint32(0))
            total = jnp.where(bv, jnp.sum(row_counts), jnp.int32(0))
            if upto in ("D", "D2"):
                return row_best.astype(jnp.int32).sum() + total

            top, slot = _topk_segmented(
                row_best.reshape(-1).astype(jnp.int32),
                cfg.maximum_congruent_sets)
            pi = slot // SUB
            qi = top & ((1 << col_bits) - 1)
            quads = jnp.concatenate(
                [table.pairs[p_srcl[pi]], table.pairs[q_srcl[qi]]],
                axis=-1)
            return quads.sum() + (top > 0).sum() + total

        def run(kk, bb, i1, i2, bv):
            return jax.lax.map(one, (kk, bb, i1, i2, bv))

        if BW > 1:
            def run(kk, bb, i1, i2, bv):
                n = kk.shape[0] // BW * BW
                args = jax.tree.map(
                    lambda a: a[:n].reshape((n // BW, BW) + a.shape[1:]),
                    (kk, bb, i1, i2, bv))
                return jax.lax.map(jax.vmap(one), args)

        return run

    global BW
    for upto in ("L", "A", "C2", "D", "D2", "E"):
        for BW in (1, 4, 8, 16):
            run = stage(upto)
            f = jax.jit(run)
            try:
                dt = _time(f, keys, bidx, inv1, inv2, bval)
            except Exception as e:  # e.g. vmap over a dynamic-grid kernel
                msg = str(e).splitlines()[0][:90]
                print(f"  stage {upto} bw={BW:2d}: FAILED ({msg})",
                      flush=True)
                continue
            print(f"  stage {upto} bw={BW:2d}: {dt*1e3:7.1f} ms total "
                  f"({dt/max(nd,1)*1e6:7.1f} us/base)", flush=True)


if __name__ == "__main__":
    main()
