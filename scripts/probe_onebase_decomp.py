"""Decompose the congruent per-base cost at the cap-256 tier.

Cumulative stages over the REAL fixture chunk's 2048 bases, fully
vmapped (width 2048) and as lax.map over groups of 8 (the production
structure), to separate per-base fundamental work from loop overhead:

  A  ppf_bins + CSR range lookup (2 sides)
  B  A + pair-slot flatten to cap 256 (2 sides)
  C  B + endpoint-row gathers / seg_points (2 sides)
  D  C + [256, 256] gate + stripe max
  E  D + top_k(4096 -> 200) + winner pair gathers   (= full one_base)

Usage (TPU): python scripts/probe_onebase_decomp.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_battery import _fixture, _pipeline_poses, _time, CHUNK

CAP = 256
SUB = 16


def main():
    import jax
    import jax.numpy as jnp
    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from model_matching_tpu.congruent import _unit_cube_params
    from model_matching_tpu.ops.ppf import ppf_bins
    from model_matching_tpu.ppf_table import (
        _mix32_jnp, gather_pair_srcs, lookup_pair_range,
    )

    model, scene, cfg = _fixture()
    est, bases, _sets, _poses = _pipeline_poses(model, scene, cfg)
    table = model.table
    pair_ep = model.pair_ep
    mpos = model.pos - model.centroid
    spos = scene.pos - scene.centroid
    snrm = scene.normal
    center, ratio = _unit_cube_params(mpos)
    eps_n = cfg.distance_threshold / ratio
    eg_size = jnp.exp2(jnp.trunc(-jnp.log2(eps_n)))
    tr, rot = cfg.ppf_tr_discretization, cfg.ppf_rot_discretization
    keys = jax.random.split(jax.random.PRNGKey(7), CHUNK)

    def stage(upto):
        def one(bkey, bidx, inv1, inv2, bvalid):
            b, bn = spos[bidx], snrm[bidx]
            bins1 = ppf_bins(b[0], bn[0], b[1], bn[1], tr, rot)
            bins2 = ppf_bins(b[2], bn[2], b[3], bn[3], tr, rot)
            off1, cnt1 = lookup_pair_range(table, bins1)
            off2, cnt2 = lookup_pair_range(table, bins2)
            if upto == "A":
                return jnp.sum(cnt1) + jnp.sum(cnt2)
            p_src, p_ok, _ = gather_pair_srcs(table, off1, cnt1, CAP)
            q_src, q_ok, _ = gather_pair_srcs(table, off2, cnt2, CAP)
            if upto == "B":
                return p_src.sum() + q_src.sum()

            def seg(src, inv):
                ep = pair_ep[src]
                aw, d = ep[:, 0:3], ep[:, 3:6]
                e_world = aw + inv * d
                e_unit = (e_world - center) / ratio + 0.5
                dirs = d / jnp.maximum(
                    jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-30)
                return e_unit, e_world, dirs

            e1u, e1w, n1 = seg(p_src, inv1)
            e2u, e2w, n2 = seg(q_src, inv2)
            if upto == "C":
                return e1w.sum() + e2w.sum() + n1.sum() + n2.sum()

            pack = lambda c: (c[:, 0] * 1024 + c[:, 1]) * 1024 + c[:, 2]
            c1 = pack(jnp.floor(e1u * eg_size).astype(jnp.int32))
            c2 = pack(jnp.floor(e2u * eg_size).astype(jnp.int32))
            d01 = b[1] - b[0]
            d23 = b[3] - b[2]
            alpha = jnp.sum(
                d01 / jnp.maximum(jnp.linalg.norm(d01), 1e-30)
                * (d23 / jnp.maximum(jnp.linalg.norm(d23), 1e-30)))
            sq1 = jnp.sum(e1w * e1w, axis=-1)
            sq2 = jnp.sum(e2w * e2w, axis=-1)
            match = c1[:, None] == c2[None, :]
            d2 = (sq1[:, None] + sq2[None, :]
                  - 2.0 * jnp.dot(e1w, e2w.T,
                                  preferred_element_type=jnp.float32))
            match &= d2 <= cfg.distance_threshold
            match &= jnp.abs(n1 @ n2.T - alpha) <= cfg.congruent_cos_tolerance
            match &= p_ok[:, None] & q_ok[None, :] & bvalid
            salt = jax.random.bits(bkey, dtype=jnp.uint32)
            rp = _mix32_jnp(jnp.arange(CAP, dtype=jnp.uint32) ^ salt)[:, None]
            cols = jnp.arange(CAP, dtype=jnp.uint32)
            rq = _mix32_jnp(cols ^ salt ^ jnp.uint32(0x9E3779B9))
            col_bits = 14
            marker = jnp.uint32(1 << col_bits)
            rand_mask = jnp.uint32(0x7FFFFFFF & ~((1 << (col_bits + 1)) - 1))
            v = ((rp ^ rq[None, :]) & rand_mask) | marker | cols[None, :]
            v = jnp.where(match, v, jnp.uint32(0))
            row_best = jnp.max(v.reshape(CAP, SUB, CAP // SUB), axis=2)
            if upto == "D":
                return row_best.astype(jnp.int32).sum()
            top, slot = jax.lax.top_k(
                row_best.reshape(-1).astype(jnp.int32), 200)
            pi = slot // SUB
            qi = top & ((1 << col_bits) - 1)
            quads = jnp.concatenate(
                [table.pairs[p_src[pi]], table.pairs[q_src[qi]]], axis=-1)
            return quads.sum() + (top > 0).sum()

        return one

    args = (keys, bases.indices, bases.invariant1, bases.invariant2,
            bases.valid)
    for upto in "ABCDE":
        one = stage(upto)
        full = jax.jit(lambda *a: jax.vmap(one)(*a))
        dt_v = _time(full, *args)
        grouped = jax.jit(lambda *a: jax.lax.map(
            lambda t: jax.vmap(one)(*t),
            jax.tree_util.tree_map(
                lambda x: x.reshape((CHUNK // 8, 8) + x.shape[1:]), a)))
        dt_g = _time(grouped, *args)
        print(f"  stage {upto}: vmap-2048 {dt_v*1e3:7.1f} ms "
              f"({dt_v/CHUNK*1e6:6.1f} us/base)   "
              f"map8 {dt_g*1e3:7.1f} ms ({dt_g/CHUNK*1e6:6.1f} us/base)",
              flush=True)


if __name__ == "__main__":
    main()
