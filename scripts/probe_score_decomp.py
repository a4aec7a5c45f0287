"""Decompose score_hybrid's cost on the real fixture chunk: compaction
argsort, stage-1 strided field, the big top_k, stage-2 full-model field,
stage-3 exact, final scatter — each timed as its own jit with the real
pipeline tensors.

Usage (TPU): python scripts/probe_score_decomp.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_battery import _fixture, _pipeline_poses, _time


def main():
    import jax
    import jax.numpy as jnp
    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from model_matching_tpu import scoring

    model, scene, cfg = _fixture()
    est, _b, _s, poses = _pipeline_poses(model, scene, cfg)
    cp = est._score_prob()
    mc = jnp.sum(model.valid.astype(jnp.float32))
    tr, valid = poses.transform, poses.valid
    h_orig = tr.shape[0]
    cap = cfg.score_compact_cap
    nv = int(jnp.sum(valid.astype(jnp.int32)))
    print(f"slots={h_orig} valid={nv} cap={cap}", flush=True)

    # full phase for reference
    full = jax.jit(lambda t, v: scoring.score_hybrid(
        t, v, model.pos, model.normal, model.valid,
        scene.field, scene.grid, scene.pos, scene.normal, cp,
        cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
        model_count=mc, compact_cap=cap))
    print(f"  full score_hybrid:        {_time(full, tr, valid)*1e3:7.1f} ms",
          flush=True)

    # compaction
    comp = jax.jit(lambda t, v: jax.tree_util.tree_map(
        lambda a: a[jnp.argsort(jnp.logical_not(v))[:cap]], (t, v)))
    print(f"  compaction argsort+gather:{_time(comp, tr, valid)*1e3:7.1f} ms",
          flush=True)
    trc, vc = comp(tr, valid)

    # stage 1 at the bucketed width the fixture picks
    m = model.pos.shape[0]
    stride = max(1, m // 64)
    sub = slice(0, m, stride)
    width = cap // 4  # nv ~26k -> h/4 bucket
    s1 = jax.jit(lambda t, v: scoring.score_transforms_field(
        t[:width], v[:width], model.pos[sub], model.normal[sub],
        model.valid[sub], scene.field, cp,
        cfg.distance_threshold, cfg.lcp_normal_angle_threshold))
    print(f"  stage1 field {width}x{len(range(0, m, stride))}: "
          f"{_time(s1, trc, vc)*1e3:7.1f} ms", flush=True)

    coarse = jnp.pad(s1(trc, vc), (0, cap - width), constant_values=-1.0)
    k_mid = min(cap, max(256, int(cap * 0.08)))
    tk = jax.jit(lambda c: jax.lax.top_k(c, k_mid))
    print(f"  top_k {cap}->{k_mid}:     {_time(tk, coarse)*1e3:7.1f} ms",
          flush=True)
    _t, mid_idx = tk(coarse)

    s2 = jax.jit(lambda t, v, mi: scoring.score_transforms_field(
        t[mi], v[mi], model.pos, model.normal, model.valid,
        scene.field, cp,
        cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
        model_count=mc))
    print(f"  stage2 field {k_mid}x{m}: {_time(s2, trc, vc, mid_idx)*1e3:7.1f} ms",
          flush=True)
    mid = s2(trc, vc, mid_idx)

    s3 = jax.jit(lambda t, v, mi, md: scoring.score_transforms(
        t[mi[jax.lax.top_k(md, 256)[1]]],
        v[mi[jax.lax.top_k(md, 256)[1]]],
        model.pos, model.normal, model.valid,
        scene.grid, scene.pos, scene.normal, cp,
        cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
        model_count=mc))
    print(f"  stage3 exact 256x{m}:     "
          f"{_time(s3, trc, vc, mid_idx, mid)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
