"""Measure the score ladder's safety margins on real fixture chunks:
for each chunk, where does the EXACT-scorer argmax rank in the stage-1
(strided-subset field) ordering and in the stage-2 (full-model field)
ordering? Determines how far mid_fraction / refine_count can shrink
before the ladder can miss the winner.

Usage (TPU): python scripts/probe_score_ladder.py [--chunks 20]
"""
import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_battery import _fixture

REF = "/root/reference"


def _fixture_named(name):
    if name == "ycb":
        return _fixture()
    from model_matching_tpu.config import get_preset
    from model_matching_tpu.model import load_model_pack
    from model_matching_tpu.preprocess import preprocess_model
    from model_matching_tpu.scene import load_scene

    obj = {"linemod": "obj_06"}[name]
    out = f"artifacts/measure_{name}"
    os.makedirs(out, exist_ok=True)
    preset = get_preset(name)
    cfg = dataclasses.replace(preset.match, number_of_bases=2048)
    model_ply = os.path.join(out, "model_search.ply")
    table_npz = os.path.join(out, "ppf_table.npz")
    if not os.path.exists(table_npz):
        preprocess_model(
            f"{REF}/models/{obj}/textured_vertices.ply",
            model_ply, table_npz, preset.preprocess, verbose=False,
        )
    model = load_model_pack(model_ply, table_npz, cfg.max_model_points)
    scene = load_scene(
        f"{REF}/examples/{name}/rgb.png", f"{REF}/examples/{name}/depth.png",
        f"{REF}/examples/{name}/probability_maps/{obj}.png", None, cfg,
    )
    return model, scene, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=20)
    ap.add_argument("--fixture", default="ycb", choices=["ycb", "linemod"])
    ap.add_argument("--coarse", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from model_matching_tpu import scoring
    from model_matching_tpu.estimator import (
        StocsEstimator, _pair_ep_of, _phase_fit, _phase_sample, _run_congruent,
    )

    model, scene, cfg = _fixture_named(args.fixture)
    est = StocsEstimator(model, scene, cfg)
    cp = est._score_prob()
    mc = jnp.sum(model.valid.astype(jnp.float32))
    cap = cfg.score_compact_cap

    m = model.pos.shape[0]
    stride = max(1, m // args.coarse)
    sub = slice(0, m, stride)

    @jax.jit
    def stage_scores(tr, valid):
        sel = scoring._stable_partition_sel(valid, cap)
        tr, valid = tr[sel], valid[sel]
        s1 = scoring.score_transforms_field(
            tr, valid, model.pos[sub], model.normal[sub], model.valid[sub],
            scene.field, cp, cfg.distance_threshold,
            cfg.lcp_normal_angle_threshold)
        s2 = scoring.score_transforms_field(
            tr, valid, model.pos, model.normal, model.valid,
            scene.field, cp, cfg.distance_threshold,
            cfg.lcp_normal_angle_threshold, model_count=mc)
        s3 = scoring.score_transforms(
            tr, valid, model.pos, model.normal, model.valid,
            scene.grid, scene.pos, scene.normal, cp,
            cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
            model_count=mc, chunk=4096)
        return s1, s2, s3

    key = jax.random.PRNGKey(7)
    r1, r2 = [], []
    for ci in range(args.chunks):
        k = jax.random.fold_in(key, ci)
        ks, kc = jax.random.split(k)
        bases = _phase_sample(ks, model.table, scene.pos, scene.normal,
                              est.class_prob, scene.valid, cfg, 2048,
                              est.exists_bits())
        sets = _run_congruent(kc, model, scene, bases, cfg)
        poses, _ = _phase_fit(scene.pos, _pair_ep_of(model), scene.centroid,
                              model.centroid, bases, sets)
        s1, s2, s3 = stage_scores(poses.transform, poses.valid)
        s1, s2, s3 = map(np.asarray, (s1, s2, s3))
        w = int(np.argmax(s3))
        # rank of w in stage-1/stage-2 descending order
        rank1 = int(np.sum(s1 > s1[w]))
        rank2 = int(np.sum(s2 > s2[w]))
        r1.append(rank1); r2.append(rank2)
        print(f"chunk {ci:3d}: exact_best={s3[w]:.4f} "
              f"stage1_rank={rank1:6d} stage2_rank={rank2:6d}", flush=True)

    r1, r2 = np.array(r1), np.array(r2)
    print(f"\nstage1 rank: max={r1.max()} p99={np.percentile(r1, 99):.0f} "
          f"median={np.median(r1):.0f}")
    print(f"stage2 rank: max={r2.max()} p99={np.percentile(r2, 99):.0f} "
          f"median={np.median(r2):.0f}")
    print(f"current k_mid={max(cfg.score_refine_count if hasattr(cfg, 'score_refine_count') else 256, int(cap * 0.08))} refine=256")


if __name__ == "__main__":
    main()
