"""Warm per-phase timing of one fixture sweep chunk on the real chip —
evidence for where the next sweep-throughput optimization should go.

Times each jitted phase (sample / congruent / fit / ladder score / top-k)
separately with block_until_ready fences, then the fenceless pipelined
chunk (what run_sweep actually dispatches) to show how much the async
pipeline already hides.

Usage (TPU): python scripts/prof_sweep_phases.py [--chunk 2048] [--iters 5]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="artifacts/measure")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from model_matching_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from model_matching_tpu.config import get_preset
    from model_matching_tpu.estimator import (
        StocsEstimator, _pair_ep_of, _phase_fit, _phase_sample, _phase_score,
        _run_congruent,
    )
    from model_matching_tpu.model import load_model_pack
    from model_matching_tpu.preprocess import preprocess_model
    from model_matching_tpu.scene import load_scene

    os.makedirs(args.out, exist_ok=True)
    base_cfg = get_preset("ycb").match
    model_ply = os.path.join(args.out, "model_search.ply")
    table_npz = os.path.join(args.out, "ppf_table.npz")
    if not os.path.exists(table_npz):
        preprocess_model(
            f"{REF}/models/024_bowl/textured_vertices.ply",
            model_ply, table_npz, get_preset("ycb").preprocess, verbose=False,
        )
    cfg = dataclasses.replace(base_cfg, number_of_bases=args.chunk)
    model = load_model_pack(model_ply, table_npz, cfg.max_model_points)
    scene = load_scene(
        f"{REF}/examples/ycb/rgb.png", f"{REF}/examples/ycb/depth.png",
        f"{REF}/examples/ycb/probability_maps/024_bowl.png", None, cfg,
    )
    est = StocsEstimator(model, scene, cfg)
    bits = est.exists_bits()
    print(f"backend={jax.default_backend()} |M|={int(model.count())} "
          f"|S|={int(scene.count())} chunk={args.chunk}", flush=True)

    def phase_sample(key):
        return _phase_sample(key, model.table, scene.pos, scene.normal,
                             est.class_prob, scene.valid, cfg, args.chunk,
                             bits)

    def run_chunk(key, fences):
        ks, kc = jax.random.split(key)
        t = {}

        def fence(x, name):
            if fences:
                t0 = time.perf_counter()
                jax.block_until_ready(x)
                t[name] = time.perf_counter() - t0
            return x

        t0 = time.perf_counter()
        bases = phase_sample(ks)
        fence(bases.indices, "sample")
        sets = _run_congruent(kc, model, scene, bases, cfg)
        fence(sets.pairs, "congruent")
        cap = cfg.score_compact_cap
        slots = args.chunk * cfg.maximum_congruent_sets
        poses, nsv = _phase_fit(scene.pos, _pair_ep_of(model), scene.centroid,
                                model.centroid, bases, sets,
                                compact_cap=cap)
        fence(poses.transform, "fit")
        pre_n = (jnp.minimum(nsv, jnp.int32(cap))
                 if (cap and slots > cap) else None)
        scores, _i, _b = _phase_score(poses, model, scene, est._score_prob(),
                                      cfg, True, precompacted_count=pre_n)
        fence(scores, "score")
        top, idx = jax.lax.top_k(scores, 256)
        keep = (poses.transform[idx], poses.world_transform[idx], top)
        jax.block_until_ready(keep)
        t["total"] = time.perf_counter() - t0
        return t

    # compile/warm
    run_chunk(jax.random.PRNGKey(0), fences=False)

    fenced = {}
    for i in range(args.iters):
        t = run_chunk(jax.random.PRNGKey(100 + i), fences=True)
        for k, v in t.items():
            fenced.setdefault(k, []).append(v)
    pipelined = []
    for i in range(args.iters):
        t = run_chunk(jax.random.PRNGKey(200 + i), fences=False)
        pipelined.append(t["total"])

    print(f"-- fenced per-phase (min over {args.iters}, ms) --", flush=True)
    for k in ("sample", "congruent", "fit", "score", "total"):
        v = min(fenced[k]) * 1e3
        print(f"  {k:10s} {v:8.1f} ms   "
              f"({v / args.chunk * 1e3:7.1f} us/base)", flush=True)
    p = min(pipelined) * 1e3
    print(f"-- pipelined chunk (no fences): {p:.1f} ms "
          f"({p / args.chunk * 1e3:.1f} us/base, "
          f"{args.chunk / (p / 1e3):.0f} bases/s)", flush=True)


if __name__ == "__main__":
    main()
