"""Warm per-phase timing of one PACKED instance-mode sweep chunk on the
real chip: sequential flood-fill sampling vs congruent vs fit vs score.

Usage (TPU): python scripts/prof_instance_sweep.py [--chunk 2048]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "dove")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from model_matching_tpu import sampling
    from model_matching_tpu.config import get_preset
    from model_matching_tpu.estimator import (
        StocsEstimator, _pair_ep_of, _phase_fit, _phase_sample_instance,
        _phase_score, _run_congruent,
    )
    from model_matching_tpu.model import load_model_pack
    from model_matching_tpu.preprocess import preprocess_model
    from model_matching_tpu.scene import load_scene

    preset = get_preset("packed")
    cfg = dataclasses.replace(preset.match, number_of_bases=args.chunk)
    os.makedirs(ART, exist_ok=True)
    mply = os.path.join(ART, "model_search.ply")
    mtab = os.path.join(ART, "ppf_table.npz")
    if not os.path.exists(mtab):
        preprocess_model(
            f"{REF}/models/dove/textured_vertices.ply", mply, mtab,
            preset.preprocess, verbose=False,
        )
    model = load_model_pack(mply, mtab, cfg.max_model_points)
    scene = load_scene(
        f"{REF}/examples/packed/rgb.png",
        f"{REF}/examples/packed/depth.png",
        f"{REF}/examples/packed/probability_maps/dove.png",
        f"{REF}/examples/packed/probability_maps/edge.png",
        cfg,
    )
    est = StocsEstimator(model, scene, cfg)
    key = jax.random.PRNGKey(3)
    k_sample, k_cong = jax.random.split(key)

    def timed(label, fn, reps=args.iters):
        out = jax.block_until_ready(fn())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{label:28s} {dt*1e3:9.1f} ms  "
              f"({dt/args.chunk*1e6:8.1f} us/base)")
        return out

    inst = timed("sample (stepwise)", lambda: _phase_sample_instance(
        k_sample, model.table, scene, scene.class_prob, cfg, args.chunk))
    bases = sampling.SampledBases(
        inst.indices, inst.invariant1, inst.invariant2, inst.valid)
    print("valid bases:", int(jnp.sum(bases.valid)))
    sets = timed("congruent", lambda: _run_congruent(
        k_cong, model, scene, bases, cfg))
    import numpy as np
    pc = np.asarray(sets.pair_counts)
    print("pair counts: p50", np.percentile(pc.max(1), 50),
          "p90", np.percentile(pc.max(1), 90),
          "p99", np.percentile(pc.max(1), 99), "max", pc.max())
    print("congruent valid slots:", int(np.asarray(sets.quad_valid).sum()),
          "total_found sum:", int(np.asarray(sets.total_found).sum()))
    cap = cfg.score_compact_cap
    fit_out = timed("fit (compacted)", lambda: _phase_fit(
        scene.pos, _pair_ep_of(model), scene.centroid, model.centroid,
        bases, sets, compact_cap=cap))
    poses, n_slot_valid = fit_out
    slots = args.chunk * cfg.maximum_congruent_sets
    pre_n = (jnp.minimum(n_slot_valid, jnp.int32(cap))
             if (cap and slots > cap) else None)
    timed("score (ladder)", lambda: _phase_score(
        poses, model, scene, est._score_prob(), cfg, True,
        precompacted_count=pre_n))

    # pipelined chunk (as run_sweep dispatches, single fence at the end)
    def chunk_fn():
        i2 = _phase_sample_instance(
            k_sample, model.table, scene, scene.class_prob, cfg, args.chunk)
        b2 = sampling.SampledBases(
            i2.indices, i2.invariant1, i2.invariant2, i2.valid)
        s2 = _run_congruent(k_cong, model, scene, b2, cfg)
        p2, nsv = _phase_fit(
            scene.pos, _pair_ep_of(model), scene.centroid, model.centroid,
            b2, s2, compact_cap=cap)
        pn = (jnp.minimum(nsv, jnp.int32(cap))
              if (cap and slots > cap) else None)
        sc, _i, _b = _phase_score(
            p2, model, scene, est._score_prob(), cfg, True,
            precompacted_count=pn)
        return sc

    timed("pipelined chunk", chunk_fn)


if __name__ == "__main__":
    main()
