"""Benchmark the device-side sorted-grouped congruent dispatch
(`congruent_sorted_groups=G`) against the per-base cond ladder (G=0) on
the YCB fixture chunk. This is the round-3 replacement for the deleted
host-partitioned executor (bench_congruent_partition.py in git history):
same small-tier grouping idea, but the count pass / argsort / grouping
all stay inside the one jit program, so no host sync.

Usage:
    python scripts/bench_congruent_groups.py [--bases 2048] [--iters 3]
    (prefix with env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu for CPU)
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
    ap.add_argument("--bases", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--groups", type=int, nargs="*", default=[0, 8, 16, 32])
    ap.add_argument("--out", default="artifacts/measure")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from model_matching_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from model_matching_tpu.config import get_preset
    from model_matching_tpu.estimator import (
        StocsEstimator, _phase_sample, _run_congruent,
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
    cfg = dataclasses.replace(base_cfg, number_of_bases=args.bases)
    model = load_model_pack(model_ply, table_npz, cfg.max_model_points)
    scene = load_scene(
        f"{REF}/examples/ycb/rgb.png", f"{REF}/examples/ycb/depth.png",
        f"{REF}/examples/ycb/probability_maps/024_bowl.png", None, cfg,
    )
    est = StocsEstimator(model, scene, cfg)
    print(f"backend={jax.default_backend()} |M|={int(model.count())} "
          f"|S|={int(scene.count())} bases={args.bases}", flush=True)

    ks, kc = jax.random.split(jax.random.PRNGKey(7))
    bases = _phase_sample(ks, model.table, scene.pos, scene.normal,
                          est.class_prob, scene.valid, cfg, args.bases,
                          est.exists_bits())
    jax.block_until_ready(bases.indices)

    results = {}
    for g in args.groups:
        c = dataclasses.replace(cfg, congruent_sorted_groups=g)
        t0 = time.perf_counter()
        sets = _run_congruent(kc, model, scene, bases, c)
        jax.block_until_ready(sets.pairs)
        cold = time.perf_counter() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            sets = _run_congruent(kc, model, scene, bases, c)
            jax.block_until_ready(sets.pairs)
            times.append(time.perf_counter() - t0)
        warm = min(times)
        results[g] = (sets, cold, warm)
        print(f"[G={g:3d}] cold={cold:.2f}s warm={warm * 1e3:.0f}ms "
              f"({warm / args.bases * 1e6:.0f} us/base) "
              f"valid={int(jnp.sum(sets.quad_valid))}", flush=True)

    lg = 0 if 0 in results else min(results)
    ladder = results[lg]
    for g, (sets, _c, warm) in results.items():
        if g == lg:
            continue
        same_valid = np.array_equal(
            np.asarray(ladder[0].total_found), np.asarray(sets.total_found)
        )
        wl = ladder[2]
        print(f"[verdict G={g}] totals_identical={same_valid} "
              f"speedup={wl / warm:.2f}x "
              f"({'WINS' if warm < wl else 'LOSES'})", flush=True)


if __name__ == "__main__":
    main()
