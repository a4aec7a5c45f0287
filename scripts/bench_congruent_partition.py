"""VERDICT r2 next-step 9a: benchmark the host-partitioned congruent
executor (`congruent_partition=True`) against the monolithic cond-ladder
program on a CHEAP-DISPATCH backend (CPU), where the per-chunk count-pass
host sync that cancelled its gains on the v5e remote-dispatch backend
should be ~free. Decides flip-default-on-CPU vs delete.

Usage (CPU):
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/bench_congruent_partition.py [--bases 512] [--iters 3]
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
    ap.add_argument("--bases", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="artifacts/measure")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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
    for tag, part in (("monolithic", False), ("partitioned", True)):
        c = dataclasses.replace(cfg, congruent_partition=part)
        bucket_state = {}
        # cold (compile) pass
        t0 = time.perf_counter()
        sets = _run_congruent(kc, model, scene, bases, c,
                              bucket_state=bucket_state if part else None)
        jax.block_until_ready(sets.quads)
        cold = time.perf_counter() - t0
        # warm passes
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            sets = _run_congruent(kc, model, scene, bases, c,
                                  bucket_state=bucket_state if part else None)
            jax.block_until_ready(sets.quads)
            times.append(time.perf_counter() - t0)
        warm = min(times)
        results[tag] = (sets, cold, warm)
        print(f"[{tag}] cold={cold:.2f}s warm={warm * 1e3:.0f}ms "
              f"({warm / args.bases * 1e6:.0f} us/base) "
              f"valid={int(jnp.sum(sets.quad_valid))}", flush=True)

    sa, sb = results["monolithic"][0], results["partitioned"][0]
    same = (np.array_equal(np.asarray(sa.quads), np.asarray(sb.quads))
            and np.array_equal(np.asarray(sa.quad_valid),
                               np.asarray(sb.quad_valid)))
    wa = results["monolithic"][2]
    wb = results["partitioned"][2]
    print(f"[verdict] output_identical={same} speedup={wa / wb:.2f}x "
          f"(partitioned {'WINS' if wb < wa else 'LOSES'})", flush=True)


if __name__ == "__main__":
    main()
