"""Instance-path sampling cost on the packed/dove fixture (real TPU).

Measures, warm:
  * sequential stepwise sampler at the default scan block
  * blocked sampler at K in {16, 64, 256}
  * decomposition of one blocked dispatch (fills / rounds / draws)

Round-3 context (docs/RESULTS.md): the instance sweep ran at 36 bases/s
(~21 ms/base sampling) BEFORE the direct-mapped PPF tables landed; the
round-2 block-mode probes (26.2 ms/base at K=8) also predate them. This
probe re-prices both paths on the current code.

Usage: python scripts/probe_instance.py [--bases 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "dove")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases", type=int, default=256)
    args = ap.parse_args()

    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from model_matching_tpu import instance
    from model_matching_tpu.config import get_preset
    from model_matching_tpu.estimator import StocsEstimator
    from model_matching_tpu.model import load_model_pack
    from model_matching_tpu.preprocess import preprocess_model
    from model_matching_tpu.scene import load_scene

    preset = get_preset("packed")
    cfg = preset.match
    os.makedirs(ART, exist_ok=True)
    mply = os.path.join(ART, "model_search.ply")
    mtab = os.path.join(ART, "ppf_table.npz")
    if not os.path.exists(mtab):
        t0 = time.perf_counter()
        preprocess_model(
            f"{REF}/models/dove/textured_vertices.ply", mply, mtab,
            preset.preprocess, verbose=False,
        )
        print(f"preprocess: {time.perf_counter()-t0:.1f}s")
    model = load_model_pack(mply, mtab, cfg.max_model_points)
    scene = load_scene(
        f"{REF}/examples/packed/rgb.png",
        f"{REF}/examples/packed/depth.png",
        f"{REF}/examples/packed/probability_maps/dove.png",
        f"{REF}/examples/packed/probability_maps/edge.png",
        cfg,
    )
    print(f"scene: {int(scene.valid.sum())} valid points, "
          f"model: {model.pos.shape[0]} rows")

    b = args.bases
    key = jax.random.PRNGKey(7)

    common = dict(
        num_bases=b,
        dispersion=cfg.sample_dispersion,
        tr_disc=cfg.ppf_tr_discretization,
        rot_disc=cfg.ppf_rot_discretization,
        plane_threshold=cfg.plane_threshold,
        min_distance_base=cfg.min_distance_base,
        internal_angle_threshold=cfg.internal_angle_threshold,
        flood_max_iters=cfg.flood_fill_max_iters,
        flood_sweeps=cfg.flood_fill_sweeps or None,
    )
    sargs = (model.table, scene.pos, scene.normal, scene.class_prob,
             scene.edge_prob, scene.pixel, scene.valid, scene.edge_free)

    def timed(label, fn, reps=3):
        out = fn()
        jax.block_until_ready(out.indices)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out.indices)
            times.append(time.perf_counter() - t0)
        best = min(times)
        nv = int(out.valid.sum())
        print(f"{label:40s} {best*1e3:8.1f} ms  {best/b*1e3:7.2f} ms/base "
              f"(valid {nv}/{b})")
        return best

    timed(
        f"stepwise block={cfg.instance_scan_block}",
        lambda: instance.sample_instance_bases_stepwise(
            key, *sargs, block=cfg.instance_scan_block, **common),
    )
    for k in (16, 64, 256):
        if k > b:
            continue
        timed(
            f"blocked K={k}",
            lambda k=k: instance.sample_instance_bases_blocked(
                key, *sargs, block_size=k, **common),
        )

    # estimator-path numbers for context (what run_sweep dispatches)
    est = StocsEstimator(model, scene, cfg)
    import dataclasses
    for label, c2 in (
        ("est stepwise (default)", cfg),
        ("est blocked K=64",
         dataclasses.replace(cfg, instance_block_size=64)),
    ):
        est.cfg = c2
        from model_matching_tpu.estimator import _phase_sample_instance
        def run(c2=c2):
            return _phase_sample_instance(
                key, model.table, scene, scene.class_prob, c2, b)
        out = run()
        jax.block_until_ready(out.indices)
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out.indices)
        dt = time.perf_counter() - t0
        print(f"{label:40s} {dt*1e3:8.1f} ms  {dt/b*1e3:7.2f} ms/base")


if __name__ == "__main__":
    main()
