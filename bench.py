"""Benchmark: pose-hypothesis scoring throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
North star (BASELINE.json): >= 1e5 pose hypotheses scored/sec/chip, where a
"hypothesis scored" is one weighted-LCP evaluation of a full model against
the scene (the reference's compute_alignment_score_for_rigid_transform,
src/stocs.cpp:1006-1041 — its hottest loop).

Workload mirrors the real YCB configuration: |M| ~ 480 model points,
|S| = 16384 scene points, epsilon = 5 mm, full-model scoring (no
coarse-to-fine shortcut — throughput is per honest full evaluation).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from model_matching_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _synthetic_setup
    from model_matching_tpu import scoring

    model, scene, cfg = _synthetic_setup(
        num_model=480, num_scene=16384, seed=3
    )

    h = 65536
    rng = np.random.default_rng(5)
    # realistic hypothesis mix: random rigid transforms around the scene
    from scipy.spatial.transform import Rotation

    transforms = np.tile(np.eye(4, dtype=np.float32), (h, 1, 1))
    transforms[:, :3, :3] = Rotation.random(h, rng=rng).as_matrix().astype(
        np.float32
    )
    transforms[:, :3, 3] = rng.normal(0, 0.15, (h, 3)).astype(np.float32)
    transforms = jnp.asarray(transforms)
    valid = jnp.ones(h, bool)
    mc = jnp.sum(model.valid.astype(jnp.float32))

    @jax.jit
    def run(transforms):
        # production scorer: dense-field ranking over every hypothesis with
        # the FULL model + exact-grid re-score of the leaders
        return scoring.score_hybrid(
            transforms, valid, model.pos, model.normal, model.valid,
            scene.field, scene.grid, scene.pos, scene.normal,
            scene.class_prob,
            cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
            model_count=mc,
        )

    # compile + warm up
    run(transforms).block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(transforms)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    hyps_per_sec = h * iters / dt
    print(
        json.dumps(
            {
                "metric": "pose_hypotheses_scored_per_sec_per_chip",
                "value": round(hyps_per_sec, 1),
                "unit": "hypotheses/s",
                "vs_baseline": round(hyps_per_sec / 1e5, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
