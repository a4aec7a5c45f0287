"""Retune congruent_sorted_groups after the round-3 fixed-cost changes
(closed-form flatten, hoisted lookups, segmented top_k): time the whole
congruent phase at several group widths on the real fixture chunk.

Usage (TPU): python scripts/probe_group_width.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from probe_battery import _fixture


def main():
    import jax
    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from model_matching_tpu.estimator import (
        StocsEstimator, _phase_sample, _run_congruent,
    )

    model, scene, cfg = _fixture()
    est = StocsEstimator(model, scene, cfg)
    ks, kc = jax.random.split(jax.random.PRNGKey(0))
    bases = _phase_sample(ks, model.table, scene.pos, scene.normal,
                          est.class_prob, scene.valid, cfg, 2048,
                          est.exists_bits())
    jax.block_until_ready(bases.indices)

    for g in [0, 4, 8, 16, 32, 64]:
        c = dataclasses.replace(cfg, congruent_sorted_groups=g)
        jax.block_until_ready(
            _run_congruent(kc, model, scene, bases, c).pairs)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(
                _run_congruent(kc, model, scene, bases, c).pairs)
            best = min(best, time.perf_counter() - t0)
        print(f"G={g:3d}: {best*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
