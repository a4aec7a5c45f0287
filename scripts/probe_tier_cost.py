"""Per-tier congruent cost + fixture load histogram.

For each tier cap, time the whole congruent phase with max_pairs_per_bin
set to that cap (tier_plan then emits a single tier, so every base runs
it). Combined with the per-base max(p,q) pair-count histogram this gives
the time decomposition of the production ladder on the fixture chunk.

Usage (TPU): python scripts/probe_tier_cost.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_battery import _fixture, _pipeline_poses, _time, CHUNK


def main():
    import jax
    import jax.numpy as jnp
    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from model_matching_tpu.estimator import _run_congruent
    from model_matching_tpu.ops.ppf import ppf_bins
    from model_matching_tpu.ppf_table import lookup_pair_range

    model, scene, cfg = _fixture()
    est, bases, sets, _poses = _pipeline_poses(model, scene, cfg)
    kc = jax.random.split(jax.random.PRNGKey(0))[1]

    # per-base max(p_total, q_total) histogram
    loads = np.maximum(
        np.asarray(sets.pair_counts[:, 0]), np.asarray(sets.pair_counts[:, 1])
    )
    edges = [0, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 1 << 30]
    hist, _ = np.histogram(loads, bins=edges)
    print("load histogram (max(p,q) pairs per base):", flush=True)
    for lo, hi, n in zip(edges[:-1], edges[1:], hist):
        if n:
            print(f"  ({lo:6d}, {hi:6d}]: {n:5d} bases "
                  f"({100*n/CHUNK:5.1f}%)", flush=True)

    print("per-tier phase cost (every base forced through the tier):",
          flush=True)
    for cap in (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384):
        try:
            c2 = dataclasses.replace(
                cfg, max_pairs_per_bin=cap, congruent_sorted_groups=0
            )
        except ValueError as e:
            print(f"  cap {cap}: config rejects ({e})", flush=True)
            continue
        dt = _time(lambda k, c=c2: _run_congruent(k, model, scene, bases, c),
                   kc, iters=3)
        print(f"  cap {cap:6d}: {dt*1e3:8.1f} ms "
              f"({dt/CHUNK*1e6:6.1f} us/base)", flush=True)


if __name__ == "__main__":
    main()
