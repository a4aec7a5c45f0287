"""Cond-ladder shape experiment: does the tier LADDER's dispatch depth
(sequential lax.cond levels per group) cost more than the extra matrix
work of a coarser ladder?

Evidence so far (scripts/probe_tier_cost.py, v5e): forcing EVERY base
through one tier costs 125 (cap 64) .. 421 (cap 16384) us/base — a 3.4x
spread over a 256x cap range — while the production 7-level ladder at
G=8 runs at 352 us/base. Per-base fixed + dispatch cost dominates, so a
shallower ladder should win even though mid-load bases run bigger gates.

Monkeypatches congruent.tier_plan with candidate ladders and times the
whole congruent phase (G=8) on the real fixture chunk. jax caches are
cleared between variants (the jitted phase is keyed on cfg, which does
not see the patch).

Usage (TPU): python scripts/probe_ladder_shape.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_battery import _fixture, _pipeline_poses, _time, CHUNK


LADDERS = {
    "production (7 lvl)": None,  # unpatched tier_plan
    "256/1024/8192 (3 lvl)": ([(256, None), (1024, None), (8192, 4096)]),
    "256/2048/8192 (3 lvl)": ([(256, None), (2048, None), (8192, 4096)]),
    "512/4096 (2 lvl)": ([(512, None), (4096, None)]),
    "1024/8192 (2 lvl)": ([(1024, None), (8192, 4096)]),
    "2048 (1 lvl)": ([(2048, None)]),
    "4096 (1 lvl)": ([(4096, None)]),
}


def main():
    import jax
    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from model_matching_tpu import congruent
    from model_matching_tpu.estimator import _run_congruent

    model, scene, cfg = _fixture()
    est, bases, _sets, _poses = _pipeline_poses(model, scene, cfg)
    kc = jax.random.split(jax.random.PRNGKey(0))[1]

    orig = congruent.tier_plan
    top = orig(cfg.max_pairs_per_bin)[1]
    import numpy as np
    ref_tot = None
    for label, tiers in LADDERS.items():
        if tiers is None:
            congruent.tier_plan = orig
        else:
            congruent.tier_plan = lambda p, t=tiers: (list(t), top)
        jax.clear_caches()
        sets = _run_congruent(kc, model, scene, bases, cfg)
        tot = int(np.asarray(sets.total_found).sum())
        if ref_tot is None:
            ref_tot = tot
        dt = _time(lambda k: _run_congruent(k, model, scene, bases, cfg),
                   kc, iters=3)
        flag = "" if tot == ref_tot else f"  !! total_found {tot} != {ref_tot}"
        print(f"  {label:24s} {dt*1e3:8.1f} ms "
              f"({dt/CHUNK*1e6:6.1f} us/base){flag}", flush=True)
    congruent.tier_plan = orig


if __name__ == "__main__":
    main()
