"""Decompose the full-sweep wall time: per-process one-time costs
(compile-cache loads, first dispatch) vs steady-state chunk loop vs the
finish tail (pool argmax + ICP + greedy clustering).

Runs, in ONE process: a 2-chunk warmup sweep (compiles/loads every
program incl. the finish tail), then the full 102,400-base sweep twice.
The second full sweep is the steady-state number; warmup-to-first-full
delta is the one-time cost the CLI pays per invocation.

Usage (TPU): python scripts/prof_sweep_overhead.py [--total 102400]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_battery import _fixture

REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--total", type=int, default=102400)
    args = ap.parse_args()
    import jax
    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from model_matching_tpu.estimator import StocsEstimator

    model, scene, cfg = _fixture()
    est = StocsEstimator(model, scene, dataclasses.replace(cfg))

    t0 = time.perf_counter()
    est.run_sweep(4096, verbose=False)
    print(f"2-chunk warmup sweep: {time.perf_counter()-t0:.1f} s",
          flush=True)

    for label in ("first full", "steady full"):
        t0 = time.perf_counter()
        best_lcp, _bw, cl_w, _cl_s, stats = est.run_sweep(
            args.total, verbose=False
        )
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.1f} s wall ({stats['seconds']:.1f} s "
              f"internal, {stats['bases_per_sec']:.0f} bases/s), "
              f"lcp {best_lcp:.4f}, {len(cl_w)} clusters, "
              f"{stats['hypotheses']} hypotheses", flush=True)


if __name__ == "__main__":
    main()
