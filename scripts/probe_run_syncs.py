"""Measure the single-shot StocsEstimator.run() wall time and its host-sync
tax on the tunneled TPU (see probe_sync_penalty.py: after the first D2H,
every blocking host fetch costs ~25 ms; serial np.asarray fetches cost
~35 ms EACH even on completed buffers, while one jax.device_get on a
pytree batches them).

Run on the real chip: python scripts/probe_run_syncs.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_battery import _fixture


def main():
    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from model_matching_tpu.estimator import StocsEstimator

    model, scene, cfg = _fixture()
    est = StocsEstimator(model, scene, cfg)
    est.run(verbose=False)  # compile
    for label, verbose in (("verbose=False", False),):
        ts = []
        for i in range(6):
            t0 = time.perf_counter()
            est.run(seed=i + 1, verbose=verbose)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"run() {label}: median {ts[len(ts)//2]*1e3:.0f} ms "
              f"min {ts[0]*1e3:.0f} ms", flush=True)

    # sweep tail (finish_sweep_pool) cost: run a small sweep twice
    est2 = StocsEstimator(model, scene, cfg)
    est2.run_sweep(8192, chunk=2048, verbose=False)
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        est2.run_sweep(8192, chunk=2048, seed=i + 1, verbose=False)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"run_sweep(8192): median {ts[len(ts)//2]*1e3:.0f} ms "
          f"min {ts[0]*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
