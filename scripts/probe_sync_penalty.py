"""Probe: the axon-tunnel D2H sync penalty.

Round-3 finding (reconstructed after a session crash): on the tunneled
TPU platform, after the process performs its FIRST device->host
transfer, every subsequent host synchronization (block_until_ready /
np.asarray / float()) carries a fixed ~25 ms penalty — consistent with
the client switching from busy-wait to sleep-polling completion.

This probe quantifies:
  1. clean-process dispatch+sync cost of a trivial program (pre-D2H)
  2. the same after one 4-byte D2H (post-D2H)
  3. whether the penalty is per SYNC or per DISPATCH: N async
     dispatches + ONE sync, post-D2H
  4. whether copy_to_host_async before the sync dodges it

Implication for production: timings measured in-process carry +~25 ms
per host sync after scene load (which does D2H during grid builds);
pipelined sweep chunks pay it once per chunk-boundary sync, not per
dispatched program.

Run on the real chip: python scripts/probe_sync_penalty.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_sync(f, x, n=20):
    """Median time of dispatch+block, one sync per iteration."""
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        import jax
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    dev = jax.devices()[0]
    print(f"platform: {dev.platform} ({dev.device_kind})", flush=True)

    x = jnp.ones((128, 128), jnp.float32)
    f = jax.jit(lambda a: a * 2.0 + 1.0)
    jax.block_until_ready(f(x))  # compile; block is not D2H

    t_clean = bench_sync(f, x)
    print(f"1. clean-process sync:      {t_clean*1e3:8.3f} ms", flush=True)

    # one tiny D2H
    _ = float(jnp.float32(1.0))
    t_poison = bench_sync(f, x)
    print(f"2. post-D2H sync:           {t_poison*1e3:8.3f} ms", flush=True)

    # N dispatches, one sync: per-dispatch or per-sync?
    for n_dispatch in (1, 8, 64):
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            y = x
            for _ in range(n_dispatch):
                y = f(y)
            jax.block_until_ready(y)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"3. {n_dispatch:3d} dispatches + 1 sync: "
              f"{ts[len(ts)//2]*1e3:8.3f} ms", flush=True)

    # does copy_to_host_async change the sync cost?
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        y = f(x)
        y.copy_to_host_async()
        _ = jax.device_get(y)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"4. async-copy D2H sync:     {ts[len(ts)//2]*1e3:8.3f} ms",
          flush=True)

    # does the penalty decay, or is it permanent?
    time.sleep(2.0)
    t_later = bench_sync(f, x)
    print(f"5. post-D2H after 2s idle:  {t_later*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
