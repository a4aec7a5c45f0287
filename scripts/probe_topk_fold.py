"""Probe: dense-tier congruent selection cost — top_k over the [pl, 16]
stripe slots vs cheaper variants.

The dense tiers (cap >= 4096) end with top_k(pl*16 -> 200) per base
(congruent.one_base selection tail); the round-3 battery measured it at
~0.31 ms/base, ~40 ms of the 226 ms congruent phase. Variants:

  seg8      current _topk_segmented (8 segments)           [exact]
  seg16/32  deeper segmentation                            [exact]
  fold4     max over stripe groups of 4, top_k(pl*4)       [<=4/row]
  fold16    max over all 16 stripes,     top_k(pl)         [<=1/row]

fold* change WHICH random subsample is kept when a base has more
matches than maximum_congruent_sets (same match set, fewer candidate
slots per P row) — this probe prices them before any semantics call.

Run on the real chip: python scripts/probe_topk_fold.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 200
BATCH = 64  # bases per lax.map, mimicking the sequential dense tiers


def main():
    import jax
    import jax.numpy as jnp
    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from model_matching_tpu.congruent import _topk_segmented

    def seg_topk(seg):
        def f(flat):
            n = flat.shape[0]
            if n % seg or K * seg > n // seg:
                return jax.lax.top_k(flat, K)
            per = n // seg
            sv, si = jax.vmap(lambda x: jax.lax.top_k(x, K))(
                flat.reshape(seg, per))
            si = si + (jnp.arange(seg, dtype=si.dtype) * per)[:, None]
            top, mi = jax.lax.top_k(sv.reshape(-1), K)
            return top, si.reshape(-1)[mi]
        return f

    def fold(nfold):
        def f(row_best):  # [pl, 16]
            pl = row_best.shape[0]
            folded = jnp.max(
                row_best.reshape(pl, nfold, 16 // nfold), axis=2
            )
            return _topk_segmented(folded.reshape(-1), K)
        return f

    variants = {
        "cur_seg8": lambda rb: _topk_segmented(rb.reshape(-1), K),
        "seg16": lambda rb: seg_topk(16)(rb.reshape(-1)),
        "seg32": lambda rb: seg_topk(32)(rb.reshape(-1)),
        "fold4": fold(4),
        "fold16": fold(1),
    }

    for pl in (4608, 8704, 17408):
        rng = np.random.default_rng(0)
        # realistic sparsity: ~10% of slots hold a match (marker-bit set)
        vals = rng.integers(0, 2**31, size=(BATCH, pl, 16), dtype=np.int64)
        mask = rng.random((BATCH, pl, 16)) < 0.1
        rb = jnp.asarray(
            np.where(mask, vals, 0).astype(np.int32)
        )
        print(f"--- pl={pl} (n={pl*16}) ---")
        for name, fn in variants.items():
            g = jax.jit(lambda x: jax.lax.map(fn, x))
            jax.block_until_ready(g(rb))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(g(rb))
                best = min(best, time.perf_counter() - t0)
            print(f"{name:10s} {best / BATCH * 1e6:8.1f} us/base")


if __name__ == "__main__":
    main()
