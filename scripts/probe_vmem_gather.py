"""Round-3 re-probe of the Mosaic VMEM gather limit that shelves
ops/pallas_field.py (see its STATUS block).

Round-2 state: tpu.dynamic_gather lowers ONLY when the gather spans a
single 8x128 vreg ("Not implemented: Multiple source vregs along gather
dimension"). This probe re-attempts the exact shape class the field kernel
needs — row gather from a multi-vreg [T, 128] VMEM table — plus the
single-vreg control, and prints one PASS/FAIL line per case.

Usage (real chip): python scripts/probe_vmem_gather.py
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_probe(rows, cols, n_idx):
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[...]
        idx = idx_ref[...]
        # broadcast-index take_along_axis — the round-2 form the
        # single-vreg case accepted
        out_ref[...] = jnp.take_along_axis(
            tab, idx[:, None] * jnp.ones((1, cols), jnp.int32), axis=0
        )

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_idx, cols), jnp.float32),
        )(tab, idx)

    return run


def main():
    print(f"backend={jax.default_backend()} jax={jax.__version__}",
          flush=True)
    cases = [
        ("single-vreg control [8,128]", 8, 128, 8),
        ("multi-vreg sublane [64,128]", 64, 128, 64),
        ("multi-vreg big [1024,128]", 1024, 128, 256),
        ("field-box shape [4096,128]", 4096, 128, 512),
    ]
    rng = np.random.default_rng(0)
    for name, rows, cols, n_idx in cases:
        tab = jnp.asarray(rng.normal(size=(rows, cols)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, rows, n_idx).astype(np.int32))
        try:
            out = make_probe(rows, cols, n_idx)(tab, idx)
            ok = np.allclose(np.asarray(out), np.asarray(tab)[np.asarray(idx)])
            print(f"PASS {name}: lowered and ran, correct={ok}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
