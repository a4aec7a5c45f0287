"""Roofline / MFU accounting for the two dominant online kernels
(VERDICT r4 weak #5): the congruent gate and the weighted-LCP scoring
ladder, measured against EMPIRICAL chip ceilings (not datasheet
constants — the attainable peaks are measured in-process on the same
chip, so the reported fractions are of what this chip actually does).

Ceilings measured:
  * stream   — full-array reduce read rate (informational; the XLA
               single-reduction lowering does not saturate HBM, so the
               kernel fractions below use the gather/vpu/mxu ceilings)
  * mxu      — bf16 matmul throughput at a large square shape, TFLOP/s
  * gather   — random 32 B row-gather rate from an HBM-resident table
               (the scoring ladder's access pattern), rows/s
  * vpu      — fused f32 elementwise chain (40 dependent ops/elem,
               compute-bound), G elem-ops/s

Kernels measured:
  * dense congruent gate (Pallas, production 8192-tier shape): gate
    elements/s; ops/elem ~ 11 -> fraction of the VPU ceiling
  * scoring ladder (score_hybrid, bench workload): hypotheses/s; the
    dominant stage-1 cost is 64 field-row gathers per hypothesis ->
    fraction of the gather ceiling; MXU FLOPs/hyp -> fraction of MXU

Usage (TPU): python scripts/roofline.py
Outputs one human-readable block + one JSON line (for RESULTS.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(fn, *a, iters=8):
    """Pipelined timing with a hard D2H sync: on the tunneled backend
    block_until_ready can return before simple one-op programs finish
    (measured 30 TB/s "HBM" otherwise), so every measurement dispatches
    `iters` dependent executions and fetches a scalar of the last —
    np.asarray is a real round trip."""
    import jax
    import numpy as _np

    out = fn(*a)
    _np.asarray(jax.tree.leaves(out)[0])  # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    _np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    from model_matching_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({jax.default_backend()})",
          flush=True)
    rng = np.random.default_rng(0)
    out = {"device": str(dev.device_kind)}

    # ---- ceiling 1: HBM streaming bandwidth --------------------------
    n = 128 * 1024 * 1024  # 512 MB f32
    x = jnp.asarray(rng.standard_normal(n, dtype=np.float32))
    f_copy = jax.jit(lambda a: (a * 1.0000001 + 1.0).sum())
    dt = _t(f_copy, x)
    stream = 4 * n / dt   # read-only stream (scalar output)
    out["stream_gbs"] = round(stream / 1e9, 1)
    print(f"stream ceiling: {stream/1e9:7.1f} GB/s (read)", flush=True)

    # ---- ceiling 2: MXU bf16 matmul ----------------------------------
    m = 8192
    a = jnp.asarray(
        rng.standard_normal((m, m), dtype=np.float32), jnp.bfloat16
    )
    f_mm = jax.jit(lambda a: (a @ a).astype(jnp.float32).sum())
    dt = _t(f_mm, a)
    mxu = 2 * m**3 / dt
    out["mxu_bf16_tflops"] = round(mxu / 1e12, 1)
    print(f"mxu ceiling:    {mxu/1e12:7.1f} TFLOP/s (bf16)", flush=True)

    # ---- ceiling 3: random 32 B row gather ---------------------------
    g = 1024 * 1024              # 32 MB table, [G, 8] f32 rows
    # sized like the bench scene's dense-field table so the ceiling sees
    # the same cache behavior the ladder does
    tbl = jnp.asarray(rng.standard_normal((g, 8), dtype=np.float32))
    ng = 16 * 1024 * 1024
    idx = jnp.asarray(rng.integers(0, g, ng, dtype=np.int32))
    f_g = jax.jit(lambda t, i: t[i].sum())
    dt = _t(f_g, tbl, idx)
    gather = ng / dt
    out["gather_rows_per_s"] = round(gather / 1e6, 1)
    print(f"gather ceiling: {gather/1e6:7.1f} M 32B-rows/s "
          f"({gather*32/1e9:.1f} GB/s effective)", flush=True)

    # ---- ceiling 4: VPU fused elementwise chain ----------------------
    def chain(a, b):
        # 40 dependent ops/elem: arithmetic intensity ~5 op/byte keeps
        # this compute-bound (a 10-op chain measured HBM-bound instead)
        c = a
        for _ in range(4):
            c = c * b + 1.0
            d = jnp.abs(c - 0.3)
            e = jnp.where(d <= 0.5, c, b)
            f = jnp.maximum(e, d)
            h = (c <= f).astype(jnp.float32)
            c = f * h + d
        return c.sum()

    y = jnp.asarray(rng.standard_normal(n, dtype=np.float32))
    f_v = jax.jit(chain)
    dt = _t(f_v, x, y)
    vpu = 40 * n / dt
    out["vpu_gops"] = round(vpu / 1e9, 1)
    print(f"vpu ceiling:    {vpu/1e9:7.1f} G f32-ops/s "
          f"(40-op fused chain)", flush=True)

    # ---- kernel 1: dense congruent gate (production tier shape) ------
    from model_matching_tpu.ops import pallas_congruent as pc

    cap = 8704                    # 8192 tier incl. block-gather slack
    pf = jnp.asarray(rng.standard_normal((16, cap), dtype=np.float32))
    qf = jnp.asarray(rng.standard_normal((16, cap), dtype=np.float32))
    rp = jnp.asarray(rng.integers(0, 2**31, cap, dtype=np.int32))
    rq = jnp.asarray(rng.integers(0, 2**31, cap, dtype=np.int32))

    reps = 16

    def kern(pf, qf, rp, rq):
        # loop the kernel inside ONE jit: a lone pallas_call dispatch
        # through the tunneled backend costs ~10 ms of overhead, 15x the
        # kernel's device time; the scan amortizes it away (rp varies
        # per step so CSE cannot collapse the iterations)
        def body(c, i):
            rb, cnt = pc.dense_gate(
                pf, qf, rp ^ i, rq, jnp.float32(0.3), 0.3,
                jnp.float32(5e-3),
                jnp.int32(0x7FFF0000 & ~0x7FFF), jnp.int32(1 << 14),
                q_tile=4352, p_tile=256, skip_dist=True,
                interpret=jax.default_backend() != "tpu",
            )
            return c + rb.sum() + cnt.sum(), 0
        c, _ = jax.lax.scan(
            body, jnp.int32(0), jnp.arange(reps, dtype=jnp.int32)
        )
        return c

    dt = _t(jax.jit(kern), pf, qf, rp, rq)
    ge = reps * cap * cap
    gate_elems = ge / dt
    # per gate element (skip_dist): 2 cell-eq compares + and, |cos-a|<=t
    # (sub/abs/cmp/and), key build (xor/and/or/or), select, stripe-max,
    # count-add ~ 11 VPU ops + a K=3 MXU dot (negligible FLOPs)
    gate_vpu_frac = 11 * gate_elems / vpu
    out["gate_elems_per_s"] = round(gate_elems / 1e9, 1)
    out["gate_vpu_frac"] = round(gate_vpu_frac, 2)
    print(f"congruent gate: {gate_elems/1e9:7.1f} G gate-elems/s "
          f"= {100*gate_vpu_frac:.0f}% of the VPU ceiling "
          f"(VPU-bound; VMEM-resident, ~0 HBM)", flush=True)

    # ---- kernel 2: scoring ladder (bench workload) -------------------
    from __graft_entry__ import _synthetic_setup
    from model_matching_tpu import scoring

    model, scene, cfg = _synthetic_setup(
        num_model=480, num_scene=16384, seed=3, max_pairs=20480
    )
    h = 65536
    tr = np.tile(np.eye(4, dtype=np.float32), (h, 1, 1))
    from scipy.spatial.transform import Rotation

    tr[:, :3, :3] = Rotation.random(h, rng=rng).as_matrix().astype(
        np.float32
    )
    tr[:, :3, 3] = rng.normal(0, 0.15, (h, 3)).astype(np.float32)
    tr = jnp.asarray(tr)
    valid = jnp.ones(h, bool)
    mc = jnp.sum(model.valid.astype(jnp.float32))

    @jax.jit
    def ladder(t):
        return scoring.score_hybrid(
            t, valid, model.pos, model.normal, model.valid,
            scene.field, scene.grid, scene.pos, scene.normal, None,
            cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
            model_count=mc,
        )

    dt = _t(ladder, tr)
    hps = h / dt
    m_pts = int(model.pos.shape[0])
    coarse = 64
    stride = max(1, m_pts // coarse)
    s1 = len(range(0, m_pts, stride))
    # stage shares: every hyp pays s1 field gathers; k_mid hyps re-rank
    # with the full model; refine_count exact-grid. At bench shapes the
    # stage-1 rows dominate (s1*H vs m*k_mid + grid rows).
    k_mid = min(cfg.score_mid_cap, max(1, int(0.08 * h)))
    rows_total = s1 * h + m_pts * k_mid
    rows_ps = rows_total / dt
    gather_frac = rows_ps / gather
    # MXU work: the 4x4 transform applied per (hyp, point) = 2*3*4 FLOP
    flops = (s1 * h + m_pts * k_mid) * 24
    mxu_frac = flops / dt / mxu
    out["ladder_hyp_per_s"] = round(hps, 0)
    out["ladder_gather_frac"] = round(gather_frac, 2)
    out["ladder_mxu_frac"] = round(mxu_frac, 4)
    print(f"scoring ladder: {hps:,.0f} hyp/s -> {rows_ps/1e6:.1f} M "
          f"field-row gathers/s = {100*gather_frac:.0f}% of the gather "
          f"ceiling; MXU {100*mxu_frac:.2f}% (gather-bound)", flush=True)

    print("ROOFLINE " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
