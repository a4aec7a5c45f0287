"""One-off measurement for VERDICT r2 items 4/5 (run on the real TPU):

(a) cluster-set delta between per-chunk top-k pooling (sweep_keep_per_chunk
    = 256) and full-pool clustering (0, reference semantics) on a real
    YCB-bowl fixture sweep;
(b) ladder (score_hybrid) vs exact (score_transforms) argmax identity on a
    real 2048-base fixture chunk.

Results go into docs/RESULTS.md. Usage:
    python scripts/measure_sweep_truncation.py [--bases 16384] [--out artifacts]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases", type=int, default=16384)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--out", default="artifacts/measure")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from model_matching_tpu.config import get_preset
    from model_matching_tpu.estimator import (
        StocsEstimator, _pair_ep_of, _phase_fit, _phase_sample, _phase_score,
        _run_congruent,
    )
    from model_matching_tpu.model import load_model_pack
    from model_matching_tpu.preprocess import preprocess_model
    from model_matching_tpu.scene import load_scene

    os.makedirs(args.out, exist_ok=True)
    cfg = get_preset("ycb").match
    model_ply = os.path.join(args.out, "model_search.ply")
    table_npz = os.path.join(args.out, "ppf_table.npz")
    if not os.path.exists(table_npz):
        preprocess_model(
            f"{REF}/models/024_bowl/textured_vertices.ply",
            model_ply, table_npz, get_preset("ycb").preprocess, verbose=False,
        )
    model = load_model_pack(model_ply, table_npz, cfg.max_model_points)
    scene = load_scene(
        f"{REF}/examples/ycb/rgb.png", f"{REF}/examples/ycb/depth.png",
        f"{REF}/examples/ycb/probability_maps/024_bowl.png", None, cfg,
    )
    est = StocsEstimator(model, scene, cfg)
    print(f"backend={jax.default_backend()} |M|={int(model.count())} "
          f"|S|={int(scene.count())}", flush=True)

    # ---- (b) ladder vs exact argmax on one real 2048-base chunk ---------
    ccfg = dataclasses.replace(cfg, number_of_bases=args.chunk)
    key = jax.random.PRNGKey(7)
    ks, kc = jax.random.split(key)
    bits = est.exists_bits()
    bases = _phase_sample(ks, model.table, scene.pos, scene.normal,
                          est.class_prob, scene.valid, ccfg, args.chunk, bits)
    sets = _run_congruent(kc, model, scene, bases, ccfg)
    poses, _nsv = _phase_fit(scene.pos, _pair_ep_of(model), scene.centroid,
                             model.centroid, bases, sets)
    n_valid = int(jnp.sum(poses.valid.astype(jnp.int32)))
    t0 = time.perf_counter()
    s_ladder, i_ladder, b_ladder = _phase_score(
        poses, model, scene, est.class_prob, ccfg, True)
    b_ladder = float(b_ladder); i_ladder = int(i_ladder)
    t_ladder = time.perf_counter() - t0
    t0 = time.perf_counter()
    s_exact, i_exact, b_exact = _phase_score(
        poses, model, scene, est.class_prob, ccfg, False)
    b_exact = float(b_exact); i_exact = int(i_exact)
    t_exact = time.perf_counter() - t0
    same_pose = bool(np.allclose(
        np.asarray(poses.transform)[i_ladder],
        np.asarray(poses.transform)[i_exact], atol=1e-5,
    ))
    print(f"[argmax] chunk={args.chunk} valid_hyp={n_valid} "
          f"ladder: idx={i_ladder} lcp={b_ladder:.6f} ({t_ladder*1e3:.0f} ms) "
          f"exact: idx={i_exact} lcp={b_exact:.6f} ({t_exact*1e3:.0f} ms) "
          f"same_index={i_ladder == i_exact} same_pose={same_pose} "
          f"score_delta={abs(b_ladder - b_exact):.2e}", flush=True)

    # ---- (a) truncation: keep=256/chunk vs full pool --------------------
    res = {}
    for tag, keep in (("top256", 256), ("full", 0)):
        t0 = time.perf_counter()
        best_lcp, best_w, cl_t, cl_s, stats = est.run_sweep(
            args.bases, chunk=args.chunk, keep_per_chunk=keep, verbose=False)
        dt = time.perf_counter() - t0
        res[tag] = (best_lcp, best_w, cl_t, cl_s)
        print(f"[sweep:{tag}] bases={args.bases} best={best_lcp:.6f} "
              f"clusters={len(cl_s)} scores={[f'{s:.4f}' for s in cl_s]} "
              f"hyp={stats['hypotheses']} {dt:.1f}s", flush=True)

    bl_a, w_a, ct_a, cs_a = res["top256"]
    bl_b, w_b, ct_b, cs_b = res["full"]
    print(f"[delta] best_lcp: {abs(bl_a - bl_b):.2e} "
          f"best_pose_maxabs: {np.abs(w_a - w_b).max():.2e} "
          f"n_clusters: {len(cs_a)} vs {len(cs_b)}", flush=True)
    k = min(len(cs_a), len(cs_b))
    for i in range(max(len(cs_a), len(cs_b))):
        if i >= k:
            who = "top256" if i < len(cs_a) else "full"
            print(f"  cluster {i}: only in {who}", flush=True)
            continue
        dpos = float(np.linalg.norm(ct_a[i][:3, 3] - ct_b[i][:3, 3]))
        ds = abs(float(cs_a[i]) - float(cs_b[i]))
        print(f"  cluster {i}: |dt|={dpos * 1e3:.2f} mm score_d={ds:.4f} "
              f"({float(cs_a[i]):.4f} vs {float(cs_b[i]):.4f})", flush=True)


if __name__ == "__main__":
    main()
