"""Multi-object single-program benchmark (BASELINE config 4 shape).

Reconstructs the round-2 measurement setup (three synthetic ellipsoid
objects of ~480/460/440 points in a ~15k-point cluttered scene, 100
bases per object, one lax.map device program via
multi.match_all_objects) as a committed script — the round-2 copy lived
in the gitignored artifacts/ dir and was wiped. Prints warm wall time
per call and per object plus recovery stats.

Usage (TPU): python scripts/prof_multi.py [--bases 100] [--iters 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ellipsoid(rng, n, a, b, c):
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(np.pi / 2, np.pi, n)
    pos = np.stack(
        [a * np.sin(v) * np.cos(u), b * np.sin(v) * np.sin(u), c * np.cos(v)],
        axis=1,
    ).astype(np.float32)
    nrm = np.stack(
        [np.sin(v) * np.cos(u) / a, np.sin(v) * np.sin(u) / b, np.cos(v) / c],
        axis=1,
    ).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return pos, nrm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases", type=int, default=100)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from model_matching_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from model_matching_tpu import multi, ppf_table
    from model_matching_tpu.config import MatchConfig
    from model_matching_tpu.model import ModelPack
    from model_matching_tpu.ops.densefield import build_dense_field
    from model_matching_tpu.ops.gridhash import build_neighbor_grid
    from model_matching_tpu.scene import ScenePack

    rng = np.random.default_rng(11)
    cfg = MatchConfig(number_of_bases=args.bases, max_scene_points=16384)

    shapes = [(480, 0.08, 0.065, 0.05), (460, 0.05, 0.09, 0.04),
              (440, 0.07, 0.05, 0.06)]
    models = [_ellipsoid(rng, n, a, b, c) for n, a, b, c in shapes]

    def pack_model(pos, nrm):
        table, _ = ppf_table.build_ppf_table(
            pos, nrm, cfg.ppf_tr_discretization, cfg.ppf_rot_discretization
        )
        c = pos.mean(0)
        padn = -(-len(pos) // 128) * 128

        def p(a):
            out = np.zeros((padn,) + a.shape[1:], np.float32)
            out[: len(a)] = a
            return jnp.asarray(out)

        return ModelPack(
            pos=p(pos - c), normal=p(nrm), rgb=p(np.zeros_like(pos)),
            valid=jnp.asarray(np.arange(padn) < len(pos)),
            centroid=jnp.asarray(c), table=table,
        )

    packs = [pack_model(m, n) for m, n in models]

    from scipy.spatial.transform import Rotation

    gts, parts, nparts, probs_parts = [], [], [], []
    offsets = ([0.1, -0.1, 0.7], [-0.12, 0.08, 0.8], [0.02, 0.14, 0.75])
    for o, ((m, n), t) in enumerate(zip(models, offsets)):
        g = np.eye(4, dtype=np.float32)
        g[:3, :3] = Rotation.random(rng=rng).as_matrix().astype(np.float32)
        g[:3, 3] = t
        gts.append(g)
        parts.append(m @ g[:3, :3].T + g[:3, 3])
        nparts.append(n @ g[:3, :3].T)
        pr = np.full((len(models), len(m)), 0.05, np.float32)
        pr[o] = 0.9
        probs_parts.append(pr)

    ncl = 14000
    clutter = np.stack(
        [rng.uniform(-0.4, 0.4, ncl), rng.uniform(-0.4, 0.4, ncl),
         np.full(ncl, 0.95) + rng.normal(0, 0.003, ncl)], axis=1
    ).astype(np.float32)
    parts.append(clutter)
    nparts.append(np.tile([0, 0, -1.0], (ncl, 1)).astype(np.float32))
    probs_parts.append(np.full((len(models), ncl), 0.12, np.float32))

    spos = np.concatenate(parts)
    snrm = np.concatenate(nparts)
    probs = np.concatenate(probs_parts, axis=1)
    ns = len(spos)
    cap = cfg.max_scene_points
    assert ns <= cap, (ns, cap)
    sc = spos.mean(0)
    centered = spos - sc

    def pad(a, fill=0.0):
        out = np.full((cap,) + a.shape[1:], fill, np.float32)
        out[:ns] = a
        return jnp.asarray(out)

    scene = ScenePack(
        pos=pad(centered), normal=pad(snrm), rgb=pad(np.zeros_like(spos)),
        pixel=jnp.zeros((cap, 2), jnp.int32),
        class_prob=pad(probs[0]),
        edge_prob=jnp.zeros(cap, jnp.float32),
        valid=jnp.asarray(np.arange(cap) < ns),
        centroid=jnp.asarray(sc),
        grid=build_neighbor_grid(centered, cfg.distance_threshold),
        field=build_dense_field(centered, snrm, cfg.distance_threshold),
        icp_grid=build_neighbor_grid(centered, cfg.icp_max_corr_dist),
        edge_free=jnp.ones((8, 8), bool), has_edge=False,
    )
    probs_pad = np.zeros((len(models), cap), np.float32)
    probs_pad[:, :ns] = probs

    print(f"backend={jax.default_backend()} objects={len(packs)} "
          f"|S|={ns} bases/object={args.bases}", flush=True)
    t0 = time.perf_counter()
    best, poses, nhyp = multi.match_all_objects(
        packs, scene, probs_pad, cfg, seed=0
    )
    jax.block_until_ready(poses)
    print(f"first call (compile): {time.perf_counter()-t0:.1f} s", flush=True)

    bestt = float("inf")
    for _ in range(args.iters):
        t0 = time.perf_counter()
        best, poses, nhyp = multi.match_all_objects(
            packs, scene, probs_pad, cfg, seed=0
        )
        jax.block_until_ready(poses)
        bestt = min(bestt, time.perf_counter() - t0)
    n_obj = len(packs)
    print(f"warm: {bestt*1e3:.0f} ms for {n_obj} objects "
          f"({bestt*1e3/n_obj:.0f} ms/object)", flush=True)

    best = np.asarray(best)
    poses = np.asarray(poses)
    from scipy.spatial import cKDTree

    for o, ((m, _n), g) in enumerate(zip(models, gts)):
        moved = m @ poses[o, :3, :3].T + poses[o, :3, 3]
        gt_pts = m @ g[:3, :3].T + g[:3, 3]
        d, _ = cKDTree(gt_pts).query(moved)
        print(f"object {o}: score {best[o]:.3f}, median NN err "
              f"{np.median(d)*1e3:.2f} mm", flush=True)


if __name__ == "__main__":
    main()
