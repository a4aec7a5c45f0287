"""Round-3 queued probe battery (reconstructed; the original lived in the
gitignored artifacts/ and was wiped). Four probes, each printing a labeled
block; run on the real chip:

  python scripts/probe_battery.py [--probe all|payload|smalltier|fit|gateroof]

1. payload   — exact restricted-NN scorer with vs without the padded-payload
               fast path (ops/gridhash.py build_neighbor_grid(payload=...)),
               plus the baked-prob route (scene_class_prob=None).
2. smalltier — congruent-phase cost decomposition: full phase at G=0/8,
               then the fixed-cost pieces (pair-slot flatten, top_k) alone,
               to see what a sub-256 tier could save.
3. fit       — the fit phase alone at chunk scale.
4. gateroof  — dense_gate Pallas kernel wall time at the top tier shape
               vs the XLA gate path on the same shape.
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
CHUNK = 2048


def _fixture():
    from model_matching_tpu.config import get_preset
    from model_matching_tpu.model import load_model_pack
    from model_matching_tpu.preprocess import preprocess_model
    from model_matching_tpu.scene import load_scene

    out = "artifacts/measure"
    os.makedirs(out, exist_ok=True)
    cfg = dataclasses.replace(
        get_preset("ycb").match, number_of_bases=CHUNK
    )
    model_ply = os.path.join(out, "model_search.ply")
    table_npz = os.path.join(out, "ppf_table.npz")
    if not os.path.exists(table_npz):
        preprocess_model(
            f"{REF}/models/024_bowl/textured_vertices.ply",
            model_ply, table_npz, get_preset("ycb").preprocess,
            verbose=False,
        )
    model = load_model_pack(model_ply, table_npz, cfg.max_model_points)
    scene = load_scene(
        f"{REF}/examples/ycb/rgb.png", f"{REF}/examples/ycb/depth.png",
        f"{REF}/examples/ycb/probability_maps/024_bowl.png", None, cfg,
    )
    return model, scene, cfg


def _pipeline_poses(model, scene, cfg):
    import jax
    from model_matching_tpu.estimator import (
        StocsEstimator, _pair_ep_of, _phase_fit, _phase_sample, _run_congruent,
    )

    est = StocsEstimator(model, scene, cfg)
    ks, kc = jax.random.split(jax.random.PRNGKey(0))
    bases = _phase_sample(ks, model.table, scene.pos, scene.normal,
                          est.class_prob, scene.valid, cfg, CHUNK,
                          est.exists_bits())
    sets = _run_congruent(kc, model, scene, bases, cfg)
    poses, _nsv = _phase_fit(scene.pos, _pair_ep_of(model), scene.centroid,
                             model.centroid, bases, sets)
    jax.block_until_ready(poses.transform)
    return est, bases, sets, poses


def _time(fn, *a, iters=5, **kw):
    import jax
    jax.block_until_ready(fn(*a, **kw))  # compile/warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a, **kw))
        best = min(best, time.perf_counter() - t0)
    return best


def probe_payload():
    import jax
    import jax.numpy as jnp
    from model_matching_tpu import scoring
    from model_matching_tpu.ops.gridhash import build_neighbor_grid

    model, scene, cfg = _fixture()
    est, _bases, _sets, poses = _pipeline_poses(model, scene, cfg)

    valid = np.asarray(scene.valid)
    host_pos = np.asarray(scene.pos)[valid]
    host_nrm = np.asarray(scene.normal)[valid]
    host_prob = np.asarray(scene.class_prob)[valid]
    grids = {
        "scan path (payload off)": (
            build_neighbor_grid(host_pos, cell_size=cfg.distance_threshold,
                                normal=host_nrm, payload=False),
            est.class_prob,
        ),
        "payload rows": (
            build_neighbor_grid(host_pos, cell_size=cfg.distance_threshold,
                                normal=host_nrm),
            est.class_prob,
        ),
        "payload rows + baked prob": (
            build_neighbor_grid(host_pos, cell_size=cfg.distance_threshold,
                                normal=host_nrm, prob=host_prob),
            None,
        ),
    }
    mc = jnp.sum(model.valid.astype(jnp.float32))
    # 64k-hypothesis subset: representative, and keeps the scan path's
    # deep candidate loop off the full 409,600-slot batch
    h = 65536
    tr, tv = poses.transform[:h], poses.valid[:h]
    print(f"== probe 1: exact scorer payload fast path "
          f"(H={h}, M={int(mc)}) ==", flush=True)
    for label, (grid, cp) in grids.items():
        fn = jax.jit(lambda tr, v, g=grid, c=cp: scoring.score_transforms(
            tr, v, model.pos, model.normal, model.valid,
            g, scene.pos, scene.normal, c,
            cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
            model_count=mc, chunk=2048,
        ))
        dt = _time(fn, tr, tv)
        print(f"  {label:28s} {dt*1e3:8.1f} ms "
              f"({h/dt:,.0f} exact hyp/s)", flush=True)


def probe_smalltier():
    import jax
    import jax.numpy as jnp
    from model_matching_tpu.estimator import _run_congruent
    from model_matching_tpu.ppf_table import gather_pair_srcs

    model, scene, cfg = _fixture()
    est, bases, _sets, _poses = _pipeline_poses(model, scene, cfg)
    kc = jax.random.split(jax.random.PRNGKey(0))[1]

    print("== probe 2: congruent cost decomposition ==", flush=True)
    for g in (0, 8, 16):
        c2 = dataclasses.replace(cfg, congruent_sorted_groups=g)
        dt = _time(lambda k, c=c2: _run_congruent(k, model, scene, bases, c),
                   kc)
        print(f"  full phase G={g:2d}:                  {dt*1e3:8.1f} ms",
              flush=True)

    tbl = model.table
    off = jnp.zeros((CHUNK, 128), jnp.int32)
    cnt = jnp.full((CHUNK, 128), 2, jnp.int32)

    def flatten_only(o, c):
        s, ok, t = jax.vmap(
            lambda oo, cc: gather_pair_srcs(tbl, oo, cc, 256)
        )(o, c)
        return s.sum() + ok.sum()

    dt = _time(jax.jit(flatten_only), off, cnt)
    print(f"  {CHUNK}x pair-slot flatten(cap 256): {dt*1e3:8.1f} ms",
          flush=True)

    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 2**30, (CHUNK, 256 * 16), dtype=np.int32))

    def topks(xx):
        return jax.vmap(lambda r: jax.lax.top_k(r, 200)[0])(xx).sum()

    dt = _time(jax.jit(topks), x)
    print(f"  {CHUNK}x top_k(4096->200) alone:     {dt*1e3:8.1f} ms",
          flush=True)


def probe_fit():
    import jax
    from model_matching_tpu.estimator import _pair_ep_of, _phase_fit

    model, scene, cfg = _fixture()
    _est, bases, sets, _poses = _pipeline_poses(model, scene, cfg)
    print("== probe 3: fit phase ==", flush=True)
    dt = _time(_phase_fit, scene.pos, _pair_ep_of(model), scene.centroid,
               model.centroid, bases, sets)
    n = CHUNK * cfg.maximum_congruent_sets
    print(f"  fit {n} hypothesis slots: {dt*1e3:8.1f} ms "
          f"({n/dt/1e6:.1f} M fits/s)", flush=True)


def probe_gateroof():
    import jax
    import jax.numpy as jnp
    from model_matching_tpu.ops import pallas_congruent as pc

    print("== probe 4: dense gate kernel vs XLA (top-tier shape) ==",
          flush=True)
    rng = np.random.default_rng(3)
    for cap, qb in ((8192, 4096), (4096, 4096)):
        pf = jnp.asarray(rng.normal(0, 1, (16, cap)).astype(np.float32))
        qf = jnp.asarray(rng.normal(0, 1, (16, cap)).astype(np.float32))
        rp = jnp.asarray(rng.integers(0, 2**31, cap, dtype=np.int32))
        rq = jnp.asarray(rng.integers(0, 2**31, cap, dtype=np.int32))

        def kern(pf, qf, rp, rq):
            return pc.dense_gate(
                pf, qf, rp, rq, jnp.float32(0.3), 0.3, jnp.float32(5e-3),
                jnp.int32(0x7FFF0000 & ~0x7FFF), jnp.int32(1 << 14),
                q_tile=qb, p_tile=256,
                interpret=jax.default_backend() != "tpu",
            )

        dt = _time(jax.jit(kern), pf, qf, rp, rq)
        ge = cap * cap
        print(f"  dense_gate cap={cap} q_tile={qb}: {dt*1e3:8.2f} ms "
              f"({ge/dt/1e9:6.1f} G gate-elems/s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default="all")
    args = ap.parse_args()
    import jax
    from model_matching_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    print(f"backend={jax.default_backend()}", flush=True)
    probes = {
        "payload": probe_payload,
        "smalltier": probe_smalltier,
        "fit": probe_fit,
        "gateroof": probe_gateroof,
    }
    for name, fn in probes.items():
        if args.probe in ("all", name):
            fn()


if __name__ == "__main__":
    main()
