"""Command-line interface with the reference's two entry points.

    python -m model_matching_tpu.cli model-preprocess <object> [options]
    python -m model_matching_tpu.cli stocs-single <scene_path> <object> [options]

Drop-in parity with the reference executables (reference:
src/model_preprocess.cpp:14-39, src/stocs_match_one_object.cpp:187-215),
minus the recompile-to-configure model: the repo path, dataset preset and
every constant are flags. Artifact names and formats match:
models/<object>/model_search.ply (+ ppf_table.npz replacing the Boost
`ppf_map`), <scene>/best_pose_candidate_<object>.txt (12 floats, row-major
3x4, one line), and <scene>/dbg/{sampled_scene.ply,best_pose.ply,scene.ply}.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import shutil
import sys

import numpy as np


def _add_common(p):
    p.add_argument("--preset", default="ycb", help="ycb | linemod | packed")
    p.add_argument("--repo-path", default="/root/reference",
                   help="root containing models/<object>/")
    p.add_argument("--output-root", default=None,
                   help="writable root for artifacts (defaults to repo path; "
                        "use when the repo is read-only)")


#: The read-only reference checkout; never write artifacts into it.
_REFERENCE_ROOT = "/root/reference"


def _guard_writable(path: str) -> None:
    """Refuse to write artifacts under the read-only reference tree.

    The reference CLI writes next to its inputs
    (stocs_match_one_object.cpp:173-180); ours keeps that default for parity
    but the bundled fixtures live in a read-only checkout, so writing there
    must fail loudly with the flag that fixes it."""
    real = os.path.realpath(path)
    if real == _REFERENCE_ROOT or real.startswith(_REFERENCE_ROOT + os.sep):
        raise SystemExit(
            f"error: refusing to write artifacts under the read-only "
            f"reference tree ({real}); pass --output-root <writable dir>"
        )


def _check_scene_inputs(scene_path, objects):
    """Friendly error instead of a loader traceback when the scene is
    missing rgb/depth/probability-map files (each bundled example ships
    maps only for its own object)."""
    paths = [
        os.path.join(scene_path, "rgb.png"),
        os.path.join(scene_path, "depth.png"),
    ] + [
        os.path.join(scene_path, "probability_maps", f"{o}.png")
        for o in objects
    ]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        print("error: missing scene inputs:\n  " + "\n  ".join(missing))
    return not missing


def _model_dirs(args, object_name):
    src_root = os.path.join(args.repo_path, "models", object_name)
    out_root = os.path.join(
        args.output_root or args.repo_path, "models", object_name
    )
    return src_root, out_root


def cmd_model_preprocess(argv):
    from .config import get_preset
    from .preprocess import preprocess_model

    p = argparse.ArgumentParser(prog="model-preprocess")
    p.add_argument("object")
    _add_common(p)
    p.add_argument("--voxel-size", type=float, default=None)
    p.add_argument("--normal-radius", type=float, default=None)
    p.add_argument("--model-scale", type=float, default=None)
    args = p.parse_args(argv)

    pre = get_preset(args.preset).preprocess
    overrides = {
        k.replace("-", "_"): v
        for k, v in (
            ("voxel_size", args.voxel_size),
            ("normal_radius", args.normal_radius),
            ("model_scale", args.model_scale),
        )
        if v is not None
    }
    pre = dataclasses.replace(pre, **overrides)

    src_root, out_root = _model_dirs(args, args.object)
    src = os.path.join(src_root, "textured_vertices.ply")
    if not os.path.exists(src):
        print(f"error: model source {src} not found")
        return 1
    dst_model = os.path.join(out_root, "model_search.ply")
    dst_table = os.path.join(out_root, "ppf_table.npz")
    _guard_writable(out_root)
    os.makedirs(out_root, exist_ok=True)
    for f in (dst_model, dst_table):
        if os.path.exists(f):
            os.remove(f)

    n, maxd = preprocess_model(src, dst_model, dst_table, pre)
    print(f"wrote {dst_model} ({n} points) and {dst_table}")
    return 0


def cmd_stocs_single(argv):
    from .config import get_preset
    from .estimator import StocsEstimator
    from .io import ply
    from .model import load_model_pack
    from .ops.geometry import transform_points
    from .scene import load_scene
    from .utils.host import fetch

    p = argparse.ArgumentParser(prog="stocs-single")
    p.add_argument("scene_path")
    p.add_argument("object")
    _add_common(p)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--number-of-bases", type=int, default=None)
    p.add_argument("--no-coarse-to-fine", action="store_true",
                   help="score every hypothesis with the full model")
    p.add_argument("--no-refine", action="store_true",
                   help="skip the point-to-plane ICP polish of the winner")
    p.add_argument("--cluster", action="store_true",
                   help="also write clustered_poses_<object>.txt")
    p.add_argument("--heatmap", action="store_true",
                   help="write probability heatmap + pose overlay PNGs")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of the run to DIR")
    p.add_argument("--sweep", type=int, default=None, metavar="TOTAL_BASES",
                   help="large hypothesis sweep: process TOTAL_BASES class "
                        "bases in chunks and cluster the pooled winners")
    p.add_argument("--sweep-chunk", type=int, default=2048, metavar="BASES",
                   help="bases per compiled sweep chunk (default 2048)")
    p.add_argument("--sweep-checkpoint", default=None, metavar="PATH",
                   help="persist sweep state to PATH every "
                        "--sweep-checkpoint-every chunks; re-running with "
                        "the same arguments resumes (bit-identical to an "
                        "uninterrupted sweep); removed on completion")
    p.add_argument("--sweep-checkpoint-every", type=int, default=8,
                   metavar="CHUNKS")
    p.add_argument("--sweep-stop-after", type=int, default=None,
                   metavar="CHUNKS",
                   help="process at most CHUNKS chunks this invocation, "
                        "checkpoint, and exit (time-sliced operation; "
                        "requires --sweep-checkpoint)")
    args = p.parse_args(argv)

    if args.sweep_stop_after and not args.sweep_checkpoint:
        print("error: --sweep-stop-after requires --sweep-checkpoint "
              "(the remaining chunks must be resumable)")
        return 1

    cfg = get_preset(args.preset).match
    if args.number_of_bases is not None:
        cfg = dataclasses.replace(cfg, number_of_bases=args.number_of_bases)
    cfg = dataclasses.replace(
        cfg, seed=args.seed, refine_best_pose=not args.no_refine
    )

    _src_root, model_root = _model_dirs(args, args.object)
    model_ply = os.path.join(model_root, "model_search.ply")
    table_path = os.path.join(model_root, "ppf_table.npz")

    scene_out = (
        os.path.join(args.output_root, os.path.basename(args.scene_path.rstrip("/")))
        if args.output_root
        else args.scene_path
    )
    _guard_writable(scene_out)
    dbg = os.path.join(scene_out, "dbg")
    shutil.rmtree(dbg, ignore_errors=True)
    os.makedirs(dbg, exist_ok=True)

    if not os.path.exists(model_ply):
        print(f"error: {model_ply} not found — run "
              f"'model-preprocess {args.object}' first")
        return 1
    print("############# LOADING OBJECT MAPS ################")
    model = load_model_pack(model_ply, table_path, cfg.max_model_points)
    print(f"|M| = {int(model.count())}, pairs = {model.table.num_pairs}")
    print("############# LOADING OBJECT COMPLETE ################")

    if not _check_scene_inputs(args.scene_path, [args.object]):
        return 1
    edge_path = os.path.join(args.scene_path, "probability_maps", "edge.png")
    scene = load_scene(
        os.path.join(args.scene_path, "rgb.png"),
        os.path.join(args.scene_path, "depth.png"),
        os.path.join(args.scene_path, "probability_maps", f"{args.object}.png"),
        edge_path if os.path.exists(edge_path) else None,
        cfg,
    )
    # one batched fetch for the debug artifacts (utils/host.py)
    sc = fetch({
        k: getattr(scene, k)
        for k in ("pos", "normal", "rgb", "valid", "centroid")
    } | {"count": scene.count()})
    print(f"|S|: {int(sc['count'])}")
    live = sc["valid"]
    ply.write_ply(
        os.path.join(dbg, "sampled_scene.ply"),
        sc["pos"][live] + sc["centroid"], sc["normal"][live], sc["rgb"][live],
    )

    print(f"############# RUNNING STOCS for Scene: {args.scene_path}, "
          f"Object: {args.object} ##############")
    est = StocsEstimator(model, scene, cfg)

    if args.sweep:
        import jax as _jax

        n_dev = _jax.device_count()
        if scene.has_edge and _jax.process_count() > 1:
            # the instance path's sequential sampler runs outside the mesh
            # and does not replicate across DCN hosts; keep the reference
            # semantics on one process rather than silently switching to
            # class sampling (stocs.cpp:559-751)
            print("note: edge-mapped scene — instance-mode sweeps shard "
                  "over ICI only (single process); multi-host sharding "
                  "applies to class-path scenes")
            n_dev = 1
        if n_dev > 1:
            # shard the hypothesis axis over the mesh (instance-mode
            # scenes sample sequentially outside the mesh and shard
            # phases 2-4); chunk divisibility is guaranteed by rounding
            # up to the device count
            from .parallel.sharding import make_mesh, run_sweep_sharded

            chunk = -(-args.sweep_chunk // n_dev) * n_dev
            best_lcp, best_w, cl_t, cl_s, stats = run_sweep_sharded(
                make_mesh(), model, scene, cfg, args.sweep, chunk=chunk,
                checkpoint_path=args.sweep_checkpoint,
                checkpoint_every=args.sweep_checkpoint_every,
                stop_after_chunks=args.sweep_stop_after,
            )
        else:
            best_lcp, best_w, cl_t, cl_s, stats = est.run_sweep(
                args.sweep, chunk=args.sweep_chunk,
                checkpoint_path=args.sweep_checkpoint,
                checkpoint_every=args.sweep_checkpoint_every,
                stop_after_chunks=args.sweep_stop_after,
            )
        if not stats.get("completed", True):
            print(f"sweep: stopped after chunk {stats['next_chunk']} — "
                  f"checkpoint at {args.sweep_checkpoint}; re-run the same "
                  f"command to resume")
            return 0
        out_file = os.path.join(
            scene_out, f"best_pose_candidate_{args.object}.txt"
        )
        os.makedirs(scene_out, exist_ok=True)
        with open(out_file, "w") as f:
            f.write(" ".join(
                f"{best_w[i, j]:g}" for i in range(3) for j in range(4)
            ) + "\n")
        print(f"wrote {out_file} (sweep best lcp {best_lcp:.4f})")
        return 0

    profile_ctx = None
    if args.profile:
        import jax as _jax

        profile_ctx = _jax.profiler.trace(args.profile)
        profile_ctx.__enter__()
    try:
        result = est.run(coarse_to_fine=not args.no_coarse_to_fine)
    finally:
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)
            print(f"profiler trace written to {args.profile}")

    if est.seg_masks is not None:
        # seg_mask_<n>.png debug artifacts (reference: stocs.cpp:625)
        from .io.image import write_u8

        masks = np.asarray(est.seg_masks)
        for i in range(1, masks.shape[0]):
            if masks[i].any():
                write_u8(
                    os.path.join(dbg, f"seg_mask_{i}.png"),
                    masks[i].astype(np.uint8) * 255,
                )

    if result.best_index >= 0:
        t = result.best_world_transform
        out_file = os.path.join(
            scene_out, f"best_pose_candidate_{args.object}.txt"
        )
        os.makedirs(scene_out, exist_ok=True)
        with open(out_file, "w") as f:
            f.write(" ".join(f"{t[i, j]:g}" for i in range(3) for j in range(4)))
            f.write("\n")
        print(f"wrote {out_file}")

        # visualize_best_pose parity (stocs.hpp:137-149): transformed model +
        # scene, both in the centered frame
        mh = fetch(dict(pos=model.pos, valid=model.valid))
        mp = mh["pos"][mh["valid"]]
        moved = np.asarray(
            transform_points(result.best_transform, mp)
        )
        ply.write_ply(os.path.join(dbg, "best_pose.ply"), moved)
        ply.write_ply(
            os.path.join(dbg, "scene.ply"), sc["pos"][live],
            sc["normal"][live], sc["rgb"][live],
        )
    else:
        print("no pose found")

    if args.heatmap:
        from . import viz

        hh = fetch(dict(
            pix=scene.pixel, prob=est.class_prob,
            mpos=model.pos, mvalid=model.valid, mc=model.centroid,
        ))
        viz.visualize_heatmap(
            hh["pix"][live], hh["prob"][live], [],
            os.path.join(dbg, "probability_heatmap.png"),
            cfg.image_width, cfg.image_height,
        )
        if result.best_index >= 0:
            mp = hh["mpos"][hh["mvalid"]] + hh["mc"]
            viz.overlay_pose(
                os.path.join(args.scene_path, "rgb.png"), mp,
                result.best_world_transform, *cfg.camera.as_tuple(),
                os.path.join(dbg, f"overlay_{args.object}.png"),
            )

    if args.cluster and result.best_index >= 0:
        ctrs, clcp = est.cluster_poses(result)
        cpath = os.path.join(scene_out, f"clustered_poses_{args.object}.txt")
        with open(cpath, "w") as f:
            for t, s in zip(ctrs, clcp):
                row = " ".join(
                    f"{t[i, j]:g}" for i in range(3) for j in range(4)
                )
                f.write(f"{row} {s:g}\n")
        print(f"wrote {cpath} ({len(ctrs)} clusters)")

    for phase, secs in result.timings.items():
        print(f"  {phase}: {secs*1e3:.1f} ms")
    print(f"  hypotheses/sec: {result.stats['hypotheses_per_sec']:.3g}")
    return 0


def cmd_stocs_batch(argv):
    """Match several objects against one scene in a single process: every
    phase is one jitted device program whose shapes are object-independent,
    so objects after the first reuse the compiled executables (the batched
    multi-object configuration of BASELINE.json; the reference runs one
    object per process, src/stocs_match_one_object.cpp:188-214)."""
    import time as _time

    p = argparse.ArgumentParser(prog="stocs-batch")
    p.add_argument("scene_path")
    p.add_argument("objects", help="comma-separated object names")
    _add_common(p)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--number-of-bases", type=int, default=None)
    args = p.parse_args(argv)

    objects = [o for o in args.objects.split(",") if o]
    results = {}
    for i, obj in enumerate(objects):
        t0 = _time.perf_counter()
        sub = [args.scene_path, obj, "--preset", args.preset,
               "--repo-path", args.repo_path, "--seed", str(args.seed)]
        if args.output_root:
            sub += ["--output-root", args.output_root]
        if args.number_of_bases is not None:
            sub += ["--number-of-bases", str(args.number_of_bases)]
        cmd_stocs_single(sub)
        results[obj] = _time.perf_counter() - t0
        print(f"[batch] {obj}: {results[obj]:.1f}s"
              + (" (includes compile)" if i == 0 else " (cached programs)"))
    return 0


def cmd_stocs_multi(argv):
    """All objects against one scene in ONE device program (shared scene
    geometry, per-object probability vectors) — see multi.py."""
    from .config import get_preset
    from .model import load_model_pack
    from .multi import match_all_objects
    from .scene import load_scene_multi

    p = argparse.ArgumentParser(prog="stocs-multi")
    p.add_argument("scene_path")
    p.add_argument("objects", help="comma-separated object names")
    _add_common(p)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--number-of-bases", type=int, default=None)
    args = p.parse_args(argv)

    cfg = get_preset(args.preset).match
    if args.number_of_bases is not None:
        cfg = dataclasses.replace(cfg, number_of_bases=args.number_of_bases)

    objects = [o for o in args.objects.split(",") if o]
    if not _check_scene_inputs(args.scene_path, objects):
        return 1
    for obj in objects:
        _s, root = _model_dirs(args, obj)
        if not os.path.exists(os.path.join(root, "model_search.ply")):
            print(f"error: {root}/model_search.ply not found — run "
                  f"'model-preprocess {obj}' first")
            return 1
    models = []
    for obj in objects:
        _s, root = _model_dirs(args, obj)
        models.append(load_model_pack(
            os.path.join(root, "model_search.ply"),
            os.path.join(root, "ppf_table.npz"),
            cfg.max_model_points,
            standardize=True,
        ))
    edge_path = os.path.join(args.scene_path, "probability_maps", "edge.png")
    scene, probs = load_scene_multi(
        os.path.join(args.scene_path, "rgb.png"),
        os.path.join(args.scene_path, "depth.png"),
        [os.path.join(args.scene_path, "probability_maps", f"{o}.png")
         for o in objects],
        edge_path if os.path.exists(edge_path) else None, cfg,
    )
    if scene.has_edge:
        # edge-mapped scene: match_all_objects runs the reference's
        # instance-path semantics natively since round 5 — each object's
        # sequential flood-fill/dispersion chain samples outside the
        # program against its own prior (the reference's one-process-
        # per-object isolation, stocs_match_one_object.cpp:89-93), and
        # phases 2-4 of ALL objects run in the one fused program
        print("edge-mapped scene: instance path (per-object sequential "
              "dispersion decay; fused phases 2-4)")
    best, poses, nhyp = match_all_objects(models, scene, probs, cfg,
                                          seed=args.seed)
    out_root = (
        os.path.join(args.output_root,
                     os.path.basename(args.scene_path.rstrip("/")))
        if args.output_root else args.scene_path
    )
    _guard_writable(out_root)
    os.makedirs(out_root, exist_ok=True)
    for o, obj in enumerate(objects):
        t = np.asarray(poses[o])
        lcp = float(best[o])
        if lcp <= 0.0:
            # best_pose returns idx=-1 (masked to 0 in multi.py) when no
            # hypothesis scored > 0 — the transform is arbitrary. Match
            # stocs-single / the reference ("no pose found", nothing
            # written, stocs_match_one_object.cpp:171-184).
            print(f"{obj}: no pose found (0 scoring hypotheses of "
                  f"{int(nhyp[o])})")
            continue
        path = os.path.join(out_root, f"best_pose_candidate_{obj}.txt")
        with open(path, "w") as f:
            f.write(" ".join(
                f"{t[i, j]:g}" for i in range(3) for j in range(4)
            ) + "\n")
        print(f"{obj}: lcp={lcp:.4f} hypotheses={int(nhyp[o])} -> {path}")
    return 0


def cmd_serve(argv):
    """Long-running estimation service: models and compiled device programs
    stay resident; requests stream on stdin as '<scene_path> <object>' lines
    and each response is one line 'OK <12 pose floats> <lcp>' or
    'ERR <reason>'. Amortizes process startup and XLA compilation across
    scenes — the deployment shape the one-shot reference binaries
    (src/stocs_match_one_object.cpp:188-214) cannot offer."""
    from .config import get_preset
    from .estimator import StocsEstimator
    from .model import load_model_pack
    from .scene import load_scene

    p = argparse.ArgumentParser(prog="serve")
    _add_common(p)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--number-of-bases", type=int, default=None)
    args = p.parse_args(argv)

    cfg = get_preset(args.preset).match
    if args.number_of_bases is not None:
        cfg = dataclasses.replace(cfg, number_of_bases=args.number_of_bases)
    cfg = dataclasses.replace(cfg, seed=args.seed)

    models = {}
    print("READY", flush=True)
    for line in sys.stdin:
        parts = line.split()
        if not parts:
            continue
        if parts[0] in ("quit", "exit"):
            break
        if len(parts) != 2:
            print("ERR usage: <scene_path> <object>", flush=True)
            continue
        scene_path, obj = parts
        try:
            if obj not in models:
                _s, root = _model_dirs(args, obj)
                models[obj] = load_model_pack(
                    os.path.join(root, "model_search.ply"),
                    os.path.join(root, "ppf_table.npz"),
                    cfg.max_model_points,
                    standardize=True,
                )
            edge = os.path.join(scene_path, "probability_maps", "edge.png")
            scene = load_scene(
                os.path.join(scene_path, "rgb.png"),
                os.path.join(scene_path, "depth.png"),
                os.path.join(scene_path, "probability_maps", f"{obj}.png"),
                edge if os.path.exists(edge) else None,
                cfg,
            )
            result = StocsEstimator(models[obj], scene, cfg).run(verbose=False)
            if result.best_index < 0:
                print("ERR no pose found", flush=True)
                continue
            t = result.best_world_transform
            vals = " ".join(f"{t[i, j]:g}" for i in range(3) for j in range(4))
            print(f"OK {vals} {result.best_lcp:g}", flush=True)
        except Exception as e:  # keep serving
            print(f"ERR {type(e).__name__}: {e}", flush=True)
    return 0


def cmd_eval(argv):
    """Pose-accuracy evaluation: ADD / ADD-S / pass-rate of estimated pose
    file(s) against ground-truth pose file(s) over a model PLY — the
    runnable form of BASELINE.json's "ADD-S parity" acceptance criterion
    (the reference bundles no GT, reference README.md:4; point this at any
    dataset's GT the day it appears). Emits one JSON document."""
    import json

    from . import eval as ev
    from .io import ply

    p = argparse.ArgumentParser(prog="eval")
    p.add_argument("est", help="estimated pose file (one pose per line, "
                               "12 or 16 floats) or directory of "
                               "best_pose_candidate_*.txt files")
    p.add_argument("gt", help="ground-truth pose file, a directory with "
                              "files named like the estimates, or a BOP "
                              "scene_gt.json (then pass --im-id/--obj-id)")
    p.add_argument("--im-id", type=int, default=None,
                   help="BOP image id inside scene_gt.json")
    p.add_argument("--obj-id", type=int, default=None,
                   help="BOP object id inside scene_gt.json (multiple GT "
                        "instances score each estimate against its "
                        "best-matching instance)")
    p.add_argument("--model", required=True,
                   help="model PLY the poses transform (model_search.ply "
                        "or textured_vertices.ply)")
    p.add_argument("--model-scale", type=float, default=1.0,
                   help="scale applied to model vertices (1/1000 for "
                        "mm-unit files, as in the linemod preset)")
    p.add_argument("--threshold-fraction", type=float, default=0.1,
                   help="pass if metric < fraction * model diameter")
    p.add_argument("--out", default=None, help="also write the JSON here")
    args = p.parse_args(argv)

    if not os.path.exists(args.model):
        print(f"error: model {args.model} not found")
        return 1
    mpos, _n, _c = ply.read_ply_cloud(args.model, scale=args.model_scale)

    bop_gt = None
    if args.gt.endswith(".json"):
        # BOP-format ground truth (io/bop.py): one command from a mounted
        # BOP dataset to the ADD-S table — BASELINE.json's accuracy
        # criterion the day real YCB/LINEMOD annotations are available
        from .io import bop

        if args.im_id is None or args.obj_id is None:
            print("error: a scene_gt.json ground truth needs --im-id "
                  "and --obj-id")
            return 1
        try:
            bop_gt = bop.gt_poses(
                bop.load_scene_gt(args.gt), args.im_id, args.obj_id
            )
        except KeyError as e:
            print(f"error: {e}")
            return 1

    if os.path.isdir(args.est):
        names = sorted(
            f for f in os.listdir(args.est)
            if f.startswith("best_pose_candidate_") and f.endswith(".txt")
        )
        if not names:
            print(f"error: no best_pose_candidate_*.txt under {args.est}")
            return 1
        if bop_gt is not None:
            # one scene_gt.json serves every estimate file
            pairs = [(os.path.join(args.est, n), args.gt) for n in names]
        else:
            pairs = [(os.path.join(args.est, n), os.path.join(args.gt, n))
                     for n in names]
            missing = [g for _, g in pairs if not os.path.exists(g)]
            if missing:
                print("error: missing ground-truth files:\n  "
                      + "\n  ".join(missing))
                return 1
    else:
        pairs = [(args.est, args.gt)]

    dia = ev.model_diameter(mpos)
    per_file = {}
    for est_path, gt_path in pairs:
        per_file[os.path.basename(est_path)] = ev.evaluate_pose_files(
            est_path, gt_path, mpos,
            threshold_fraction=args.threshold_fraction, diameter=dia,
            gt_poses=bop_gt,
        )
    all_add = [v for r in per_file.values() for v in r["add"]]
    all_adds = [v for r in per_file.values() for v in r["adds"]]
    thr = args.threshold_fraction * dia
    report = {
        "model": args.model,
        "model_diameter": dia,
        "threshold": thr,
        "num_poses": len(all_add),
        "add_mean": float(np.mean(all_add)),
        "adds_mean": float(np.mean(all_adds)),
        "add_pass_rate": float(np.mean([v < thr for v in all_add])),
        "adds_pass_rate": float(np.mean([v < thr for v in all_adds])),
        "files": per_file,
    }
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        _guard_writable(args.out)
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0


def main(argv=None):
    from .parallel.sharding import init_distributed
    from .utils.cache import enable_compilation_cache

    # multi-host (DCN) bootstrap; no-op unless a coordinator is configured
    # via JAX_COORDINATOR_ADDRESS. Must run before any device access.
    init_distributed()
    enable_compilation_cache()
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "model-preprocess":
        return cmd_model_preprocess(rest)
    if cmd == "stocs-single":
        return cmd_stocs_single(rest)
    if cmd == "stocs-batch":
        return cmd_stocs_batch(rest)
    if cmd == "stocs-multi":
        return cmd_stocs_multi(rest)
    if cmd == "serve":
        return cmd_serve(rest)
    if cmd == "eval":
        return cmd_eval(rest)
    print(
        f"unknown command {cmd!r}; use model-preprocess, stocs-single, "
        "stocs-batch, stocs-multi, serve or eval"
    )
    return 2


if __name__ == "__main__":
    sys.exit(main())
