"""Multi-object matching in one device program (BASELINE config 4).

The reference matches one object per process invocation (reference:
src/stocs_match_one_object.cpp:188-214). Here all objects share one scene
geometry (the union of their probability supports — one back-projection,
one voxel filter, one NN grid/field) and differ only in their probability
vectors and model packs. Every model's PPF tables are rebuilt at common
power-of-two sizes (ppf_table.resize_table), the model clouds padded to a
common lane multiple, and the stacked [O, ...] packs are driven through ONE
lax.map over objects: the whole pipeline — sampling, congruent extraction,
fit, scoring, per-object argmax — compiles exactly once regardless of how
many objects the scene holds (a 30-object YCB scene costs the same compile
as a 2-object one), and the congruent tier dispatch stays a real lax.cond
inside the mapped body (a vmap would have flattened it into
run-every-tier selects).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import congruent, sampling, scoring
from .config import MatchConfig
from .model import ModelPack, build_pair_ep
from .ops import fit as fit_ops
from .ppf_table import resize_table
from .scene import ScenePack
from .utils.host import fetch


def align_models(models: Sequence[ModelPack]) -> List[ModelPack]:
    """Rebuild the packs so every array shape matches across objects."""
    exist = max(int(m.table.exist_keys.shape[0]) for m in models)
    bins = max(int(m.table.bin_keys.shape[0]) for m in models)
    pairs = max(int(m.table.pairs.shape[0]) for m in models)
    mcap = max(int(m.pos.shape[0]) for m in models)
    # the stacked tables must share one treedef: direct-mapped twins get a
    # common size, or are dropped entirely if any model's key space
    # exceeded DIRECT_CAP at load
    if any(m.table.bin_direct is None for m in models):
        direct = None
    else:
        direct = max(int(m.table.bin_direct.shape[0]) for m in models)

    out = []
    for m in models:
        t = resize_table(m.table, exist, bins, pairs, direct_size=direct)
        n = m.pos.shape[0]

        def pad(a):
            if a.shape[0] == mcap:
                return a
            w = np.zeros((mcap - n,) + a.shape[1:], np.asarray(a).dtype)
            return jnp.asarray(np.concatenate([np.asarray(a), w]))

        ppos = pad(m.pos)
        out.append(
            ModelPack(
                pos=ppos, normal=pad(m.normal), rgb=pad(m.rgb),
                valid=pad(m.valid), centroid=m.centroid, table=t,
                # endpoint rows from the ALIGNED table so every object's
                # pair_ep stacks to one [O, pairs, 6] leaf (and the fused
                # program gets the gate's ep fast path + the 2-row fit)
                pair_ep=build_pair_ep(ppos, t.pairs),
            )
        )
    # equalize the static probe bounds so the stacked packs share a treedef
    ep = max(m.table.exist_max_probes for m in out)
    bp = max(m.table.bin_max_probes for m in out)
    for i, m in enumerate(out):
        out[i] = dataclasses.replace(
            m,
            table=dataclasses.replace(
                m.table, exist_max_probes=ep, bin_max_probes=bp
            ),
        )
    return out


def stack_models(aligned: Sequence[ModelPack]) -> ModelPack:
    """Stack shape-aligned packs into one pack with a leading object axis
    (every array leaf becomes [O, ...]; the static table metadata must be
    identical across objects, which align_models guarantees)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *aligned)


def _match_one(model: ModelPack, scene: ScenePack, prior: jax.Array,
               okey: jax.Array, cfg: MatchConfig,
               d2_implied: bool = False):
    """One object's full match: the reference's whole online run
    (src/stocs_match_one_object.cpp:51-185) as a fixed-shape program."""
    k_sample, k_cong = jax.random.split(okey)
    bases = sampling.sample_class_bases(
        k_sample, model.table, scene.pos, scene.normal, prior,
        scene.valid & (prior > 0),
        num_bases=cfg.number_of_bases,
        tr_disc=cfg.ppf_tr_discretization,
        rot_disc=cfg.ppf_rot_discretization,
        plane_threshold=cfg.plane_threshold,
        min_distance_base=cfg.min_distance_base,
        internal_angle_threshold=cfg.internal_angle_threshold,
    )
    return _match_tail(
        model, scene, prior, k_cong, bases, cfg, d2_implied
    )


def _match_tail(model: ModelPack, scene: ScenePack, prior: jax.Array,
                k_cong: jax.Array, bases, cfg: MatchConfig,
                d2_implied: bool):
    """Phases 2-4 (congruent -> fit -> score) + per-object argmax for
    already-sampled bases — shared by the class-sampling program
    (_match_one) and the instance-mode presampled program, whose
    sequential flood-fill sampling runs outside the fused lax.map.
    `prior` is the object's sampling-time (possibly decayed) prior; the
    score reads it explicitly, mirroring the single-object instance
    path (estimator._phase_score with the decayed class_prob)."""
    sets = congruent.extract_congruent_sets(
        k_cong, model.table, model.pos, scene.pos, scene.normal,
        bases.indices, bases.invariant1, bases.invariant2, bases.valid,
        cfg, pair_ep=model.pair_ep, d2_implied=d2_implied,
    )
    b, k, _ = sets.pairs.shape
    scene_quad = jnp.broadcast_to(
        scene.pos[bases.indices][:, None], (b, k, 4, 3)
    )
    ep = (
        model.pair_ep if model.pair_ep is not None
        else build_pair_ep(model.pos, model.table.pairs)
    )
    # 2 endpoint-row gathers per hypothesis (estimator._ep_quad rationale)
    model_quad = ep[sets.pairs].reshape(b, k, 4, 3)
    fits = fit_ops.fit_congruent_pairs(
        scene_quad, model_quad, scene.centroid, model.centroid
    )
    valid = (fits["valid"] & sets.quad_valid & bases.valid[:, None]).reshape(-1)
    scores = scoring.score_hybrid(
        fits["transform"].reshape(-1, 4, 4), valid,
        model.pos, model.normal, model.valid,
        scene.field, scene.grid, scene.pos, scene.normal, prior,
        cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
        model_count=jnp.sum(model.valid.astype(jnp.float32)),
        compact_cap=cfg.score_compact_cap,
        mid_cap=cfg.score_mid_cap,
    )
    idx, best = scoring.best_pose(scores)
    pose = fits["world_transform"].reshape(-1, 4, 4)[jnp.maximum(idx, 0)]
    return best, pose, jnp.sum(valid.astype(jnp.int32))


@partial(jax.jit, static_argnames=("cfg", "d2_implied"))
def _match_all(stacked: ModelPack, scene: ScenePack, probs: jax.Array,
               keys: jax.Array, cfg: MatchConfig, d2_implied: bool = False):
    """One program: every object's full match as a lax.map over the stacked
    pack. probs [O, P], keys [O, 2]. d2_implied must hold for EVERY
    stacked object (match_all_objects resolves it on the concrete pack)."""
    return jax.lax.map(
        lambda args: _match_one(args[0], scene, args[1], args[2], cfg,
                                d2_implied=d2_implied),
        (stacked, probs, keys),
    )


@partial(jax.jit, static_argnames=("cfg", "d2_implied"))
def _match_all_presampled(stacked: ModelPack, scene: ScenePack,
                          probs: jax.Array, keys: jax.Array,
                          bidx: jax.Array, inv1: jax.Array,
                          inv2: jax.Array, bvalid: jax.Array,
                          cfg: MatchConfig, d2_implied: bool = False):
    """Instance-mode multi-object program: phases 2-4 fused over the
    object axis for PRE-SAMPLED bases. The reference dispatches the
    edge-aware instance path per object process
    (stocs_match_one_object.cpp:89-93, stocs.cpp:559-751); its
    sequential flood-fill sampling cannot live inside the fused lax.map,
    so match_all_objects samples each object's chain outside (each
    object decays its OWN prior, exactly like the reference's
    one-process-per-object runs) and this program runs everything after.
    probs [O, P] are the per-object sampling-time DECAYED priors; bidx
    [O, B, 4], inv1/inv2 [O, B], bvalid [O, B]; keys [O, 2] are the
    per-object congruent keys."""
    def one(args):
        model, prior, kc, bi, i1, i2, bv = args
        bases = sampling.SampledBases(bi, i1, i2, bv)
        return _match_tail(
            model, scene, prior, kc, bases, cfg, d2_implied
        )

    return jax.lax.map(
        one, (stacked, probs, keys, bidx, inv1, inv2, bvalid)
    )


def _match_all_sharded(mesh, stacked: ModelPack, scene: ScenePack,
                       probs: jax.Array, keys: jax.Array, cfg: MatchConfig,
                       d2_implied: bool, n_obj: int, presampled=None):
    """The multi-object program sharded over the mesh's object axis: each
    device lax.maps the same fused per-object program over its slice of
    the stacked packs; the scene (shared union geometry) is replicated.
    No communication at all — objects are independent; jit gathers the
    per-object outputs. Bit-identical to _match_all on the same inputs
    (the per-object computation does not depend on batch composition).
    `presampled` (instance mode): (bidx, inv1, inv2, bvalid) [O, ...]
    arrays, sharded over the object axis like the packs."""
    from jax.sharding import PartitionSpec as P

    from .parallel.sharding import _globalize

    n_dev = mesh.devices.size
    pad = (-n_obj) % n_dev

    def pad_rep(a):
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])]
        )

    if pad:
        stacked = jax.tree.map(pad_rep, stacked)
        probs = jnp.concatenate(
            [probs, jnp.zeros((pad, probs.shape[1]), probs.dtype)]
        )
        keys = pad_rep(keys)
        if presampled is not None:
            # replicate the last object's bases but mark them INVALID:
            # zero-prob padding cannot re-sample, so the padding rows
            # must fail like the class path's zero-mass bases
            bi, i1, i2, bv = presampled
            presampled = (
                pad_rep(bi), pad_rep(i1), pad_rep(i2),
                jnp.concatenate(
                    [bv, jnp.zeros((pad,) + bv.shape[1:], bv.dtype)]
                ),
            )
    ax = mesh.axis_names[0]
    op = P(ax)
    if presampled is None:
        fn = jax.jit(jax.shard_map(
            lambda st, sc, pr, ks: _match_all(
                st, sc, pr, ks, cfg, d2_implied=d2_implied
            ),
            mesh=mesh,
            in_specs=(op, P(), op, op),
            out_specs=(op, op, op),
            check_vma=False,
        ))
        st, sc, pr, ks = _globalize((stacked, scene, probs, keys), mesh)
        best, poses, nhyp = fn(st, sc, pr, ks)
    else:
        fn = jax.jit(jax.shard_map(
            lambda st, sc, pr, ks, bi, i1, i2, bv: _match_all_presampled(
                st, sc, pr, ks, bi, i1, i2, bv, cfg, d2_implied=d2_implied
            ),
            mesh=mesh,
            in_specs=(op, P(), op, op, op, op, op, op),
            out_specs=(op, op, op),
            check_vma=False,
        ))
        st, sc, pr, ks = _globalize((stacked, scene, probs, keys), mesh)
        from .parallel.sharding import _globalize_hyp

        bi, i1, i2, bv = _globalize_hyp(presampled, mesh, ax)
        best, poses, nhyp = fn(st, sc, pr, ks, bi, i1, i2, bv)
    return best[:n_obj], poses[:n_obj], nhyp[:n_obj]


def match_all_objects(
    models: Sequence[ModelPack],
    scene: ScenePack,
    probs,            # [O, P]
    cfg: MatchConfig,
    seed: int = 0,
    mesh=None,
):
    """Returns (best_lcp [O], best_world_transform [O, 4, 4],
    hypotheses [O]).

    `mesh`: an optional 1-D jax.sharding.Mesh — the object axis is the
    natural mesh axis (objects are independent; the reference runs one
    object per PROCESS, stocs_match_one_object.cpp:188-214, so a D-device
    mesh beats its ceiling D-fold). Each device runs the same fused
    per-object program over its O/D objects; per-object keys are derived
    globally (fold_in(key, o)), so the sharded results are bit-identical
    to the single-device program. An object count not divisible by the
    mesh size is padded with zero-probability replicas whose bases all
    fail (zero mass -> invalid base, the reference's FAILED-SAMPLING
    path) and whose results are dropped.

    An edge-mapped scene runs the reference's INSTANCE path per object
    (flood-fill segments + sequential dispersion decay,
    stocs_match_one_object.cpp:89-93, stocs.cpp:559-751): each object's
    sequential sampling chain runs outside the program against its OWN
    prior — exactly the reference's one-process-per-object isolation —
    and phases 2-4 of all objects run fused (or mesh-sharded) through
    _match_all_presampled, scored with each object's decayed prior.
    Object results are independent of which other objects share the
    batch (tests/test_multi.py pins this)."""
    stacked = stack_models(align_models(models))
    key = jax.random.PRNGKey(seed)
    okeys = [jax.random.fold_in(key, o) for o in range(len(models))]
    probs = jnp.asarray(probs)
    d2 = congruent.d2_test_implied(stacked.pos, cfg)
    n_obj = len(models)
    presampled = None
    if scene.has_edge:
        from .estimator import _phase_sample_instance

        ks_kc = [jax.random.split(k) for k in okeys]
        insts = []
        for o in range(n_obj):
            # sequential per-object chain on the object's own prior; the
            # ORIGINAL (un-resized) table — PPF existence lookups are
            # exact, so resize-invariant
            insts.append(_phase_sample_instance(
                ks_kc[o][0], models[o].table, scene, probs[o], cfg,
                cfg.number_of_bases,
            ))
        presampled = tuple(
            jnp.stack([getattr(i, f) for i in insts])
            for f in ("indices", "invariant1", "invariant2", "valid")
        )
        # scoring reads each object's sampling-time decayed prior
        probs = jnp.stack([i.class_prob for i in insts])
        keys = jnp.stack([kc for _ks, kc in ks_kc])
        n_unconv = int(sum(
            int(jnp.sum(~i.fill_converged)) for i in insts
        ))
        if n_unconv:
            from .utils.log import warn

            warn(
                f"{n_unconv} flood fills across the multi-object batch "
                f"did not reach their BFS fixpoint in flood_fill_sweeps="
                f"{cfg.flood_fill_sweeps} sweeps — segments under-fill",
                n_unconverged=n_unconv, sweeps=cfg.flood_fill_sweeps,
            )
    else:
        keys = jnp.stack(okeys)
    if mesh is not None and mesh.devices.size > 1:
        best, poses, nhyp = _match_all_sharded(
            mesh, stacked, scene, probs, keys, cfg, d2, n_obj,
            presampled=presampled,
        )
    elif presampled is not None:
        best, poses, nhyp = _match_all_presampled(
            stacked, scene, probs, keys, *presampled, cfg, d2_implied=d2,
        )
    else:
        best, poses, nhyp = _match_all(
            stacked, scene, probs, keys, cfg, d2_implied=d2,
        )
    # same silent-truncation guard as StocsEstimator.run / run_sweep:
    # score_hybrid compacts valid hypotheses to the front and drops
    # overflow beyond score_compact_cap without scoring it
    cap = cfg.score_compact_cap
    slots = cfg.number_of_bases * cfg.maximum_congruent_sets
    # one batched fetch (utils/host.py): callers index per object, and
    # serial host reads cost ~25 ms each on the tunneled TPU
    best, poses, nhyp = fetch((best, poses, nhyp))
    nh = nhyp
    if cap and slots > cap and int(nh.max()) > cap:
        from .utils.log import warn

        warn(
            f"an object produced {int(nh.max())} valid hypotheses, over "
            f"score_compact_cap={cap}; overflow was not scored — raise "
            f"the cap for full recall",
            n_valid=int(nh.max()), cap=cap,
        )
    return best, poses, nhyp
