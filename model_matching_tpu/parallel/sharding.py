"""Multi-chip SPMD execution over a device mesh.

The reference is one host thread (SURVEY.md section 2.3); the framework's
scale axes are hypothesis parallelism and scene/object batching. Here the
full online step — sample -> congruent -> fit -> score — runs under
shard_map over a 1-D mesh: every device owns number_of_bases/n bases end to
end (model, scene and PPF table replicated — they are small; the hypothesis
work is the load), and the only communication is the final weighted-LCP
argmax: an all_gather of per-device best scores plus a psum to select the
winning 3x4 pose. Collectives ride ICI; multi-host extends the same program
over DCN via jax.distributed.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import congruent, sampling, scoring
from ..config import MatchConfig
from ..model import ModelPack, build_pair_ep
from ..ops import fit as fit_ops
from ..scene import ScenePack

HYP_AXIS = "hyp"


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Multi-host (DCN) bootstrap: wires jax.distributed so a pod-slice
    program spans hosts (SURVEY.md section 2.3: ICI within a slice, DCN
    across hosts). Call before any device access. With no arguments, JAX
    auto-detects the cluster from the TPU metadata / standard env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID); explicit
    values override. No-op (returns 1) when no cluster is configured.
    Returns the process count."""
    import os

    configured = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if not configured:
        return 1
    # idempotent by explicit state check, not by matching exception text
    # (VERDICT r2 weak #6): a second call in the same process is a no-op
    if not jax.distributed.is_initialized():
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count()


def make_mesh(devices=None, axis: str = HYP_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def _globalize(tree, mesh: Mesh):
    """Make process-local inputs valid for a jit over a multi-process mesh.

    Single-process: identity (the common path pays nothing). Multi-process
    (DCN): every array leaf is promoted to a fully-replicated global array
    via jax.make_array_from_process_local_data — each process supplies the
    full (identical) value, which is exactly the contract of the P()
    in_specs used by the programs here (model/scene/table are replicated;
    only the hypothesis work is sharded)."""
    if jax.process_count() == 1:
        return tree
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P())

    def leaf(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return x

    return jax.tree.map(leaf, tree)


def _local_hypotheses(key_local, model, scene, class_prob, bits,
                      cfg: MatchConfig, b_local: int, coarse_to_fine: bool,
                      d2_implied: bool = False):
    """One device's share of a matching step: sample b_local bases ->
    congruent sets -> fits -> scores. Returns (scores [H], transforms
    [H,4,4], world_transforms [H,4,4], valid [H]). `bits` is the optional
    precomputed pair-existence matrix (sampling.build_exists_bits)."""
    k_sample, k_cong = jax.random.split(key_local)

    bases = sampling.sample_class_bases(
        k_sample, model.table, scene.pos, scene.normal,
        class_prob, scene.valid,
        num_bases=b_local,
        tr_disc=cfg.ppf_tr_discretization,
        rot_disc=cfg.ppf_rot_discretization,
        plane_threshold=cfg.plane_threshold,
        min_distance_base=cfg.min_distance_base,
        internal_angle_threshold=cfg.internal_angle_threshold,
        exists_bits=bits,
    )
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
    transforms = fits["transform"].reshape(-1, 4, 4)
    world = fits["world_transform"].reshape(-1, 4, 4)

    mc = jnp.sum(model.valid.astype(jnp.float32))
    # the sharded programs always score with the pristine scene.class_prob
    # (edge-mapped scenes are refused upstream), so when the structures
    # carry baked probs the scorers skip the prob gathers — same values
    sp = (
        None
        if scene.field.has_probs and scene.grid.has_probs
        else class_prob
    )
    if coarse_to_fine:
        scores = scoring.score_hybrid(
            transforms, valid, model.pos, model.normal, model.valid,
            scene.field, scene.grid, scene.pos, scene.normal, sp,
            cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
            model_count=mc,
            compact_cap=cfg.score_compact_cap,
            mid_cap=cfg.score_mid_cap,
        )
    else:
        scores = scoring.score_transforms(
            transforms, valid, model.pos, model.normal, model.valid,
            scene.grid, scene.pos, scene.normal, sp,
            cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
            model_count=mc,
        )
    return scores, transforms, world, valid


def matching_step_sharded(
    mesh: Mesh,
    model: ModelPack,
    scene: ScenePack,
    cfg: MatchConfig,
    key: jax.Array,
    coarse_to_fine: bool = False,
):
    """One full matching step over the mesh. Returns (best_score,
    best_world_transform [4,4], num_valid_hypotheses) as replicated values."""
    n_dev = mesh.devices.size
    if cfg.number_of_bases % n_dev:
        raise ValueError(
            f"number_of_bases={cfg.number_of_bases} not divisible by mesh "
            f"size {n_dev}"
        )
    b_local = cfg.number_of_bases // n_dev
    d2 = congruent.d2_test_implied(model.pos, cfg)

    def body(model, scene, class_prob, key):
        # decorrelate the per-device RNG streams
        dev = jax.lax.axis_index(HYP_AXIS)
        key_local = jax.random.fold_in(key, dev)
        scores, transforms, world, valid = _local_hypotheses(
            key_local, model, scene, class_prob, None, cfg, b_local,
            coarse_to_fine, d2_implied=d2,
        )

        # local best -> global argmax over the mesh
        li = jnp.argmax(scores)
        lbest = scores[li]
        lpose = world[li]
        all_best = jax.lax.all_gather(lbest, HYP_AXIS)  # [n_dev]
        winner = jnp.argmax(all_best)
        gbest = all_best[winner]
        mine = (jax.lax.axis_index(HYP_AXIS) == winner).astype(lpose.dtype)
        gpose = jax.lax.psum(lpose * mine, HYP_AXIS)
        n_valid = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), HYP_AXIS)
        return gbest, gpose, n_valid

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    args = _globalize((model, scene, scene.class_prob, key), mesh)
    return jax.jit(fn)(*args)


@partial(jax.jit, static_argnames=("tr", "rot"))
def _exists_bits(table, pos, normal, tr, rot):
    return sampling.build_exists_bits(table, pos, normal, tr, rot)


def _sweep_chunk_program(mesh: Mesh, cfg: MatchConfig, b_local: int,
                         keep_local: int, coarse_to_fine: bool,
                         d2_implied: bool = False):
    """Jitted one-chunk sweep program over the mesh: every device runs
    b_local bases end to end, keeps its local top-k scored poses, and the
    pools are all_gathered so every device (and the host) sees the full
    [n_dev * keep_local] chunk pool. The only collectives are the two
    all_gathers of the small top-k pools plus a psum of the valid count —
    they ride ICI; the hypothesis work never crosses devices."""

    def body(model, scene, class_prob, bits, key):
        dev = jax.lax.axis_index(HYP_AXIS)
        key_local = jax.random.fold_in(key, dev)
        scores, transforms, world, valid = _local_hypotheses(
            key_local, model, scene, class_prob, bits, cfg, b_local,
            coarse_to_fine, d2_implied=d2_implied,
        )
        top, idx = jax.lax.top_k(scores, min(keep_local, scores.shape[0]))
        pool_s = jax.lax.all_gather(top, HYP_AXIS).reshape(-1)
        pool_t = jax.lax.all_gather(transforms[idx], HYP_AXIS).reshape(-1, 4, 4)
        pool_w = jax.lax.all_gather(world[idx], HYP_AXIS).reshape(-1, 4, 4)
        n_valid = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), HYP_AXIS)
        return pool_s, pool_t, pool_w, n_valid

    return jax.jit(jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    ))


def run_sweep_sharded(
    mesh: Mesh,
    model: ModelPack,
    scene: ScenePack,
    cfg: MatchConfig,
    total_bases: int,
    chunk: int = 2048,
    keep_per_chunk: int | None = None,
    seed: int | None = None,
    coarse_to_fine: bool = True,
    verbose: bool = True,
):
    """Large hypothesis sweep over the mesh (the H-axis scale-out of
    SURVEY.md section 5): `total_bases` class-path bases are processed in
    chunks of `chunk`, each chunk split evenly across devices; per-chunk
    top-k pools are gathered, and the pooled winners are ICP-polished and
    greedily clustered on the host. Multi-chip counterpart of
    StocsEstimator.run_sweep with identical return shape:
    (best_lcp, best_world_transform, clustered_transforms, clustered_lcp,
    stats). A `total_bases` that is not a multiple of `chunk` is rounded
    up; stats report the bases actually processed."""
    if scene.has_edge:
        raise ValueError(
            "run_sweep_sharded samples class-path bases only; this scene "
            "carries an edge map, so the reference semantics are the "
            "instance path (flood-fill segments + sequential dispersion "
            "decay, stocs.cpp:559-751), whose per-base prior dependency "
            "cannot be sharded over the hypothesis axis. Use "
            "StocsEstimator.run_sweep (single-chip instance-mode sweep), "
            "or drop the edge map to accept class sampling."
        )
    n_dev = mesh.devices.size
    if chunk % n_dev:
        raise ValueError(f"chunk={chunk} not divisible by mesh size {n_dev}")
    b_local = chunk // n_dev
    if keep_per_chunk is None:
        keep_per_chunk = cfg.sweep_keep_per_chunk
    if keep_per_chunk == 0:
        # full-pool semantics: keep every local hypothesis slot
        keep_per_chunk = b_local * cfg.maximum_congruent_sets * n_dev
    keep_local = max(1, keep_per_chunk // n_dev)
    n_chunks = -(-total_bases // chunk)
    actual_bases = n_chunks * chunk

    key0 = jax.random.PRNGKey(cfg.seed if seed is None else seed)
    t_start = time.perf_counter()
    model, scene = _globalize((model, scene), mesh)
    bits = _exists_bits(
        model.table, scene.pos, scene.normal,
        cfg.ppf_tr_discretization, cfg.ppf_rot_discretization,
    )
    step = _sweep_chunk_program(
        mesh, cfg, b_local, keep_local, coarse_to_fine,
        d2_implied=congruent.d2_test_implied(model.pos, cfg),
    )

    pool_s, pool_t, pool_w = [], [], []
    n_hyp_total = 0
    for ci in range(n_chunks):
        key = _globalize(jax.random.fold_in(key0, ci), mesh)
        s, t, w, n_valid = step(model, scene, scene.class_prob, bits, key)
        pool_s.append(s)
        pool_t.append(t)
        pool_w.append(w)
        n_hyp_total += int(n_valid)
    pool_s = jnp.concatenate(pool_s)
    pool_t = jnp.concatenate(pool_t)
    pool_w = jnp.concatenate(pool_w)

    from ..estimator import finish_sweep_pool

    return finish_sweep_pool(
        pool_s, pool_t, pool_w, model, scene, scene.class_prob, cfg,
        total_bases=actual_bases, n_hyp_total=n_hyp_total,
        t_start=t_start, verbose=verbose, event="stocs_sweep_sharded",
        extra_stats={"devices": n_dev},
    )
