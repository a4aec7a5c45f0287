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

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import congruent, sampling, scoring
from ..config import MatchConfig
from ..model import ModelPack
from ..ops import fit as fit_ops
from ..scene import ScenePack

HYP_AXIS = "hyp"


def make_mesh(devices=None, axis: str = HYP_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


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

    def body(model, scene, class_prob, key):
        # decorrelate the per-device RNG streams
        dev = jax.lax.axis_index(HYP_AXIS)
        key_local = jax.random.fold_in(key, dev)
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
        )
        sets = congruent.extract_congruent_sets(
            k_cong, model.table, model.pos, scene.pos, scene.normal,
            bases.indices, bases.invariant1, bases.invariant2, bases.valid,
            cfg,
        )
        b, k, _ = sets.quads.shape
        scene_quad = jnp.broadcast_to(
            scene.pos[bases.indices][:, None], (b, k, 4, 3)
        )
        model_quad = model.pos[sets.quads]
        fits = fit_ops.fit_congruent_pairs(
            scene_quad, model_quad, scene.centroid, model.centroid
        )
        valid = (fits["valid"] & sets.quad_valid & bases.valid[:, None]).reshape(-1)
        transforms = fits["transform"].reshape(-1, 4, 4)
        world = fits["world_transform"].reshape(-1, 4, 4)

        score_args = (
            transforms, valid, model.pos, model.normal, model.valid,
            scene.grid, scene.pos, scene.normal, class_prob,
            cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
        )
        mc = jnp.sum(model.valid.astype(jnp.float32))
        if coarse_to_fine:
            scores = scoring.score_hybrid(
                transforms, valid, model.pos, model.normal, model.valid,
                scene.field, scene.grid, scene.pos, scene.normal, class_prob,
                cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
                model_count=mc,
            )
        else:
            scores = scoring.score_transforms(*score_args, model_count=mc)

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
    return jax.jit(fn)(model, scene, scene.class_prob, key)
