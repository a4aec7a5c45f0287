"""The STOCS estimator: four batched device phases + artifact parity.

Orchestrates the full online pipeline of the reference's stocs_estimator +
run_stocs_estimation (reference: include/stocs.hpp:16-180,
src/stocs_match_one_object.cpp:51-185):

  phase 1  sample B bases                (sampling.py — one [B, N] program)
  phase 2  congruent sets per base       (congruent.py — lax.map'd kernel)
  phase 3  rigid fits                    (ops/fit.py — one [B, K] vmap)
  phase 4  weighted-LCP scores + argmax  (scoring.py — coarse->fine)

Per-phase wall-clock is reported like the reference's chrono spans
(stocs_match_one_object.cpp:103-164), plus a hypotheses/sec counter.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import clustering, congruent, icp, instance, sampling, scoring
from .config import MatchConfig
from .model import ModelPack
from .ops import fit as fit_ops
from .scene import ScenePack
from .types import PoseCandidates
from .utils.host import fetch


@dataclasses.dataclass
class StocsResult:
    poses: PoseCandidates          # all hypotheses (padded, validity-masked)
    best_index: int                # -1 if no pose found
    best_lcp: float
    best_transform: Optional[np.ndarray]        # centered-frame 4x4
    best_world_transform: Optional[np.ndarray]  # original-frame 4x4
    num_bases: int
    num_hypotheses: int
    timings: dict                  # seconds per phase
    stats: dict


@partial(jax.jit, static_argnames=("cfg", "num_bases"))
def _phase_sample(key, table, pos, normal, prior, valid, cfg: MatchConfig,
                  num_bases: int, exists_bits=None):
    return sampling.sample_class_bases(
        key, table, pos, normal, prior, valid,
        num_bases=num_bases,
        tr_disc=cfg.ppf_tr_discretization,
        rot_disc=cfg.ppf_rot_discretization,
        plane_threshold=cfg.plane_threshold,
        min_distance_base=cfg.min_distance_base,
        internal_angle_threshold=cfg.internal_angle_threshold,
        exists_bits=exists_bits,
    )


@partial(jax.jit, static_argnames=("tr", "rot"))
def _build_exists_bits(table, pos, normal, tr, rot):
    return sampling.build_exists_bits(table, pos, normal, tr, rot)


def _phase_sample_instance(key, table, scene: ScenePack, class_prob,
                           cfg: MatchConfig, num_bases: int,
                           exists_bits=None):
    kwargs = dict(
        num_bases=num_bases,
        dispersion=cfg.sample_dispersion,
        tr_disc=cfg.ppf_tr_discretization,
        rot_disc=cfg.ppf_rot_discretization,
        plane_threshold=cfg.plane_threshold,
        min_distance_base=cfg.min_distance_base,
        internal_angle_threshold=cfg.internal_angle_threshold,
        flood_max_iters=cfg.flood_fill_max_iters,
        exists_bits=exists_bits,
        flood_sweeps=cfg.flood_fill_sweeps or None,
    )
    if cfg.instance_block_size > 1:
        # block-parallel: K bases per dispatch, batched flood fills,
        # block-boundary decay (documented divergence, config.py)
        return instance.sample_instance_bases_blocked(
            key, table, scene.pos, scene.normal, class_prob,
            scene.edge_prob, scene.pixel, scene.valid, scene.edge_free,
            block_size=cfg.instance_block_size, **kwargs,
        )
    # host-driven stepping: compiles a bounded scan block instead of the
    # whole-B scan (whose nested flood-fill while_loop compiles
    # pathologically slowly on real TPU backends); block size trades
    # per-dispatch round trips against compile time (config.py)
    return instance.sample_instance_bases_stepwise(
        key, table, scene.pos, scene.normal, class_prob,
        scene.edge_prob, scene.pixel, scene.valid, scene.edge_free,
        block=cfg.instance_scan_block, **kwargs,
    )


@partial(jax.jit, static_argnames=("cfg", "d2_implied"))
def _phase_congruent(key, table, model_pos, scene_pos, scene_normal,
                     bases: sampling.SampledBases, cfg: MatchConfig,
                     pair_ep=None, d2_implied: bool = False):
    return congruent.extract_congruent_sets(
        key, table, model_pos, scene_pos, scene_normal,
        bases.indices, bases.invariant1, bases.invariant2, bases.valid, cfg,
        pair_ep=pair_ep, d2_implied=d2_implied,
    )


def _run_congruent(key, model, scene, bases, cfg: MatchConfig):
    """Congruent dispatch (one jit program; sorted-grouped tiers inside it
    per cfg.congruent_sorted_groups, congruent.py)."""
    return _phase_congruent(
        key, model.table, model.pos, scene.pos, scene.normal, bases, cfg,
        pair_ep=model.pair_ep,
        # model.pos is concrete here (jit boundary): resolve the static
        # cell-implies-distance flag host-side
        d2_implied=congruent.d2_test_implied(model.pos, cfg),
    )


def _pair_ep_of(model: ModelPack):
    """The model's endpoint-row table, building it once when a manually
    constructed pack omitted it (load_model_pack always bakes one)."""
    if model.pair_ep is not None:
        return model.pair_ep
    from .model import build_pair_ep

    return build_pair_ep(model.pos, model.table.pairs)


def _ep_quad(pair_ep, flat_pairs):
    """[..., 2] winner pair rows -> [..., 4, 3] model quad positions via
    ONE endpoint-row gather per pair (the rows store the raw (a, b)
    endpoints, so the positions are exactly model_pos[quads])."""
    ep = pair_ep[flat_pairs]                 # [..., 2, 6]
    return ep.reshape(ep.shape[:-2] + (4, 3))


@partial(jax.jit, static_argnames=("compact_cap",))
def _phase_fit(scene_pos, pair_ep, scene_centroid, model_centroid,
               bases: sampling.SampledBases, sets: congruent.CongruentSets,
               compact_cap: int = 0):
    """Fit rigid transforms for every congruent slot.

    Model points come from the [total_pairs, 6] endpoint-row table
    (ModelPack.pair_ep): a winner's 4-point model quad is two 24-byte row
    gathers instead of a [K,4] index gather + 4 position gathers — row
    gathers price per ROW on TPU (docs/RESULTS.md gather profile), so
    this is 2 rows/hypothesis instead of ~5.

    Returns (poses, n_slot_valid) where n_slot_valid counts the
    congruent-valid slots BEFORE fit validity (what the compact-cap
    overflow warnings compare against).

    `compact_cap` > 0: when B*K exceeds it, the valid slots are stably
    partitioned to the front FIRST and only the leading `compact_cap`
    slots are fitted — a B-base batch carries B*max_congruent_sets slots
    but typically only ~5-10% valid, and fitting dead slots costs real
    gather + frame-math time (70 -> 29 ms on a 409,600-slot fixture
    chunk). Only the coarse-to-fine callers pass it — the exact path
    scores every slot, so it fits every slot.

    Overflow semantics vs the old score-time compaction: both drop
    congruent-valid slots past the cap, but this partition runs BEFORE
    fit validity is known, so in the (congruent-valid > cap) regime a
    degenerate frame inside the prefix displaces one fittable slot that
    score-time compaction would have kept. Degenerate frames measure
    ~0.008% of slots on the fixture (RESULTS.md), and the caller's
    overflow warning fires on the same congruent-valid count, so the
    displacement is bounded by that warning's overflow amount."""
    b, k, _ = sets.pairs.shape
    h = b * k
    slot_valid = (sets.quad_valid & bases.valid[:, None]).reshape(h)
    n_slot_valid = jnp.sum(slot_valid.astype(jnp.int32))
    if compact_cap and h > compact_cap:
        cap = compact_cap
        sel = scoring._stable_partition_sel(slot_valid, cap)
        bi = sel // k
        flat_pairs = sets.pairs.reshape(h, 2)

        def fit_at(width):
            # bucketed width (same trick as score_hybrid's stage 1): every
            # valid slot sits in the partition prefix, so fitting only the
            # first `width` >= n_valid slots and padding the tail invalid
            # is bit-identical to the full-cap fit
            w_sel = sel[:width]
            out = fit_ops.fit_congruent_pairs(
                scene_pos[bases.indices[bi[:width]]],
                _ep_quad(pair_ep, flat_pairs[w_sel]),
                scene_centroid, model_centroid,
            )
            pad = cap - width

            def padded(a):
                if pad == 0:
                    return a
                return jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
                )

            return PoseCandidates(
                transform=padded(out["transform"]),
                world_transform=padded(out["world_transform"]),
                lcp=jnp.zeros((cap,), jnp.float32),
                base_index=bi,
                valid=padded(out["valid"] & slot_valid[w_sel]),
            )

        nvc = jnp.minimum(n_slot_valid, jnp.int32(cap))
        return scoring.run_bucketed(nvc, cap, fit_at), n_slot_valid
    scene_quad = scene_pos[bases.indices]            # [B, 4, 3]
    scene_quad = jnp.broadcast_to(scene_quad[:, None], (b, k, 4, 3))
    model_quad = _ep_quad(pair_ep, sets.pairs)       # [B, K, 4, 3]
    out = fit_ops.fit_congruent_pairs(
        scene_quad, model_quad, scene_centroid, model_centroid
    )
    valid = out["valid"].reshape(h) & slot_valid
    base_index = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, k)
    )
    return PoseCandidates(
        transform=out["transform"].reshape(h, 4, 4),
        world_transform=out["world_transform"].reshape(h, 4, 4),
        lcp=jnp.zeros((h,), jnp.float32),
        base_index=base_index.reshape(h),
        valid=valid,
    ), n_slot_valid


@partial(jax.jit, static_argnames=("cfg", "coarse_to_fine"))
def _phase_score(poses: PoseCandidates, model: ModelPack, scene: ScenePack,
                 class_prob, cfg: MatchConfig, coarse_to_fine: bool,
                 precompacted_count=None):
    """precompacted_count: when _phase_fit already compacted the slot
    batch (its n_slot_valid, min'd with the cap by the caller), hybrid's
    own compaction is a no-op and stage-1 bucketing uses this prefix
    bound — poses.valid's count may undercount the partition prefix when
    fit rejected a degenerate frame inside it."""
    mc = jnp.sum(model.valid.astype(jnp.float32))
    if coarse_to_fine:
        # production path: dense-field ranking + exact re-score of leaders;
        # oversized slot batches are compacted valid-first (overflow beyond
        # the cap is dropped and the caller warns)
        scores = scoring.score_hybrid(
            poses.transform, poses.valid,
            model.pos, model.normal, model.valid,
            scene.field, scene.grid, scene.pos, scene.normal, class_prob,
            cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
            model_count=mc,
            compact_cap=cfg.score_compact_cap,
            mid_cap=cfg.score_mid_cap,
            precompacted_count=precompacted_count,
        )
    else:
        scores = scoring.score_transforms(
            poses.transform, poses.valid,
            model.pos, model.normal, model.valid,
            scene.grid, scene.pos, scene.normal, class_prob,
            cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
            model_count=mc,
            # bound the per-chunk intermediates: at sweep scale (e.g. 2048
            # bases x 200 sets = 409600 slots) the unchunked program would
            # materialize ~100 GB and OOM the chip; the chunk is derived
            # from the concrete model size / grid cell cap (or set
            # explicitly via cfg.score_exact_chunk)
            chunk=scoring.exact_score_chunk(
                cfg.score_exact_chunk, model.pos.shape[0], scene.grid.cell_cap
            ),
        )
    idx, best = scoring.best_pose(scores)
    return scores, idx, best


@partial(jax.jit, static_argnames=("cfg",))
def _phase_field_scores(poses: PoseCandidates, model: ModelPack,
                        scene: ScenePack, class_prob, cfg: MatchConfig):
    """Full-model dense-field LCP for every hypothesis (the ladder's
    mid-stage scorer over the whole pool) — used to backfill non-leader
    scores for clustering."""
    return scoring.score_transforms_field(
        poses.transform, poses.valid,
        model.pos, model.normal, model.valid,
        scene.field, class_prob,
        cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
        model_count=jnp.sum(model.valid.astype(jnp.float32)),
    )


@partial(jax.jit, static_argnames=("cfg",))
def _phase_refine(best_t, model: ModelPack, scene: ScenePack, class_prob,
                  cfg: MatchConfig):
    refined = icp.refine_pose(
        best_t, model.pos, model.valid,
        scene.icp_grid, scene.pos, scene.normal,
        max_corr_dist=cfg.icp_max_corr_dist,
        iterations=cfg.icp_iterations,
    )
    new_lcp = scoring.score_transforms(
        refined[None], jnp.ones(1, bool),
        model.pos, model.normal, model.valid,
        scene.grid, scene.pos, scene.normal, class_prob,
        cfg.distance_threshold, cfg.lcp_normal_angle_threshold,
        model_count=jnp.sum(model.valid.astype(jnp.float32)),
    )[0]
    return refined, new_lcp


_SWEEP_CKPT_VERSION = 3  # v2: + chunk_slot_valid (fit-time compaction)
#                          v3: + devices (sharded sweeps checkpoint too;
#                              0 = single-chip layout)


def _sweep_cfg_fingerprint(cfg: MatchConfig) -> str:
    """Stable fingerprint of the sweep-relevant config: a resumed sweep
    must run under the exact configuration that produced the checkpoint
    (different thresholds/caps would silently mix semantics)."""
    d = dataclasses.asdict(cfg)
    return hashlib.sha1(
        json.dumps(d, sort_keys=True, default=repr).encode()
    ).hexdigest()


def _save_sweep_checkpoint(path, *, next_chunk, chunk, seed, kp, cfg_fp,
                           use_instance, pool_s, pool_t, pool_w,
                           chunk_valid, chunk_slot_valid, unconverged,
                           elapsed, prob_decayed, class_prob, devices=0,
                           pair_max=0):
    """Atomic npz checkpoint of a sweep in progress. Chunk PRNG keys are
    fold_in(key0, ci) — stateless in the loop — so the only cross-chunk
    state is the pooled winners and (instance mode) the decayed prior;
    resuming reproduces the uninterrupted sweep bit for bit (the online
    run is otherwise stateless, like the reference's one-shot binaries —
    this extends SURVEY section 5's persisted-state inventory to
    preemptible large sweeps)."""
    # one batched fetch for the device arrays (utils/host.py)
    dev = fetch(dict(
        pool_s=pool_s, pool_t=pool_t, pool_w=pool_w,
        chunk_valid=chunk_valid, chunk_slot_valid=chunk_slot_valid,
        class_prob=(class_prob if prob_decayed else None),
        pair_max=pair_max,
    ))
    arrays = dict(
        version=np.int64(_SWEEP_CKPT_VERSION),
        next_chunk=np.int64(next_chunk),
        chunk=np.int64(chunk),
        seed=np.int64(seed),
        kp=np.int64(kp),
        cfg_fp=np.frombuffer(cfg_fp.encode(), dtype=np.uint8),
        use_instance=np.bool_(use_instance),
        pool_s=dev["pool_s"],
        pool_t=dev["pool_t"],
        pool_w=dev["pool_w"],
        chunk_valid=dev["chunk_valid"],
        chunk_slot_valid=dev["chunk_slot_valid"],
        unconverged=np.int64(unconverged),
        elapsed=np.float64(elapsed),
        prob_decayed=np.bool_(prob_decayed),
        devices=np.int64(devices),
        # running PPF pair max: without it a truncated bin in a
        # pre-checkpoint chunk would be forgotten on resume and the
        # pair-cap warning would silently under-fire (ADVICE r4)
        pair_max=np.int64(dev["pair_max"]),
    )
    if prob_decayed:
        arrays["class_prob"] = dev["class_prob"]
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _load_sweep_checkpoint(path, *, chunk, seed, kp, cfg_fp, use_instance,
                           devices=0):
    """Load + validate a sweep checkpoint against this call's parameters.
    Raises ValueError on any mismatch — a checkpoint must never silently
    resume under different semantics. `devices`: expected mesh size for
    sharded sweeps (0 = single-chip) — resuming a sweep on a different
    device layout would change the per-device RNG streams."""
    with np.load(path) as z:
        ver = int(z["version"])
        if ver not in (1, 2, _SWEEP_CKPT_VERSION):
            raise ValueError(
                f"sweep checkpoint {path}: unsupported version {ver}"
            )
        saved_fp = bytes(z["cfg_fp"]).decode()
        mism = []
        if int(z["chunk"]) != chunk:
            mism.append(f"chunk {int(z['chunk'])} != {chunk}")
        if int(z["seed"]) != seed:
            mism.append(f"seed {int(z['seed'])} != {seed}")
        if int(z["kp"]) != kp:
            mism.append(f"keep_per_chunk {int(z['kp'])} != {kp}")
        if saved_fp != cfg_fp:
            mism.append("config fingerprint differs")
        if bool(z["use_instance"]) != use_instance:
            mism.append("sampling path (instance/class) differs")
        saved_dev = int(z["devices"]) if ver >= 3 else 0
        if saved_dev != devices:
            mism.append(
                f"device layout {saved_dev or 'single-chip'} != "
                f"{devices or 'single-chip'}"
            )
        if mism:
            raise ValueError(
                f"sweep checkpoint {path} does not match this sweep: "
                + "; ".join(mism)
            )
        return dict(
            next_chunk=int(z["next_chunk"]),
            pool_s=jnp.asarray(z["pool_s"]),
            pool_t=jnp.asarray(z["pool_t"]),
            pool_w=jnp.asarray(z["pool_w"]),
            chunk_valid=jnp.asarray(z["chunk_valid"]),
            # v1 checkpoints (pre fit-time compaction) lack the per-chunk
            # congruent-valid counts; fall back to the fit-valid counts (a
            # lower bound — the overflow warning may under-fire for the
            # resumed chunks) instead of wedging an unattended resume loop
            chunk_slot_valid=jnp.asarray(
                z["chunk_slot_valid"] if ver >= 2 else z["chunk_valid"]
            ),
            unconverged=int(z["unconverged"]),
            pair_max=(int(z["pair_max"]) if "pair_max" in z.files else 0),
            elapsed=float(z["elapsed"]),
            prob_decayed=bool(z["prob_decayed"]),
            class_prob=(
                jnp.asarray(z["class_prob"]) if bool(z["prob_decayed"])
                else None
            ),
        )


def finish_sweep_pool(pool_s, pool_t, pool_w, model: ModelPack,
                      scene: ScenePack, class_prob, cfg: MatchConfig,
                      total_bases: int, n_hyp_total: int, t_start: float,
                      verbose: bool = True, event: str = "stocs_sweep",
                      extra_stats: Optional[dict] = None):
    """Shared tail of the single-chip and sharded sweeps: pool argmax, ICP
    polish of the winner, greedy clustering of the pooled hypotheses
    (pruned against the RAW pool best — an ICP-refined best would
    over-prune, pose_clustering.cpp:93-97), stats and logging.

    Returns (best_lcp, best_world_transform, clustered_transforms,
    clustered_lcp, stats)."""
    # three batched fetches total (argmax group, refine group, cluster
    # group) — serial host reads cost ~25 ms each on the tunnel
    # (utils/host.py); the winner row rides a device-index gather
    bi_dev = jnp.argmax(pool_s)
    h = fetch(dict(
        bi=bi_dev, best=pool_s[bi_dev], best_w=pool_w[bi_dev],
        sc=scene.centroid, mc=model.centroid,
    ))
    best_i = int(h["bi"])
    best_lcp = float(h["best"])
    best_w = np.asarray(h["best_w"])
    raw_best = best_lcp

    if cfg.refine_best_pose and best_lcp > 0:
        refined, new_lcp = _phase_refine(
            pool_t[best_i], model, scene, class_prob, cfg
        )
        rh = fetch(dict(refined=refined, new_lcp=new_lcp))
        if float(rh["new_lcp"]) >= best_lcp:
            a = np.eye(4, dtype=np.float32)
            a[:3, 3] = h["sc"]
            bmat = np.eye(4, dtype=np.float32)
            bmat[:3, 3] = -h["mc"]
            best_w = a @ np.asarray(rh["refined"]) @ bmat
            best_lcp = float(rh["new_lcp"])
    elapsed = time.perf_counter() - t_start

    cidx, cmask = clustering.greedy_clustering(
        pool_w, pool_s, pool_s > 0,
        cfg.cluster_acceptable_fraction, jnp.float32(raw_best),
        cfg.cluster_max_pose_count, cfg.cluster_min_distance,
        cfg.cluster_min_angle,
        jnp.asarray(cfg.cluster_symmetry, dtype=jnp.float32),
    )
    ch = fetch(dict(cidx=cidx, cmask=cmask, pw=pool_w, ps=pool_s))
    sel = ch["cidx"][ch["cmask"]]
    stats = {
        "total_bases": total_bases,
        "hypotheses": n_hyp_total,
        "seconds": elapsed,
        "bases_per_sec": total_bases / elapsed,
        "hypotheses_per_sec": n_hyp_total / elapsed if elapsed else 0.0,
        **(extra_stats or {}),
    }
    from .utils.log import log_event

    log_event(event, best_lcp=best_lcp, clusters=len(sel), **stats)
    if verbose:
        print(
            f"sweep: {total_bases} bases -> {n_hyp_total} hypotheses in "
            f"{elapsed:.1f}s ({stats['bases_per_sec']:.0f} bases/s), "
            f"best lcp {best_lcp:.3f}, {len(sel)} clusters"
        )
    return (
        best_lcp, best_w,
        ch["pw"][sel], ch["ps"][sel], stats,
    )


class StocsEstimator:
    """One (model, scene) matching session. The class path (no edge map) is
    fully batched; the instance path threads flood-fill segments through a
    sequential scan (see instance.py)."""

    def __init__(self, model: ModelPack, scene: ScenePack, cfg: MatchConfig):
        self.model = model
        self.scene = scene
        self.cfg = cfg
        # mutable class-probability state: the instance path decays it and
        # the reference scores with the decayed values (Point3D
        # update_class_probability mutates the same field LCP reads,
        # point3d.hpp:54-56, stocs.cpp:1033)
        self.class_prob = scene.class_prob
        self.seg_masks = None
        self._exists_bits = None

    def _score_prob(self):
        """class_prob argument for the SCORING phases: None when the baked
        field/payload weights apply — i.e. the probability vector is still
        the pristine one the scene structures were built with (class path;
        the instance path reassigns self.class_prob with decayed copies).
        Scorers given None read the weight from the field row / payload
        slot and skip the [H, M] prob gathers."""
        s = self.scene
        if (
            self.class_prob is s.class_prob
            and s.field.has_probs
            and s.grid.has_probs
        ):
            return None
        return self.class_prob

    def exists_bits(self):
        """Lazily build the bit-packed pair-existence matrix; pays one
        O(N^2) pass, then every sampling round's PPF mask is a row gather.
        Worth it from a few hundred bases upward (always used by
        run_sweep)."""
        if self._exists_bits is None:
            self._exists_bits = _build_exists_bits(
                self.model.table, self.scene.pos, self.scene.normal,
                self.cfg.ppf_tr_discretization,
                self.cfg.ppf_rot_discretization,
            )
        return self._exists_bits

    def run(self, seed: Optional[int] = None, coarse_to_fine: bool = True,
            verbose: bool = True) -> StocsResult:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        k_sample, k_cong = jax.random.split(key)
        timings = {}

        t0 = time.perf_counter()
        self.seg_masks = None
        if self.scene.has_edge:
            # exists_bits deliberately NOT passed: at one base per step the
            # single-row gather + 32-way unpack measures slower than the
            # fused hash probing (23.8 vs 16.7 ms/base on chip); the bit
            # matrix only pays off for the [B, N] batched class rounds
            inst = _phase_sample_instance(
                k_sample, self.model.table, self.scene, self.class_prob,
                cfg, cfg.number_of_bases,
            )
            inst = jax.block_until_ready(inst)
            # device-side; joins the single batched fetch below (each
            # extra host read costs ~25 ms on the tunnel, utils/host.py)
            unconv_dev = jnp.sum(~inst.fill_converged)
            bases = sampling.SampledBases(
                inst.indices, inst.invariant1, inst.invariant2, inst.valid
            )
            # the dispersion decay persists into scoring (see __init__ note)
            self.class_prob = inst.class_prob
            self.seg_masks = inst.seg_masks
        else:
            bits = (
                self.exists_bits() if cfg.number_of_bases >= 512 else None
            )
            bases = _phase_sample(
                k_sample, self.model.table, self.scene.pos, self.scene.normal,
                self.class_prob, self.scene.valid, cfg, cfg.number_of_bases,
                bits,
            )
            bases = jax.block_until_ready(bases)
            unconv_dev = None
        timings["sample_bases"] = time.perf_counter() - t0
        n_bases_dev = jnp.sum(bases.valid.astype(jnp.int32))

        t0 = time.perf_counter()
        sets = _run_congruent(k_cong, self.model, self.scene, bases, cfg)
        sets = jax.block_until_ready(sets)
        timings["congruent_sets"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        cap = cfg.score_compact_cap
        fit_cap = cap if coarse_to_fine else 0
        poses, n_slot_valid = _phase_fit(
            self.scene.pos, _pair_ep_of(self.model), self.scene.centroid,
            self.model.centroid, bases, sets, compact_cap=fit_cap,
        )
        poses = jax.block_until_ready(poses)
        timings["rigid_fit"] = time.perf_counter() - t0
        slots = bases.valid.shape[0] * cfg.maximum_congruent_sets

        t0 = time.perf_counter()
        pre_n = (
            jnp.minimum(n_slot_valid, jnp.int32(cap))
            if (fit_cap and slots > cap) else None
        )
        scores, idx, best = _phase_score(
            poses, self.model, self.scene, self._score_prob(), cfg,
            coarse_to_fine, precompacted_count=pre_n,
        )
        scores = jax.block_until_ready(scores)
        timings["scoring"] = time.perf_counter() - t0

        poses = dataclasses.replace(poses, lcp=scores)
        # ONE batched fetch for every host-side scalar and the winner rows
        # (utils/host.py: serial reads cost ~25 ms each on the tunnel; the
        # winner rows ride the batch via a device-index gather)
        safe_i = jnp.maximum(idx, 0)
        host = fetch(dict(
            idx=idx, best=best, n_bases=n_bases_dev,
            n_hyp=jnp.sum(poses.valid.astype(jnp.int32)),
            n_slot_valid=n_slot_valid,
            pair_max=jnp.max(sets.pair_counts),
            shortfall=congruent.selection_shortfall(sets, cfg),
            total_sets=jnp.sum(sets.total_found),
            best_t=poses.transform[safe_i],
            best_w=poses.world_transform[safe_i],
            unconv=unconv_dev,
        ))
        n_bases = int(host["n_bases"])
        n_hyp = int(host["n_hyp"])
        n_slot_valid = int(host["n_slot_valid"])
        pair_max = int(host["pair_max"])
        if unconv_dev is not None and int(host["unconv"]):
            from .utils.log import warn

            warn(
                f"{int(host['unconv'])} flood fills did not reach their BFS "
                f"fixpoint in flood_fill_sweeps="
                f"{cfg.flood_fill_sweeps} sweeps — segments under-fill; "
                f"raise the sweep count for scenes with winding "
                f"free-space regions",
                n_unconverged=int(host["unconv"]),
                sweeps=cfg.flood_fill_sweeps,
            )
        if verbose:
            print(f"Sampled {n_bases} bases in "
                  f"{timings['sample_bases']*1e6:.0f} us")
            print(f"found {int(host['total_sets'])} congruent sets "
                  f"({n_hyp} hypotheses) in "
                  f"{(timings['congruent_sets']+timings['rigid_fit'])*1e6:.0f} us")
        if pair_max > cfg.max_pairs_per_bin:
            from .utils.log import warn

            warn(
                f"a PPF bin held {pair_max} pairs; only "
                f"max_pairs_per_bin={cfg.max_pairs_per_bin} were matched — "
                f"raise the cap for full recall",
                pair_max=pair_max, cap=cfg.max_pairs_per_bin,
            )
        if int(host["shortfall"]):
            from .utils.log import warn

            warn(
                f"{int(host['shortfall'])} saturated bases kept fewer than "
                f"maximum_congruent_sets={cfg.maximum_congruent_sets} sets "
                f"after the exact-cone re-check — the kept pool may be "
                f"thinner than the reference's cap; raise "
                f"congruent_cone_oversample for full selection",
                n_short=int(host["shortfall"]),
                oversample=cfg.congruent_cone_oversample,
            )
        if coarse_to_fine and cap and slots > cap and n_slot_valid > cap:
            from .utils.log import warn

            warn(
                f"{n_slot_valid} congruent-valid hypothesis slots exceed "
                f"score_compact_cap={cap}; "
                f"overflow was not fitted or scored — raise the cap for "
                f"full recall",
                n_valid=n_slot_valid, cap=cap,
            )
        if verbose:
            print(f"evaluated transforms in {timings['scoring']*1e6:.0f} us")

        best_index = int(host["idx"])
        best_lcp = float(host["best"])
        if verbose:
            print(f"best index: {best_index}, maximum score: {best_lcp}")

        best_t = best_w = None
        if best_index >= 0:
            best_t = np.asarray(host["best_t"])
            best_w = np.asarray(host["best_w"])

        # point-to-plane ICP polish of the winner (library capability of the
        # reference, never called by its CLI; kept when it scores >= raw)
        if best_index >= 0 and cfg.refine_best_pose:
            t0 = time.perf_counter()
            refined, new_lcp = _phase_refine(
                jnp.asarray(best_t), self.model, self.scene,
                self._score_prob(), cfg,
            )
            rhost = fetch(dict(
                refined=refined, new_lcp=new_lcp,
                sc=self.scene.centroid, mc=self.model.centroid,
            ))
            new_lcp = float(rhost["new_lcp"])
            timings["icp_refine"] = time.perf_counter() - t0
            if new_lcp >= best_lcp:
                best_t = np.asarray(rhost["refined"])
                # world = T(+scene_centroid) centered T(-model_centroid)
                a = np.eye(4, dtype=np.float32)
                a[:3, 3] = rhost["sc"]
                b = np.eye(4, dtype=np.float32)
                b[:3, 3] = -rhost["mc"]
                best_w = a @ best_t @ b
                best_lcp = new_lcp
                if verbose:
                    print(f"icp refined score: {best_lcp}")

        self.last_poses = poses
        hyps_per_sec = (
            n_hyp / timings["scoring"] if timings["scoring"] > 0 else 0.0
        )
        from .utils.log import log_event

        log_event(
            "stocs_run", best_lcp=best_lcp, best_index=best_index,
            bases=n_bases, hypotheses=n_hyp,
            hypotheses_per_sec=round(hyps_per_sec, 1),
            timings_ms={k: round(v * 1e3, 1) for k, v in timings.items()},
        )
        return StocsResult(
            poses=poses,
            best_index=best_index,
            best_lcp=best_lcp,
            best_transform=best_t,
            best_world_transform=best_w,
            num_bases=n_bases,
            num_hypotheses=n_hyp,
            timings=timings,
            stats={
                "hypotheses_per_sec": hyps_per_sec,
                "congruent_total": int(host["total_sets"]),
                "pair_count_max": pair_max,
                "selection_shortfall": int(host["shortfall"]),
                # static marker for cluster_poses: only the coarse-to-fine
                # ladder leaves -1 (unscored) entries that need a
                # field-score backfill before clustering
                "coarse_to_fine": coarse_to_fine,
            },
        )

    def run_sweep(self, total_bases: int, chunk: int = 2048,
                  keep_per_chunk: Optional[int] = None,
                  seed: Optional[int] = None,
                  verbose: bool = True,
                  checkpoint_path: Optional[str] = None,
                  checkpoint_every: int = 8,
                  stop_after_chunks: Optional[int] = None):
        """Large hypothesis sweep (BASELINE config 5): process `total_bases`
        bases in fixed-size chunks through the same jitted phases (compiled
        once), keep the top `keep_per_chunk` scored poses of each chunk, and
        greedily cluster the pool at the end. Single-chip variant of
        parallel.sharding.matching_step_sharded's per-device loop.

        Edge-mapped scenes run the REAL instance path per chunk — flood-fill
        segment sampling with the dispersion decay threaded across chunks
        (so chunk ci+1's prior reflects every base of chunks 0..ci, exactly
        like the reference's sequential per-base decay, stocs.cpp:559-751) —
        and each chunk is scored with its sampling-time prior. The decayed
        prior persists on the estimator afterwards, like run().

        Returns (best_lcp, best_world_transform, clustered_transforms,
        clustered_lcp, stats). A `total_bases` that is not a multiple of
        `chunk` is rounded up; stats report the bases actually
        processed.

        keep_per_chunk None -> cfg.sweep_keep_per_chunk; 0 -> pool EVERY
        scored hypothesis slot (reference full-pool clustering semantics,
        pose_clustering.cpp:79-121; see the config field for the measured
        truncation bound).

        `checkpoint_path`: persist the sweep state (pooled winners, chunk
        cursor, decayed prior) every `checkpoint_every` chunks; a later
        call with the same arguments resumes from the cursor and — because
        chunk PRNG keys are fold_in(key0, ci), independent of history —
        reproduces the uninterrupted sweep bit for bit. The file is
        removed on completion. Mismatched chunk/seed/keep/config raise.
        `stop_after_chunks` bounds how many chunks THIS call processes
        (time-sliced / preemption-style operation): the call checkpoints,
        returns the pool-so-far result, and sets stats["completed"]=False
        + stats["next_chunk"]."""
        cfg = dataclasses.replace(self.cfg, number_of_bases=chunk)
        if keep_per_chunk is None:
            keep_per_chunk = cfg.sweep_keep_per_chunk
        seed_used = cfg.seed if seed is None else seed
        key0 = jax.random.PRNGKey(seed_used)
        n_chunks = -(-total_bases // chunk)
        total_bases = n_chunks * chunk
        use_instance = self.scene.has_edge

        pool_t, pool_w, pool_s = [], [], []
        chunk_valid, chunk_slot_valid, pair_maxes = [], [], []
        shortfalls = []
        unconverged = []  # device-side per chunk; summed after the loop
        start_chunk = 0
        resumed_unconverged = 0
        resumed_pair_max = 0
        t_prev = 0.0
        cfg_fp = _sweep_cfg_fingerprint(cfg) if checkpoint_path else ""
        if checkpoint_path and os.path.exists(checkpoint_path):
            state = _load_sweep_checkpoint(
                checkpoint_path, chunk=chunk, seed=seed_used,
                kp=keep_per_chunk, cfg_fp=cfg_fp, use_instance=use_instance,
            )
            start_chunk = state["next_chunk"]
            if start_chunk > n_chunks:
                raise ValueError(
                    f"sweep checkpoint {checkpoint_path} has already "
                    f"processed {start_chunk} chunks; this call asks for "
                    f"only {n_chunks} — raise total_bases (resuming with a "
                    f"larger budget extends the sweep)"
                )
            if start_chunk:
                pool_s.append(state["pool_s"].reshape(-1))
                pool_t.append(state["pool_t"].reshape(-1, 4, 4))
                pool_w.append(state["pool_w"].reshape(-1, 4, 4))
                # per-chunk valid counts survive the round trip so the
                # compact-cap overflow warning keeps its per-chunk max
                chunk_valid.extend(state["chunk_valid"])
                chunk_slot_valid.extend(state["chunk_slot_valid"])
            resumed_unconverged = state["unconverged"]
            resumed_pair_max = state["pair_max"]
            t_prev = state["elapsed"]
            if state["prob_decayed"]:
                self.class_prob = state["class_prob"]
            from .utils.log import log_event

            log_event(
                "stocs_sweep_resume", path=checkpoint_path,
                next_chunk=start_chunk, n_chunks=n_chunks,
            )
            if verbose:
                print(f"sweep: resumed from {checkpoint_path} at chunk "
                      f"{start_chunk}/{n_chunks}")

        def save_ckpt(next_chunk):
            _save_sweep_checkpoint(
                checkpoint_path, next_chunk=next_chunk, chunk=chunk,
                seed=seed_used, kp=keep_per_chunk, cfg_fp=cfg_fp,
                use_instance=use_instance,
                # a resumed pool's first entry is flat [start*kp]; one
                # concatenate + reshape restores the per-chunk layout
                pool_s=jnp.concatenate(pool_s).reshape(next_chunk, -1),
                pool_t=jnp.concatenate(pool_t).reshape(next_chunk, -1, 4, 4),
                pool_w=jnp.concatenate(pool_w).reshape(next_chunk, -1, 4, 4),
                chunk_valid=jnp.stack(
                    [jnp.asarray(v, jnp.int32) for v in chunk_valid]
                ),
                chunk_slot_valid=jnp.stack(
                    [jnp.asarray(v, jnp.int32) for v in chunk_slot_valid]
                ),
                unconverged=resumed_unconverged + (
                    int(jnp.stack(unconverged).sum()) if unconverged else 0
                ),
                elapsed=t_prev + (time.perf_counter() - t_start),
                prob_decayed=self.class_prob is not self.scene.class_prob,
                class_prob=self.class_prob,
                pair_max=(
                    jnp.maximum(
                        jnp.stack(pair_maxes).max(),
                        jnp.int32(resumed_pair_max),
                    ) if pair_maxes else jnp.int32(resumed_pair_max)
                ),
            )

        t_start = time.perf_counter()
        bits = None if use_instance else self.exists_bits()
        stopped_at = None
        for ci in range(start_chunk, n_chunks):
            key = jax.random.fold_in(key0, ci)
            k_sample, k_cong = jax.random.split(key)
            if use_instance:
                inst = _phase_sample_instance(
                    k_sample, self.model.table, self.scene, self.class_prob,
                    cfg, chunk,
                )
                bases = sampling.SampledBases(
                    inst.indices, inst.invariant1, inst.invariant2, inst.valid
                )
                # thread the decay: the next chunk samples (and this chunk
                # scores) under the prior every previous base already decayed
                self.class_prob = inst.class_prob
                # device-side: an int() here would sync the host loop per
                # chunk and stall dispatch pipelining (cf. chunk_valid)
                unconverged.append(jnp.sum(~inst.fill_converged))
            else:
                bases = _phase_sample(
                    k_sample, self.model.table, self.scene.pos,
                    self.scene.normal, self.class_prob, self.scene.valid,
                    cfg, chunk, bits,
                )
            sets = _run_congruent(
                k_cong, self.model, self.scene, bases, cfg
            )
            cap = cfg.score_compact_cap
            slots = chunk * cfg.maximum_congruent_sets
            poses, n_slot_valid = _phase_fit(
                self.scene.pos, _pair_ep_of(self.model),
                self.scene.centroid, self.model.centroid, bases, sets,
                compact_cap=cap,
            )
            # device-side (an int() here would sync the host loop): the
            # partition-prefix bound for stage-1 bucketing when fit
            # compacted the slot batch
            pre_n = (
                jnp.minimum(n_slot_valid, jnp.int32(cap))
                if (cap and slots > cap) else None
            )
            scores, _i, _b = _phase_score(
                poses, self.model, self.scene, self._score_prob(), cfg, True,
                precompacted_count=pre_n,
            )
            kp = keep_per_chunk or scores.shape[0]
            top, idx = jax.lax.top_k(scores, min(kp, scores.shape[0]))
            pool_s.append(top)
            pool_t.append(poses.transform[idx])
            pool_w.append(poses.world_transform[idx])
            # device-side counts: converting per chunk would sync the host
            # loop and stall dispatch pipelining. chunk_valid = fit-valid
            # (the hypotheses stat); chunk_slot_valid = congruent-valid
            # before the fit-time compaction (the overflow warning);
            # pair_maxes drives the pair-cap truncation warning
            chunk_valid.append(jnp.sum(poses.valid.astype(jnp.int32)))
            chunk_slot_valid.append(n_slot_valid)
            pair_maxes.append(jnp.max(sets.pair_counts))
            shortfalls.append(congruent.selection_shortfall(sets, cfg))
            done_this_call = ci + 1 - start_chunk
            if (stop_after_chunks is not None
                    and done_this_call >= stop_after_chunks
                    and ci + 1 < n_chunks):
                stopped_at = ci + 1
                if checkpoint_path:
                    save_ckpt(ci + 1)
                break
            if (checkpoint_path and ci + 1 < n_chunks
                    and done_this_call % max(1, checkpoint_every) == 0):
                save_ckpt(ci + 1)
        completed = stopped_at is None
        # one batched fetch for the loop's deferred device-side counters
        th = fetch(dict(
            unconv=(jnp.stack(unconverged).sum() if unconverged else None),
            nvs=jnp.stack([jnp.asarray(v, jnp.int32) for v in chunk_valid]),
            slvs=jnp.stack(
                [jnp.asarray(v, jnp.int32) for v in chunk_slot_valid]
            ),
            pmx=(
                jnp.maximum(
                    jnp.stack(pair_maxes).max(), jnp.int32(resumed_pair_max)
                ) if pair_maxes
                else (jnp.int32(resumed_pair_max) or None)
            ),
            short=(jnp.stack(shortfalls).sum() if shortfalls else None),
        ))
        n_unconverged = resumed_unconverged + (
            int(th["unconv"]) if th["unconv"] is not None else 0
        )
        if n_unconverged:
            from .utils.log import warn

            warn(
                f"{n_unconverged} flood fills across the sweep did not "
                f"reach their BFS fixpoint in flood_fill_sweeps="
                f"{cfg.flood_fill_sweeps} sweeps — segments under-fill",
                n_unconverged=n_unconverged, sweeps=cfg.flood_fill_sweeps,
            )
        nvs = th["nvs"]
        n_hyp_total = int(nvs.sum())
        # the overflow check uses the PRE-compaction congruent-valid counts
        # (fit now compacts to the cap, so fit-valid counts never exceed it)
        slvs = th["slvs"]
        cap = cfg.score_compact_cap
        slots = chunk * cfg.maximum_congruent_sets
        if cap and slots > cap and slvs.max() > cap:
            from .utils.log import warn

            warn(
                f"a chunk produced {int(slvs.max())} congruent-valid "
                f"hypothesis slots, over score_compact_cap={cap}; overflow "
                f"was not fitted or scored — raise the cap for full recall",
                n_valid=int(slvs.max()), cap=cap,
            )
        if th["pmx"] is not None and int(th["pmx"]) > cfg.max_pairs_per_bin:
            from .utils.log import warn

            warn(
                f"a PPF bin held {int(th['pmx'])} pairs; only "
                f"max_pairs_per_bin={cfg.max_pairs_per_bin} were matched — "
                f"raise the cap for full recall",
                pair_max=int(th["pmx"]), cap=cfg.max_pairs_per_bin,
            )
        if th["short"] is not None and int(th["short"]):
            from .utils.log import warn

            warn(
                f"{int(th['short'])} saturated bases kept fewer than "
                f"maximum_congruent_sets={cfg.maximum_congruent_sets} sets "
                f"after the exact-cone re-check — raise "
                f"congruent_cone_oversample for full selection",
                n_short=int(th["short"]),
                oversample=cfg.congruent_cone_oversample,
            )
        if completed and checkpoint_path and os.path.exists(checkpoint_path):
            os.remove(checkpoint_path)
        processed = (stopped_at if stopped_at is not None else n_chunks) * chunk
        extra = {"completed": completed}
        if th["pmx"] is not None:
            # exposed so callers (bench.py) can FAIL on recall-compromising
            # truncation instead of relying on the warning text
            extra["pair_count_max"] = int(th["pmx"])
        if not completed:
            extra["next_chunk"] = stopped_at
        return finish_sweep_pool(
            jnp.concatenate(pool_s), jnp.concatenate(pool_t),
            jnp.concatenate(pool_w),
            self.model, self.scene, self._score_prob(), cfg,
            total_bases=processed, n_hyp_total=n_hyp_total,
            # resumed time counts: finish measures elapsed = now - t_start
            t_start=t_start - t_prev, verbose=verbose,
            extra_stats=extra,
        )

    def cluster_poses(self, result: StocsResult):
        """Symmetry-aware greedy clustering of the scored hypothesis set
        (the reference's L4 library capability, pose_clustering.cpp:79-121).
        Returns (world_transforms [K, 4, 4], lcp [K]) of the cluster
        representatives.

        The reference clusters every scored hypothesis; a coarse-to-fine run
        stores exact LCP only for the ladder leaders (-1 elsewhere,
        scoring.score_hybrid). To keep the full pool clusterable, non-leader
        entries are filled with their dense-field LCP estimate (the ladder's
        own mid-stage scorer) — leaders keep exact scores."""
        cfg = self.cfg
        poses = result.poses
        lcp = poses.lcp
        # static decision — a device-side jnp.any() here would be a serial
        # ~25 ms blocking host fetch on the tunnel (utils/host.py). Only the
        # coarse-to-fine ladder leaves -1 entries; exact runs never do. For
        # results lacking the marker, backfilling is safe either way (the
        # where() below keeps every already-exact score).
        needs_fill = result.stats.get("coarse_to_fine", True)
        if needs_fill:
            field_scores = _phase_field_scores(
                poses, self.model, self.scene, self._score_prob(), cfg
            )
            lcp = jnp.where(lcp >= 0, lcp, field_scores)
            poses = dataclasses.replace(poses, lcp=lcp)
        # prune against the raw pool best: result.best_lcp may be the
        # ICP-refined winner, which is not a member of the pool being
        # clustered (reference prunes vs the pool's own best,
        # pose_clustering.cpp:93-97)
        raw_best = jnp.max(jnp.where(poses.valid, poses.lcp, -jnp.inf))
        idx, mask = clustering.greedy_clustering(
            poses.world_transform, poses.lcp, poses.valid,
            cfg.cluster_acceptable_fraction,
            raw_best.astype(jnp.float32),
            cfg.cluster_max_pose_count,
            cfg.cluster_min_distance,
            cfg.cluster_min_angle,
            jnp.asarray(cfg.cluster_symmetry, dtype=jnp.float32),
        )
        h = fetch(dict(
            idx=idx, mask=mask,
            pw=poses.world_transform, ps=poses.lcp,
        ))
        sel = h["idx"][h["mask"]]
        return (h["pw"][sel], h["ps"][sel])
