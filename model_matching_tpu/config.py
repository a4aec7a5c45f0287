"""Typed configuration for the TPU-native STOCS pipeline.

The reference hardcodes every parameter as a global compiled into the binary
(reference: src/stocs_match_one_object.cpp:4-24, src/model_preprocess.cpp:3-12)
and documents per-dataset overrides only in its README (README.md:47-69).
Here every constant — including the algorithm-internal ones buried in function
bodies (reference: src/stocs.cpp:368-370, src/rgbd.cpp:234-242,254) — is a
named, documented field with per-dataset presets.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Pinhole intrinsics, ordered as the reference's vector {fx, cx, fy, cy}
    (reference: src/stocs_match_one_object.cpp:20)."""

    fx: float
    cx: float
    fy: float
    cy: float

    def as_tuple(self) -> Tuple[float, float, float, float]:
        return (self.fx, self.cx, self.fy, self.cy)


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Offline model preprocessing (reference: src/model_preprocess.cpp:3-12)."""

    # Voxel leaf size for model downsampling, in model-file units.
    voxel_size: float = 0.01
    # Radius for PCA normal estimation on the raw model cloud, model-file units.
    normal_radius: float = 0.005
    # Scale applied to positions when loading the model (converts file units to
    # meters; reference calls this read_depth_scale, stocs.cpp:59).
    model_scale: float = 1.0
    # PPF discretization: translation in mm, rotation in degrees
    # (reference: src/model_preprocess.cpp:11-12).
    ppf_tr_discretization: int = 5
    ppf_rot_discretization: int = 5
    # Cap on neighbors used for PCA normal estimation (device-side fixed shape).
    normal_max_neighbors: int = 64


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    """Online matching parameters (reference: src/stocs_match_one_object.cpp:4-24
    plus constants buried in src/stocs.cpp / src/rgbd.cpp)."""

    camera: CameraIntrinsics = CameraIntrinsics(1066.778, 312.986, 1067.487, 241.310)
    image_width: int = 640
    image_height: int = 480
    # Multiplier converting the stored uint16 depth to meters.
    depth_scale: float = 1.0 / 10000.0

    # Scene voxel leaf size in meters (reference: stocs_match_one_object.cpp:7).
    voxel_size: float = 0.005
    # Congruent-set matching + LCP radius (reference: stocs_match_one_object.cpp:8).
    distance_threshold: float = 0.005
    ppf_tr_discretization: int = 5
    ppf_rot_discretization: int = 5
    # Declared in the reference but never used (stocs_match_one_object.cpp:11).
    edge_threshold: float = 0.0
    # Cut-off class probability when building the scene cloud
    # (reference: stocs_match_one_object.cpp:12, rgbd.cpp:257).
    class_threshold: float = 0.10
    # Per-base decay of class probability inside the previous segment
    # (instance path only; reference: stocs_match_one_object.cpp:13).
    sample_dispersion: float = 0.9

    # Hypothesis budget (reference: stocs_match_one_object.cpp:16-17).
    number_of_bases: int = 100
    maximum_congruent_sets: int = 200

    # ---- constants the reference buries in function bodies ----
    # Coplanarity tolerance for the 4th base point (stocs.cpp:368).
    plane_threshold: float = 0.015
    # Minimum pairwise distance for the 4th base point (stocs.cpp:369).
    min_distance_base: float = 0.01
    # Minimum internal angle at point 1 for the 3rd base point, degrees
    # (stocs.cpp:370).
    internal_angle_threshold: float = 30.0
    # Normal-agreement gate in LCP scoring, degrees (stocs.cpp:1032).
    lcp_normal_angle_threshold: float = 30.0
    # Scene z-clip in meters (rgbd.cpp:242).
    max_scene_depth: float = 2.0
    # Radius-outlier-removal: radius = 2*voxel + this bias, and the minimum
    # neighbor count (rgbd.cpp:234-235).
    outlier_radius_bias: float = 0.005
    outlier_min_neighbors: int = 10
    # Stored probability scale of the uint16 class-probability map (rgbd.cpp:254).
    probability_scale: float = 1.0 / 10000.0

    # ---- reference quirks, kept switchable and documented ----
    # The reference compares a *squared* distance against the *unsquared*
    # distance_threshold when matching congruent sets (stocs.cpp:854), making
    # the effective radius sqrt(distance_threshold). True reproduces that.
    congruent_sqdist_quirk: bool = True
    # "cell": replicate the reference's same-grid-cell gating between the e1
    # and e2 intermediate points (IndexedNormalSet only inspects the query's
    # own cell, normalset.hpp:132-140) plus the quirky distance check.
    # "radius": cleaner proper-distance gate ||e1-e2|| <= distance_threshold.
    congruent_distance_mode: str = "cell"

    # ---- fixed capacities for the batched TPU pipeline (not in reference;
    #      the reference uses unbounded std::vector/std::map) ----
    # Max scene points after filtering (padded; overflow logged + truncated).
    max_scene_points: int = 16384
    # Max model points after preprocessing.
    max_model_points: int = 4096
    # Max pairs fetched from one PPF bin during congruent extraction. The
    # tiered dispatch in congruent.py runs a 1024-cap matrix for typical
    # bins and Q-blocks the top tier (gate matrix <= [cap, 4096]), so this
    # worst-case cap only prices the rare dense-bin base. 16384 covers the
    # densest observed fixture bin (YCB bowl union ~11.6k pairs) without
    # truncation.
    max_pairs_per_bin: int = 16384
    # Hypothesis-slot compaction cap for coarse-to-fine scoring. A B-base
    # batch carries B * maximum_congruent_sets pose slots but typically only
    # ~5-10% are valid (fixture sweeps: ~14 congruent sets/base); when the
    # slot count exceeds this cap, valid hypotheses are stably partitioned
    # to the front and only the first `score_compact_cap` slots are scored
    # (overflow beyond the cap is dropped with a WARNING — raise the cap
    # for full recall). 0 disables compaction. Does not apply to exact
    # (no-coarse-to-fine) scoring.
    score_compact_cap: int = 131072
    # Absolute cap on the ladder's stage-2 width (score_hybrid's k_mid =
    # min(mid_cap, 8% of slots), floored at refine_count). Stage 1's
    # strided-subset ranking has a large safety margin: the exact-scorer
    # argmax's worst observed stage-1 rank over 20 real 2048-base chunks
    # is 168 (YCB, median 35) and 22 (LINEMOD, median 1)
    # (scripts/probe_score_ladder.py), so a 4096-wide stage 2 keeps a
    # >=24x margin while cutting the full-model field gathers ~2.6x at
    # sweep scale. 0 = fraction-only (the pre-round-3 behavior).
    score_mid_cap: int = 4096
    # Hypothesis chunk for EXACT (no-coarse-to-fine) scoring. The exact
    # scorer's hot transient is [chunk, M, cell_cap, 8] f32 (payload fast
    # path; ops/gridhash.py), so an unchunked sweep-scale batch would
    # materialize ~100 GB and OOM the chip. 0 (default) = derive the
    # largest 256-multiple chunk whose transient stays under a
    # 640Mi-element (~2.5 GB f32) budget from the concrete model size
    # and grid cell cap (scoring.exact_score_chunk) — on the bench
    # scene's padded shapes (M=512, cell_cap=40) that reproduces the
    # previously hand-tuned 4096; an unusual model gets a bound fitted
    # to ITS memory shape instead of a fixture-tuned constant (a
    # tighter 1.5 GB budget derived 2560 there and measured ~30% slower
    # from the extra dispatches — see scoring.exact_score_chunk).
    score_exact_chunk: int = 0
    # Sweep pooling width: run_sweep / run_sweep_sharded keep the top-k
    # scored poses of every chunk and cluster the pooled winners; the
    # reference clusters every scored hypothesis
    # (pose_clustering.cpp:79-121), so per-chunk top-k can in principle
    # truncate the clusterable pool. Measured on the YCB fixture sweep
    # (16,384 bases, 8 chunks, docs/RESULTS.md): 256/chunk and full-pool
    # clustering return the SAME cluster set (representatives within
    # float tolerance) — secondary clusters sit well inside the per-chunk
    # top-256. Raise for scenes with many well-scoring distinct instances,
    # or set 0 to keep EVERY scored hypothesis (reference semantics;
    # memory scales with total_bases * maximum_congruent_sets).
    sweep_keep_per_chunk: int = 256
    # Sorted-grouped congruent dispatch: argsort bases by pair-bin load on
    # device and run G bases per tier pick — one lax.cond per group, the
    # small tiers vmapped across the group — amortizing the per-base fixed
    # cost that dominates sparse bins (cap-256 group-16 measured 3.7x
    # faster per base than ungrouped on v5e; whole-phase on the YCB
    # fixture chunk: G=8 1.20x / G=16 1.13x / G=32 1.03x vs the per-base
    # ladder, 439 -> 366 us/base — scripts/bench_congruent_groups.py,
    # hence the default 8). Stays one jit program, so it
    # applies inside shard_map and the multi-object program too. Bases in
    # a group straddling a tier boundary run at the group's larger cap:
    # same match set and totals, possibly a different random subsample
    # when the set exceeds maximum_congruent_sets (congruent.py docstring;
    # the reference's subsample is itself rand()-ordered,
    # stocs_match_one_object.cpp:126-143). G shrinks to the largest
    # divisor of the batch size; 0/1 = per-base cond ladder. Replaces the
    # round-2 host-partitioned executor, whose count-pass host sync
    # cancelled the same gains (cut in round 3, docs/RESULTS.md).
    congruent_sorted_groups: int = 8
    # Smallest tier cap whose lanes are SORTED by position-cell id so
    # the Pallas gate can skip (P tile, Q tile) pairs with disjoint cell
    # ranges (banded execution, congruent.py). Only pays when BOTH sides
    # of a base are huge: the packed/dove top tier (~20k x 20k lanes,
    # ~500 distinct cells/side) runs 23% faster; tiers below it lose to
    # the per-base sort+permute cost (ycb 278 -> 300 ms/chunk at 16384),
    # hence the default bands only caps above the ycb top tier. Sorting
    # re-labels lane positions, so the random subsample of an
    # over-populated tier differs (same candidate set and totals; kept
    # count within ~1.5% on the packed fixture — docs/RESULTS.md round
    # 5); totals/precision are unaffected.
    congruent_band_min_cap: int = 24576
    # Fuse the congruent gate matrix + subsample selection into a Pallas
    # VMEM-tiled kernel (ops/pallas_congruent.py) instead of the XLA
    # [P, Q] intermediates. Bit-identical to the XLA path on the fixture
    # (the kernel mirrors its Q-blocking and stripe membership), measured
    # ~8% faster on v5e. None (default) = auto: on for TPU backends, off
    # for CPU (where the kernel would run in the slow Pallas interpreter);
    # True forces it everywhere (tests use this to exercise interpret
    # mode), False disables.
    congruent_pallas: bool | None = None
    # Small-XLA-tier selection pool shape: `congruent_sel_stripes`
    # STRIDED stripes (column c -> stripe c % sub, each keeping its max
    # random key) x `congruent_stripe_topn` successive-maximum levels
    # per stripe. The stripe reduction exists because a full-matrix
    # top_k scales with its input (measured 3x slower whole-phase,
    # congruent.py); striding exists because a base's matches cluster
    # in contiguous column runs (nearby pairs of one CSR range), which
    # round 4's contiguous stripes funneled into few slots (kept-true/
    # capped-true 0.97) while strided stripes spread a run of
    # <= stripes*topn matches losslessly (0.9935 measured, the residual
    # being dense-tier selection, not collisions). 256 stripes x 1
    # level keeps the whole selection one max pass (128 measured ~65 ms/chunk cheaper than 256 — the top_k input halves); each extra level
    # costs a masked re-reduce over the gate matrix (~55 ms/chunk on
    # the fixture). Tiers narrower than the stripe count select over
    # the full key matrix exactly.
    congruent_sel_stripes: int = 128
    congruent_stripe_topn: int = 1
    # Upper bound on flood-fill propagation sweeps (instance path).
    flood_fill_max_iters: int = 512
    # Fixed flood-fill sweep count (instance path). Each sweep combines an
    # 8-connected dilation with full row+column corridor propagation, so
    # convergence to the exact BFS reachability takes O(region bends)
    # sweeps (3 on the packed fixture). A fixed fori_loop avoids the
    # per-iteration orchestration cost of a dynamic while_loop on
    # remote-dispatch TPU backends (~430 ms/fill -> ~30 ms/fill measured).
    # Set to 0 to fall back to the convergence-checked while_loop bounded
    # by flood_fill_max_iters.
    flood_fill_sweeps: int = 8
    # Instance-path base batching. 1 (default) = the reference's strictly
    # sequential chain (each base sees the dispersion decay of every
    # earlier base, stocs.cpp:571-580). K > 1 = sample K bases per block
    # with batched flood fills and apply the decay at block boundaries —
    # intra-block draws repel less and seed-pixel cache hits fill fresh
    # instead of reusing the claiming base's mask (divergences documented
    # in instance.sample_instance_bases_blocked; cumulative decay over a
    # run is identical). DECISION (measured, docs/RESULTS.md round-2/3
    # tables): block mode is a COMPILE-TIME knob only — warm it is SLOWER
    # than the sequential stepper (26.2 vs 21.0 ms/base at K=8; the path
    # is compute-bound in the per-round PPF/keep masks, not dispatch-
    # bound, and exists-bits/fixed-trip/fused-round variants all measured
    # slower). Use 8-16 only to cut cold compile 2.6x on one-shot runs;
    # sequential (1) stays the reference-exact and warm-fastest default.
    instance_block_size: int = 1
    # Scan steps per device dispatch for the sequential instance sampler
    # (instance.sample_instance_bases_stepwise). Each dispatch pays a
    # full host round-trip through the carry (measured ~100 ms on the
    # remote v5e backend: 96 bases at block 10 ran 27.7 ms/base vs 17.6
    # at block 96); larger blocks amortize it at the cost of a longer
    # one-time scan compile.
    instance_scan_block: int = 64

    # Angular gate half-width (cosine units) applied between pair directions in
    # congruent extraction. The reference's IndexedNormalSet cone rasterization
    # (normalset.hpp:166-214) admits directions whose angle to the base angle
    # alpha is within roughly one angular cell (grid of 7 cells/dim, ~16 deg
    # resolution); we apply an explicit |dot - alpha| <= tol gate instead.
    # Measured against the literal cone-query oracle
    # (tests/test_reference_oracle.py::test_congruent_cone_gate_recall):
    # tol=0.30 keeps 99.6% of the reference's congruent sets at 49%
    # precision; 0.25 -> 97.3%/57%, 0.20 -> 90.6%/66%. 0.3 is chosen for
    # near-lossless recall (extra candidates only cost subsample dilution,
    # never a missed pose). <0 disables the gate (pure distance check — a
    # strict superset of the reference's matches).
    congruent_cos_tolerance: float = 0.3

    # EXACT cone semantics (the LITERAL IndexedNormalSet rasterization,
    # normalset.hpp:166-214, incl. the atan-perimeter and zero-sample
    # quirks) instead of relying on the |dot-alpha| <= tol approximation
    # alone. Two mechanisms, picked per dispatch tier:
    #   * small XLA tiers (cap < 4096): the exact membership test runs
    #     INSIDE the gate as a [P, W] x [W, Q] one-hot MXU matmul
    #     (cell(dir_P) in coloredSet(dir_Q, alpha)) — it REPLACES the
    #     cos-tolerance gate there, so recall and precision are exactly
    #     the reference's and the selection needs no oversampling;
    #   * dense Pallas tiers: the kernel keeps the cos-tolerance gate,
    #     and the selection oversamples congruent_cone_oversample * k
    #     winners, re-checks each with the literal rasterization, and
    #     keeps the top k survivors — a uniform random subsample over
    #     TRUE congruent sets (the reference's contract,
    #     stocs_match_one_object.cpp:126-143). Without this, saturated
    #     bases kept ~half false positives (measured precision 0.49).
    #     (Re-checking every stripe winner BEFORE the top-k measured 2x
    #     the whole phase — congruent.py round-5 note.)
    congruent_exact_cone: bool = True
    # Dense-tier gate winners selected per kept slot before the exact
    # re-check. At precision ~0.5 an oversample of 3 keeps the
    # post-check survivor count comfortably above
    # maximum_congruent_sets in saturated bases.
    congruent_cone_oversample: int = 3

    # ICP refinement (reference library capability, pose_clustering.cpp:123-140:
    # 5 iterations, 0.035 max correspondence distance; its CLI never calls it,
    # ours refines the winning pose by default — strictly improves ADD-S).
    icp_iterations: int = 5
    icp_max_corr_dist: float = 0.035
    refine_best_pose: bool = True

    # Greedy clustering defaults (greedy_clustering args,
    # pose_clustering.hpp:10-18; the reference CLI never calls it either).
    cluster_acceptable_fraction: float = 0.7
    cluster_max_pose_count: int = 8
    cluster_min_distance: float = 0.02
    cluster_min_angle: float = 15.0
    # Per-axis symmetry (0 | 90 | 180 | 360 degrees).
    cluster_symmetry: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    # Scene normal estimator. "cloud_pca" (default): radius-PCA over the
    # voxel-downsampled cloud (radius = scene_normal_radius_factor * voxel),
    # markedly more coherent than image-window gradients on real depth noise.
    # "depth": windowed-LS depth-gradient normals, the analogue of the
    # reference's cv::rgbd::RgbdNormals LINEMOD method (rgbd.cpp:202-206).
    scene_normal_mode: str = "cloud_pca"
    scene_normal_radius_factor: float = 2.5

    # PRNG seed for the whole run. The reference re-seeds from the wall clock
    # on every draw (stocs.cpp:135) and is therefore non-deterministic; we are
    # deterministic given this seed.
    seed: int = 0

    def __post_init__(self):
        # the packed PPF key's base-64 angle radix aliases below rot_disc=4
        # (ops/ppf.py:28-31); fail at config construction, not mid-pipeline
        if self.ppf_rot_discretization < 4:
            raise ValueError(
                f"ppf_rot_discretization must be >= 4, got "
                f"{self.ppf_rot_discretization}"
            )
        if self.ppf_tr_discretization < 1:
            raise ValueError(
                f"ppf_tr_discretization must be >= 1, got "
                f"{self.ppf_tr_discretization}"
            )
        # dense congruent tiers block the Q axis in 4096-wide chunks
        # (congruent.py match_block reshapes [cap] -> [cap/4096, 4096])
        if self.max_pairs_per_bin >= 8192 and self.max_pairs_per_bin % 4096:
            raise ValueError(
                f"max_pairs_per_bin >= 8192 must be a multiple of 4096, "
                f"got {self.max_pairs_per_bin}"
            )
        if self.max_pairs_per_bin < 1:
            raise ValueError("max_pairs_per_bin must be positive")


@dataclasses.dataclass(frozen=True)
class Preset:
    name: str
    preprocess: PreprocessConfig
    match: MatchConfig


# Presets transcribed from the reference README (README.md:40-69) and defaults
# (src/stocs_match_one_object.cpp:4-24, src/model_preprocess.cpp:3-12).
PRESETS = {
    "ycb": Preset(
        name="ycb",
        preprocess=PreprocessConfig(),
        match=MatchConfig(),
    ),
    "packed": Preset(
        name="packed",
        preprocess=PreprocessConfig(voxel_size=0.005),
        match=MatchConfig(
            camera=CameraIntrinsics(
                615.957763671875, 308.1098937988281,
                615.9578247070312, 246.33352661132812,
            ),
            depth_scale=1.0 / 8000.0,
            # the dove model's densest PPF bin union holds 22,601 pairs
            # (8 near-identical boxes saturate the bins); the default
            # 16384 cap truncated ~10% of bases' pair lists. Full recall
            # costs ~22% of the congruent phase on this fixture
            # (docs/RESULTS.md round 4).
            max_pairs_per_bin=24576,
        ),
    ),
    "linemod": Preset(
        name="linemod",
        preprocess=PreprocessConfig(
            voxel_size=10.0, normal_radius=5.0, model_scale=1.0 / 1000.0
        ),
        match=MatchConfig(
            camera=CameraIntrinsics(572.4114, 325.2611, 573.57043, 242.04899),
            depth_scale=1.0 / 1000.0,
        ),
    ),
}


def get_preset(name: str) -> Preset:
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}"
        ) from None
