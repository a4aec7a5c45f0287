"""Sequential numpy transcription of the reference's online phases 2-4.

This is a test oracle, not production code: each function is a literal
re-derivation of the corresponding reference routine, cited by file:line,
in the style of test_ppf.ref_map_insert / test_flood.ref_bfs. It exists so
an end-to-end test fails if any phase of the TPU pipeline drifts from the
reference semantics (congruent-set extraction including the IndexedNormalSet
cone query, rigid-transform fit, weighted-LCP scoring, final argmax).

Covered reference code:
  * PairCreationFunctor::synch3DContent / getNormalizedEpsilon
    (include/super4pcs/pairCreationFunctor.h:96-143)
  * IndexedNormalSet<.,3,7,.> insert + cone query
    (include/super4pcs/accelerators/normalset.h:86-151, normalset.hpp:114-214,
     accelerators/utils.h:139-148 index linearization)
  * find_congruent_sets_on_model (src/stocs.cpp:753-869)
  * ComputeRigidTransformation + get_rigid_transform_from_congruent_pair
    (src/stocs.cpp:270-361, 871-941)
  * compute_alignment_score_for_rigid_transform + compute_best_transform
    (src/stocs.cpp:982-1041) with the kd-tree restricted-closest semantics
    (include/super4pcs/accelerators/kdtree.h:394-459: squared distance
    <= eps^2, nearest index)
"""

import math

import numpy as np


# ---------------------------------------------------------------------------
# Unit-cube normalization (pairCreationFunctor.h:96-132)
# ---------------------------------------------------------------------------

def ref_unit_cube(model_pos):
    """worldToUnit(p) = (p - bbox_center) / ratio + 0.5 with
    ratio = max bbox extent + 0.001 (pairCreationFunctor.h:71-75,115-119)."""
    lo = model_pos.min(axis=0)
    hi = model_pos.max(axis=0)
    center = (lo + hi) / 2.0
    ratio = float(np.max(hi - lo + 0.001))
    unit = (model_pos - center) / ratio + 0.5
    return unit, center, ratio


# ---------------------------------------------------------------------------
# IndexedNormalSet (normalset.h/.hpp)
# ---------------------------------------------------------------------------

_NG = 7                              # angular cells per dim (stocs.cpp:794)
_NEPS = 1.0 / _NG + 0.00001          # normalset.h:86


def _quat_from_z_to(n):
    """Eigen Quaternion::setFromTwoVectors((0,0,1), n) as a rotation matrix."""
    a = np.array([0.0, 0.0, 1.0])
    b = np.asarray(n, dtype=np.float64)
    c = float(np.dot(a, b))
    if c < -1.0 + 1e-12:
        # antiparallel: pi rotation about any axis orthogonal to z
        return np.diag([1.0, -1.0, -1.0])
    axis = np.cross(a, b)
    s = math.sqrt((1.0 + c) * 2.0)
    w = s / 2.0
    x, y, z = axis / s
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class RefNormalSet:
    """Literal IndexedNormalSet<Point,3,7,float> (normalset.h:114-151)."""

    def __init__(self, epsilon):
        # ctor (normalset.h:114-122): power-of-two grid; the C `int` cast
        # truncates toward zero
        grid_depth = int(-math.log2(epsilon))
        self.eg = 2 ** grid_depth
        self.epsilon = 1.0 / self.eg
        self.grid = {}  # pos cell id -> {normal cell id -> [ids]}

    def index_pos(self, p):
        # coordinatesPos = p/epsilon; UnrollIndexLoop linearizes with int
        # truncation: id = c0 + c1*eg + c2*eg^2 (utils.h:139-148)
        c = p / self.epsilon
        return int(c[0]) + int(c[1]) * self.eg + int(c[2]) * self.eg ** 2

    @staticmethod
    def index_normal(n):
        # coordinatesNormal = (n/2 + 1/2)/nepsilon (normalset.h:100-104)
        c = (n / 2.0 + 0.5) / _NEPS
        return int(c[0]) + int(c[1]) * _NG + int(c[2]) * _NG ** 2

    def add_element(self, p, n, idx):
        pid = self.index_pos(p)
        nid = self.index_normal(n)
        self.grid.setdefault(pid, {}).setdefault(nid, []).append(idx)

    def get_neighbors(self, p, n, cos_alpha):
        """Cone-rasterization query (normalset.hpp:166-214). `cos_alpha` is
        the dot product between the two base segments (the reference passes
        it straight through as `alpha`, stocs.cpp:842)."""
        grid = self.grid.get(self.index_pos(p))
        if grid is None:
            return []
        alpha = math.acos(max(-1.0, min(1.0, cos_alpha)))
        # quirk kept: perimeter uses atan(angle), not sin (normalset.hpp:179)
        perimeter = 2.0 * math.pi * math.atan(alpha)
        nb_sample = 2 * math.ceil(perimeter * _NG / 2.0)
        if nb_sample == 0:
            # alpha == 0 renders zero cone samples -> no neighbors (quirk)
            return []
        angle_step = 2.0 * math.pi / nb_sample
        sin_alpha = math.sin(alpha)
        rot = _quat_from_z_to(n)
        colored = set()
        for a in range(nb_sample):
            theta = a * angle_step
            d = rot @ np.array([
                sin_alpha * math.cos(theta),
                sin_alpha * math.sin(theta),
                cos_alpha,
            ])
            d = d / np.linalg.norm(d)
            nid = self.index_normal(d)
            if grid.get(nid):
                colored.add(nid)
        nei = []
        for nid in sorted(colored):
            nei.extend(grid[nid])
        return nei


# ---------------------------------------------------------------------------
# find_congruent_sets_on_model (stocs.cpp:753-869)
# ---------------------------------------------------------------------------

def ref_find_congruent_sets(
    scene_pos, model_pos, ppf_map, base_idx, inv1, inv2,
    tr_disc, rot_disc, distance_threshold, ref_ppf_fn,
):
    """Returns the ordered list of (p1, p2, q1, q2) quadrilaterals.

    scene_pos/model_pos are the *centered* clouds the estimator operates on
    (centroid_shift, stocs.cpp:943-964). ppf_map is the literal dict built
    by test_ppf.ref_map_insert; ref_ppf_fn computes the 4-bin feature
    (test_ppf.ref_ppf needs normals, so the caller binds them)."""
    b = [scene_pos[i] for i in base_idx]
    unit, center, ratio = ref_unit_cube(model_pos)

    ppf_1 = tuple(ref_ppf_fn(base_idx[0], base_idx[1]))
    ppf_2 = tuple(ref_ppf_fn(base_idx[2], base_idx[3]))
    p_pairs = ppf_map.get(ppf_1, [])
    q_pairs = ppf_map.get(ppf_2, [])
    if not p_pairs or not q_pairs:
        return [], p_pairs, q_pairs

    # angle between the two base segments (stocs.cpp:800-803)
    d01 = b[1] - b[0]
    d23 = b[3] - b[2]
    alpha = float(
        np.dot(d01 / np.linalg.norm(d01), d23 / np.linalg.norm(d23))
    )

    eps = distance_threshold / ratio  # getNormalizedEpsilon
    nset = RefNormalSet(eps)
    for i, (a_i, b_i) in enumerate(p_pairs):
        p1 = unit[a_i]
        p2 = unit[b_i]
        n = (p2 - p1) / np.linalg.norm(p2 - p1)
        nset.add_element(p1 + inv1 * (p2 - p1), n, i)

    comb = set()
    for i, (a_i, b_i) in enumerate(q_pairs):
        p1 = unit[a_i]
        p2 = unit[b_i]
        pq1 = model_pos[a_i]
        pq2 = model_pos[b_i]
        query = p1 + inv2 * (p2 - p1)
        query_q = pq1 + inv2 * (pq2 - pq1)
        queryn = (p2 - p1) / np.linalg.norm(p2 - p1)
        for pid in nset.get_neighbors(query, queryn, alpha):
            pp1 = model_pos[p_pairs[pid][0]]
            pp2 = model_pos[p_pairs[pid][1]]
            inv_point = pp1 + (pp2 - pp1) * inv1
            # unsquared-threshold quirk kept (stocs.cpp:853-854)
            if np.sum((query_q - inv_point) ** 2) <= distance_threshold:
                comb.add((pid, i))

    quads = [
        (p_pairs[pid][0], p_pairs[pid][1], q_pairs[i][0], q_pairs[i][1])
        for pid, i in sorted(comb)
    ]
    return quads, p_pairs, q_pairs


# ---------------------------------------------------------------------------
# Rigid transform (stocs.cpp:270-361, 871-941)
# ---------------------------------------------------------------------------

def ref_rigid_transform(scene_quad, model_quad, centroid_scene, centroid_model):
    """Returns (status, transform_centered [4,4], world_transform [4,4], rms).

    status: 'ok' | 'degenerate' (the reference's early `return kLargeNumber`
    paths, stocs.cpp:299-310 — truthy, leaking an uninitialized transform;
    our pipeline rejects these, documented divergence in ops/fit.py:9-14) |
    'singular' (orthogonality check failed, stocs.cpp:328-330)."""
    p0, p1, p2 = scene_quad[0], scene_quad[1], scene_quad[2]
    q0, q1, q2 = model_quad[0], model_quad[1], model_quad[2]
    centroid1 = (scene_quad[0] + scene_quad[1] + scene_quad[2]) / 3.0
    centroid2 = (model_quad[0] + model_quad[1] + model_quad[2]) / 3.0

    v1 = p1 - p0
    if np.dot(v1, v1) == 0:
        return "degenerate", None, None, None
    v1 = v1 / np.linalg.norm(v1)
    v2 = (p2 - p0) - np.dot(p2 - p0, v1) * v1
    if np.dot(v2, v2) == 0:
        return "degenerate", None, None, None
    v2 = v2 / np.linalg.norm(v2)
    v3 = np.cross(v1, v2)

    w1 = q1 - q0
    if np.dot(w1, w1) == 0:
        return "degenerate", None, None, None
    w1 = w1 / np.linalg.norm(w1)
    w2 = (q2 - q0) - np.dot(q2 - q0, w1) * w1
    if np.dot(w2, w2) == 0:
        return "degenerate", None, None, None
    w2 = w2 / np.linalg.norm(w2)
    w3 = np.cross(w1, w2)

    rotate_p = np.stack([v1, v2, v3])  # rows
    rotate_q = np.stack([w1, w2, w3])
    rotation = rotate_p.T @ rotate_q

    # orthogonality check uses diag(R @ R), not R^T R (quirk, stocs.cpp:329)
    if np.any(np.diagonal(rotation @ rotation) - 1.0 > 1e-6):
        return "singular", None, None, None

    rms = 0.0
    for pp, qq in ((p0, q0), (p1, q1), (p2, q2)):
        rms += np.linalg.norm(rotation @ (qq - centroid2) - pp + centroid1)
    rms /= 4.0  # divided by pairs.size()==4 though only 3 terms (quirk)

    # etrans = T(c1) * R * T(-c2): x -> R (x - c2) + c1 (stocs.cpp:348-358)
    t = np.eye(4)
    t[:3, :3] = rotation
    t[:3, 3] = centroid1 - rotation @ centroid2

    # world translation restore (stocs.cpp:929-933)
    tw = t.copy()
    tw[:3, 3] = (centroid1 + centroid_scene
                 - rotation @ (centroid2 + centroid_model))
    return "ok", t, tw, rms


# ---------------------------------------------------------------------------
# Weighted LCP (stocs.cpp:1006-1041) + argmax (stocs.cpp:982-1004)
# ---------------------------------------------------------------------------

def ref_lcp(mat, model_pos, model_normal, scene_pos, scene_normal,
            class_prob, distance_threshold):
    """Brute-force restricted-NN weighted LCP. Matches the kd-tree semantics
    (kdtree.h:394-459): accept squared distance <= eps^2, take the nearest."""
    eps2 = distance_threshold * distance_threshold
    rot = mat[:3, :3]
    t = mat[:3, 3]
    weighted = 0.0
    for i in range(len(model_pos)):
        q = rot @ model_pos[i] + t
        d2 = np.sum((scene_pos - q) ** 2, axis=1)
        j = int(np.argmin(d2))
        if d2[j] <= eps2:
            nq = rot @ model_normal[i]
            dot = float(np.dot(scene_normal[j], nq))
            with np.errstate(invalid="ignore"):
                # no clipping: acos(|dot| > 1) = NaN and NaN < 30 is False,
                # so out-of-domain dots are rejected (reference quirk,
                # stocs.cpp:1028-1032)
                angle = np.degrees(np.arccos(dot))
            if angle < 30.0:
                weighted += class_prob[j]
    return weighted / len(model_pos)


def ref_best(scores):
    """Strict-greater scan: index stays -1 unless a score > 0
    (stocs.cpp:987-998)."""
    max_score, index = 0.0, -1
    for i, s in enumerate(scores):
        if s > max_score:
            max_score, index = s, i
    return index, max_score
