"""4-point base invariants: segment-segment closest points and base reordering.

Branch-free (jnp.where) re-derivation of the classic segment/segment closest
point computation the reference uses to define the 4PCS invariants
(reference: src/stocs.cpp:155-222 segment_distance_and_invariants) and of the
12-permutation base reordering that picks the crossing with minimum segment
distance (reference: src/stocs.cpp:224-268 try_sampled_base). Fully batched:
all bases are reordered in one fused program.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_EPS = 1e-4


def segment_invariants(p1, p2, q1, q2):
    """Closest points between segments [p1,p2] and [q1,q2].

    Returns (distance, invariant1, invariant2) with invariants in [0, 1]:
    the parametric positions of the closest points. Broadcasts over leading
    dims. Mirrors the reference's clamped parametric solve exactly,
    including its small-number snapping of the invariants to 0.
    """
    u = p2 - p1
    v = q2 - q1
    w = p1 - q1
    a = jnp.sum(u * u, axis=-1)
    b = jnp.sum(u * v, axis=-1)
    c = jnp.sum(v * v, axis=-1)
    d = jnp.sum(u * w, axis=-1)
    e = jnp.sum(v * w, axis=-1)
    f = a * c - b * b

    parallel = f < _EPS
    s1_raw = b * e - c * d
    t1_raw = a * e - b * d
    s_neg = ~parallel & (s1_raw < 0.0)
    s_big = ~parallel & (s1_raw >= 0.0) & (s1_raw > f)
    s_mid = ~parallel & ~s_neg & ~s_big

    s1 = jnp.where(parallel, 0.0, jnp.where(s_neg, 0.0, jnp.where(s_big, f, s1_raw)))
    s2 = jnp.where(parallel, 1.0, f)
    t1 = jnp.where(parallel | s_neg, e, jnp.where(s_big, e + b, t1_raw))
    t2 = jnp.where(parallel | s_neg | s_big, c, f)
    del s_mid

    # clamp t into [0, t2], adjusting s accordingly
    t_neg = t1 < 0.0
    t_big = ~t_neg & (t1 > t2)

    def clamp_s(dval, s1_in, s2_in):
        lo = dval < 0.0
        hi = dval > a
        s1o = jnp.where(lo, 0.0, jnp.where(hi, s2_in, dval))
        s2o = jnp.where(lo | hi, s2_in, a)
        return s1o, s2o

    s1_tn, s2_tn = clamp_s(-d, s1, s2)
    s1_tb, s2_tb = clamp_s(-d + b, s1, s2)

    t1 = jnp.where(t_neg, 0.0, jnp.where(t_big, t2, t1))
    s1 = jnp.where(t_neg, s1_tn, jnp.where(t_big, s1_tb, s1))
    s2 = jnp.where(t_neg, s2_tn, jnp.where(t_big, s2_tb, s2))

    inv1 = jnp.where(jnp.abs(s1) < _EPS, 0.0, s1 / s2)
    inv2 = jnp.where(jnp.abs(t1) < _EPS, 0.0, t1 / t2)
    dist = jnp.linalg.norm(
        w + inv1[..., None] * u - inv2[..., None] * v, axis=-1
    )
    return dist, inv1, inv2


def _permutations_4():
    """The reference's 12 ordered (i, j) pairs with deterministic (k, l)
    completion (k = smallest index not in {i,j}, l = next)."""
    perms = []
    for i in range(4):
        for j in range(4):
            if i == j:
                continue
            k = 0
            while k in (i, j):
                k += 1
            l = 0
            while l in (i, j, k):
                l += 1
            perms.append((i, j, k, l))
    return np.array(perms, dtype=np.int32)  # [12, 4]


_PERMS = _permutations_4()


def reorder_base(base_pos):
    """Reorder a 4-point base [..., 4, 3] to the permutation whose two
    segments cross closest, and compute the invariants at that crossing.

    Returns (perm [..., 4] int32 — indices into the input order,
    invariant1 [...], invariant2 [...], min_distance [...]).
    """
    perms = jnp.asarray(_PERMS)  # [12, 4]
    # gather the 12 candidate orderings: [..., 12, 4, 3]
    cand = jnp.take(base_pos, perms, axis=-2)
    p1 = cand[..., 0, :]
    p2 = cand[..., 1, :]
    q1 = cand[..., 2, :]
    q2 = cand[..., 3, :]
    dist, inv1, inv2 = segment_invariants(p1, p2, q1, q2)
    # strict-less scan keeps the first minimum, like the reference loop
    best = jnp.argmin(dist, axis=-1)
    take = lambda x: jnp.take_along_axis(x, best[..., None], axis=-1)[..., 0]
    perm = jnp.take(perms, best, axis=0)
    return perm, take(inv1), take(inv2), take(dist)
