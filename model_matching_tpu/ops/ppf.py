"""Point-pair-feature (PPF) computation and integer binning.

Vectorized port-free reimplementation of the reference feature definition
(reference: src/rgbd.cpp:85-121):

    u  = p1 - p2
    f1 = int(|u| * 1000)                       # mm, truncated
    f2 = int(atan2(|n1 x u|, n1.u) * 180/pi)   # degrees in [0, 180]
    f3 = int(atan2(|n2 x u|, n2.u) * 180/pi)
    f4 = int(atan2(|n1 x n2|, n1.n2) * 180/pi)

each snapped to the *closest* multiple of its discretization
(ppf_closest_bin, reference: src/rgbd.cpp:85-97). All functions broadcast
over leading dims and run identically under jnp and numpy semantics.
"""

from __future__ import annotations

import jax.numpy as jnp

RAD2DEG = 180.0 / jnp.pi

# Distance bins at or below this many mm are never stored in the PPF map
# ("distances less than 5mm are not allowed to be sampled",
#  reference: src/rgbd.cpp:135-136).
MIN_DISTANCE_BIN_MM = 5

# Key packing: 4 bin indices (bin value / discretization) packed into one
# int32 as base-64 digits for the three angles. Angles are <= 180 deg + 2
# fan-out steps, so index < 64 holds for any rot discretization >= 4.
_ANGLE_RADIX = 64


def ppf_features(p1, n1, p2, n2):
    """Raw truncated-integer features, [..., 4] int32."""
    u = p1 - p2
    d = jnp.linalg.norm(u, axis=-1)

    def angle_deg(a, b):
        cross = jnp.cross(a, b)
        sin = jnp.linalg.norm(cross, axis=-1)
        cos = jnp.sum(a * b, axis=-1)
        return jnp.arctan2(sin, cos) * RAD2DEG

    f1 = (d * 1000.0).astype(jnp.int32)
    f2 = angle_deg(n1, u).astype(jnp.int32)
    f3 = angle_deg(n2, u).astype(jnp.int32)
    f4 = angle_deg(n1, n2).astype(jnp.int32)
    return jnp.stack([f1, f2, f3, f4], axis=-1)


def ppf_closest_bin(value, disc):
    """Snap non-negative ints to the closest multiple of disc; ties round up
    (reference: src/rgbd.cpp:85-97)."""
    lower = value - value % disc
    upper = lower + disc
    return jnp.where(value - lower < upper - value, lower, upper)


def ppf_bins(p1, n1, p2, n2, tr_disc: int, rot_disc: int):
    """Binned PPF, [..., 4] int32 — the reference's ppf_compute output."""
    f = ppf_features(p1, n1, p2, n2)
    b1 = ppf_closest_bin(f[..., 0], tr_disc)
    brot = ppf_closest_bin(f[..., 1:], rot_disc)
    return jnp.concatenate([b1[..., None], brot], axis=-1)


def pack_key(bins, tr_disc: int, rot_disc: int):
    """Pack a binned PPF [..., 4] into a single int32 key; -1 when the bin
    combination could never exist in the map (reference rejects bins with
    distance <= 5mm or negative angles on insert, src/rgbd.cpp:135-136)."""
    q1 = bins[..., 0] // tr_disc
    q2 = bins[..., 1] // rot_disc
    q3 = bins[..., 2] // rot_disc
    q4 = bins[..., 3] // rot_disc
    key = ((q1 * _ANGLE_RADIX + q2) * _ANGLE_RADIX + q3) * _ANGLE_RADIX + q4
    invalid = (
        (bins[..., 0] <= MIN_DISTANCE_BIN_MM)
        | (bins[..., 1] < 0)
        | (bins[..., 2] < 0)
        | (bins[..., 3] < 0)
    )
    return jnp.where(invalid, -1, key).astype(jnp.int32)


def ppf_keys(p1, n1, p2, n2, tr_disc: int, rot_disc: int):
    """Packed int32 key of the pair PPF — the device-side unit of lookup."""
    return pack_key(ppf_bins(p1, n1, p2, n2, tr_disc, rot_disc), tr_disc, rot_disc)


def _angle_bin_cos_thresholds(rot_disc: int):
    """Boundaries for transcendental-free angle binning.

    int(angle_deg) snapped to the closest multiple of disc (ties up, the
    ppf_closest_bin rule) equals disc * m with
    m = (floor(angle_deg) + disc//2) // disc, which increments exactly at
    the integer angles disc*j - disc//2. Since angle = atan2(s, c) with
    s >= 0 is monotone decreasing in cos(angle), m equals the number of
    boundary cosines that cos(angle) falls at or below — no atan2 needed.
    """
    import numpy as np

    lo = rot_disc // 2
    bounds = np.arange(1, 180 // rot_disc + 2) * rot_disc - lo
    bounds = bounds[bounds <= 180]
    return np.cos(np.radians(bounds.astype(np.float64))).astype(np.float32)


def angle_bin_index(cos_angle, rot_disc: int):
    """Bin index m (bin value = m * rot_disc) of atan2-style angles in
    [0, 180], computed from the cosine by threshold counting — no
    transcendentals. Matches int(atan2)+ppf_closest_bin semantics except
    within float rounding of the boundaries."""
    th = jnp.asarray(_angle_bin_cos_thresholds(rot_disc))
    return jnp.sum(
        cos_angle[..., None] <= th, axis=-1
    ).astype(jnp.int32)


def ppf_keys_fast(p1, n1, p2, n2, tr_disc: int, rot_disc: int):
    """Transcendental-free packed PPF keys: identical to ppf_keys up to
    float boundary rounding (tested); ~5x cheaper on TPU where atan2
    dominates the [B, N] sampling masks. Normals must be unit length."""
    u = p1 - p2
    d2 = jnp.sum(u * u, axis=-1)
    d = jnp.sqrt(d2)
    inv_d = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-30), 0.0)

    def cosang(n, denom_inv):
        return jnp.clip(jnp.sum(n * u, axis=-1) * denom_inv, -1.0, 1.0)

    c1 = cosang(n1, inv_d)
    c2 = cosang(n2, inv_d)
    c3 = jnp.clip(jnp.sum(n1 * n2, axis=-1), -1.0, 1.0)

    v = (d * 1000.0).astype(jnp.int32)
    lo = tr_disc // 2
    q1 = (v + lo) // tr_disc
    a1 = angle_bin_index(c1, rot_disc)
    a2 = angle_bin_index(c2, rot_disc)
    a3 = angle_bin_index(c3, rot_disc)
    key = ((q1 * _ANGLE_RADIX + a1) * _ANGLE_RADIX + a2) * _ANGLE_RADIX + a3
    invalid = (q1 * tr_disc) <= MIN_DISTANCE_BIN_MM
    return jnp.where(invalid, -1, key).astype(jnp.int32)


def fanout_deltas(tr_disc: int, rot_disc: int):
    """The 2x4x4x4 = 128 insertion fan-out offsets, in key-space units.

    On insert the reference spreads each feature over neighbor bins
    p1 in {f1-tr, f1}, p_rot in {f-2r, f-r, f, f+r}
    (reference: src/rgbd.cpp:130-133). Returns [128, 4] int32 offsets in
    *bin-index* units (i.e. already divided by the discretization).
    """
    import numpy as np

    d1 = np.array([-1, 0], dtype=np.int32)
    dr = np.array([-2, -1, 0, 1], dtype=np.int32)
    grid = np.stack(
        np.meshgrid(d1, dr, dr, dr, indexing="ij"), axis=-1
    ).reshape(-1, 4)
    return grid


def inverse_fanout_deltas(tr_disc: int, rot_disc: int):
    """Offsets from a *query* bin to the candidate *source* bins.

    query = source + delta with delta from fanout_deltas, so
    source = query - delta. Returns [128, 4] int32 bin-index offsets.
    """
    return -fanout_deltas(tr_disc, rot_disc)
