"""Edge-bounded flood-fill segmentation as iterated sweep propagation.

The reference grows a segment from the sampled seed pixel with a BFS queue
over the 8-connected free-space pixels (edge probability == 0, i.e. edge
image value 255) within a euclidean pixel radius of the seed (reference:
src/rgbd.cpp:314-367 generate_segmentation_mask). Queues don't vectorize.
Iterated 3x3 dilation reaches the fixpoint but needs O(longest path)
sweeps — hundreds for real segments. Instead, each iteration here combines

  * one 8-connected dilation step (carries diagonal connectivity and lifts
    a blocked seed onto its free neighbors), and
  * full row + column reach propagation: within every unblocked run of a
    row (then column), one marked pixel marks the whole run. A run-reach is
    two cummax scans per direction (the "last marked index > last blocked
    index" trick), so an entire image-length corridor fills in ONE
    iteration.

The fixpoint equals 8-connected BFS reachability (validated against the
literal queue transcription in tests/test_flood.py); convergence takes
O(number of bends in the region) iterations instead of O(path length) —
single digits for real segments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dilate8(mask):
    """8-connected binary dilation (zero padding at the image border)."""
    h, w = mask.shape
    p = jnp.pad(mask, 1)
    acc = mask
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            if dr == 1 and dc == 1:
                continue
            acc = acc | jax.lax.dynamic_slice(p, (dr, dc), (h, w))
    return acc


def _axis_reach(mask, allowed, axis):
    """Pixels reachable from a marked pixel along `axis` without crossing a
    blocked cell: marked-run propagation via cummax in both directions."""
    shape = mask.shape
    size = shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    blocked = ~allowed
    neg = jnp.int32(-1)
    last_block = jax.lax.cummax(jnp.where(blocked, pos, neg), axis=axis)
    last_mark = jax.lax.cummax(jnp.where(mask, pos, neg), axis=axis)
    fwd = last_mark > last_block
    big = jnp.int32(size + 1)
    next_block = -jax.lax.cummax(
        jnp.where(blocked, -pos, -big), axis=axis, reverse=True
    )
    next_mark = -jax.lax.cummax(
        jnp.where(mask, -pos, -big), axis=axis, reverse=True
    )
    bwd = next_mark < next_block
    return allowed & (fwd | bwd)


def flood_fill(
    seed_rc: jax.Array,      # [2] int32 (row, col)
    edge_free: jax.Array,    # [H, W] bool — pixels the fill may enter
    max_pixel_distance,      # scalar — euclidean radius around the seed
    max_iters: int = 512,
    fixed_sweeps: int | None = None,
    return_converged: bool = False,
):
    """Boolean segment mask. The seed pixel is always in the mask (the
    reference marks it before testing, rgbd.cpp:337-343); neighbors must be
    free space AND strictly within max_pixel_distance of the seed
    (rgbd.cpp:353-357).

    With fixed_sweeps=None the fill runs a convergence-checked while_loop
    (exact fixpoint, data-dependent trip count). With fixed_sweeps=k it runs
    exactly k sweeps as a fori_loop: on remote-dispatch TPU backends a
    dynamic while_loop costs hundreds of ms of per-iteration orchestration
    overhead while k fixed sweeps execute as one straight-line program
    (measured: a converged 3-iteration while fill ~430 ms vs ~4 ms/sweep).
    The sweep operator is monotone and idempotent at the fixpoint, so any
    k >= the convergence count (one sweep spans an entire row/column
    corridor; convergence takes O(region bends), 3 on the bundled packed
    fixture) yields the exact BFS reachability; tests/test_flood.py checks
    the default against the literal queue BFS on real fixture edge maps.

    `return_converged=True` additionally runs one verification sweep and
    returns (mask, converged) — converged=False means fixed_sweeps was too
    small for this region (the mask under-fills the BFS reachability);
    callers surface that as a runtime warning."""
    h, w = edge_free.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    dist2 = (
        (rows - seed_rc[0]).astype(jnp.float32) ** 2
        + (cols - seed_rc[1]).astype(jnp.float32) ** 2
    )
    allowed = edge_free & (jnp.sqrt(dist2) < max_pixel_distance)

    seed = jnp.zeros((h, w), bool).at[seed_rc[0], seed_rc[1]].set(True)

    def sweep(mask):
        new = mask | (_dilate8(mask) & allowed)
        new = new | _axis_reach(new, allowed, 0)
        new = new | _axis_reach(new, allowed, 1)
        return new

    if fixed_sweeps is not None:
        mask = jax.lax.fori_loop(
            0, fixed_sweeps, lambda _, m: sweep(m), seed
        )
        if return_converged:
            return mask, jnp.all(sweep(mask) == mask)
        return mask

    def cond(state):
        i, mask, changed = state
        return (i < max_iters) & changed

    def body(state):
        i, mask, _ = state
        new = sweep(mask)
        return i + 1, new, jnp.any(new != mask)

    i, mask, changed = jax.lax.while_loop(
        cond, body, (0, seed, jnp.array(True))
    )
    if return_converged:
        # converged iff the final sweep made no change — a fill that reaches
        # its fixpoint exactly on the max_iters-th sweep exits with
        # i == max_iters but changed == False and IS converged; testing
        # i < max_iters alone would misreport it
        return mask, ~changed | (i < max_iters)
    return mask


def local_flood_fill(
    seed_rc: jax.Array,      # [2] int32 (row, col)
    edge_free: jax.Array,    # [H, W] bool
    max_pixel_distance,      # scalar euclidean radius around the seed
    depth_limit: int = 100,
):
    """The reference's unused local variant generate_local_segmentation_mask
    (src/rgbd.cpp:369-420): the BFS is additionally bounded by graph depth —
    a neighbor is enqueued only while its depth stays below `depth_limit`
    (rgbd.cpp:406-408), so the mask is the 8-connected geodesic ball of
    radius depth_limit-1. One masked dilation applies exactly one BFS
    layer, so the ball is depth_limit-1 dilations."""
    h, w = edge_free.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    dist2 = (
        (rows - seed_rc[0]).astype(jnp.float32) ** 2
        + (cols - seed_rc[1]).astype(jnp.float32) ** 2
    )
    allowed = edge_free & (jnp.sqrt(dist2) < max_pixel_distance)
    seed = jnp.zeros((h, w), bool).at[seed_rc[0], seed_rc[1]].set(True)

    def body(state):
        i, mask, changed = state
        new = mask | (_dilate8(mask) & allowed)
        return i + 1, new, jnp.any(new != mask)

    def cond(state):
        i, _mask, changed = state
        return (i < depth_limit - 1) & changed

    _, mask, _ = jax.lax.while_loop(cond, body, (0, seed, jnp.array(True)))
    return mask


def prune_edge_points(probs, edge_prob):
    """Zero the sampling probability of points sitting exactly on an edge
    (edge probability == 1, reference: src/stocs.cpp:521-535)."""
    return jnp.where(edge_prob == 1.0, 0.0, probs)


def segment_edge_max_probability(seg_mask, edge_prob_img, rc_a, rc_b):
    """Max edge probability along the raster line between two pixels — the
    reference's unused get_edge_probability_in_segment helper
    (src/stocs.cpp:537-557, cv::LineIterator), provided for capability
    parity. Uses a fixed-sample DDA instead of Bresenham."""
    n = 256
    t = jnp.linspace(0.0, 1.0, n)
    rr = jnp.round(rc_a[0] + t * (rc_b[0] - rc_a[0])).astype(jnp.int32)
    cc = jnp.round(rc_a[1] + t * (rc_b[1] - rc_a[1])).astype(jnp.int32)
    h, w = edge_prob_img.shape
    rr = jnp.clip(rr, 0, h - 1)
    cc = jnp.clip(cc, 0, w - 1)
    return jnp.max(edge_prob_img[rr, cc])
