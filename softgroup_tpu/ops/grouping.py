"""Soft grouping: fixed-radius clustering of offset-shifted points, on device.

Replaces the reference's grouping pipeline — `ballquery_batch_p` (O(n^2) CUDA
scan with atomic compaction + host retry loop, `ops/src/bfs_cluster/
bfs_cluster.cu:15-101`, `ops/functions.py:237-275`) followed by a *serial
host* BFS over the adjacency (`bfs_cluster.cpp:33-126`, forced `.cpu()` sync
at `softgroup/model/softgroup.py:458`) — with a single jittable routine:

  1. bucket points into a uniform grid of cell size = radius (keys.py);
  2. build a fixed-capacity per-point candidate list from the 27 neighbouring
     cells (rank-window within the own cell, head-of-cell elsewhere), each
     candidate distance-verified against the exact radius;
  3. connected components by min-label propagation + pointer jumping
     (O(log n) rounds, `lax.while_loop`), entirely on device.

Differences vs the reference (by design): candidate lists are truncated at a
static capacity instead of the reference's 1000-neighbour cap with
nondeterministic atomicAdd ordering — our truncation is deterministic, and
label propagation only needs *some* connecting path, not the full adjacency,
so dense blobs (the common case after offset shifting) are insensitive to the
cap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import keys as K

# 26 non-center cell offsets (Chebyshev-1 neighbourhood)
_CELL_OFFSETS = np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
     for dz in (-1, 0, 1) if (dx, dy, dz) != (0, 0, 0)], np.int32)


def ball_cluster(shifted: jax.Array, batch_idxs: jax.Array, valid: jax.Array,
                 radius: float, neighbors_per_cell: int = 4,
                 own_window: int = 4, max_rounds: int = 64) -> jax.Array:
    """Cluster points into connected components of the radius graph.

    Args:
      shifted: (N, 3) float32 — offset-shifted coordinates.
      batch_idxs: (N,) int32 — points of different batch items never connect
        (the reference's per-batch ball query, `bfs_cluster.cu:23-30`).
      valid: (N,) bool.
      radius: connection radius (`grouping_cfg.radius`).
    Returns:
      labels: (N,) int32 — component representative (min point index in the
      component) per point; -1 for invalid points.
    """
    n = shifted.shape[0]
    s = radius  # cell size == radius: any pair within r lies in adjacent cells
    mn = jnp.min(jnp.where(valid[:, None], shifted, jnp.inf), axis=0)
    mn = jnp.where(jnp.isfinite(mn), mn, 0.0)
    cell = jnp.floor((shifted - mn[None, :]) / s).astype(jnp.int32)
    cell = jnp.maximum(cell, 0)
    cell4 = jnp.concatenate([batch_idxs[:, None].astype(jnp.int32), cell], 1)
    dims = jnp.max(jnp.where(valid[:, None], cell, 0), axis=0) + 2

    hi, lo = K.pack_coords(cell4, dims)
    hi, lo = K.mask_keys(hi, lo, valid)
    order = K.lexsort_keys(hi, lo)              # sorted position -> point
    hi_s, lo_s = hi[order], lo[order]
    valid_s = hi_s != K.INVALID_KEY
    first = K.first_occurrence_mask(hi_s, lo_s, valid_s)
    pos_in_sorted = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))         # point -> sorted position

    # run-start position per sorted entry (for within-cell ranks)
    idxs = jnp.arange(n, dtype=jnp.int32)
    run_start_s = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, idxs, -1))
    run_start_s = jnp.maximum(run_start_s, 0)

    # unique-cell table: start position and count per cell
    cell_id_s = jnp.cumsum(first.astype(jnp.int32)) - 1       # per sorted entry
    cell_id_s = jnp.where(valid_s, cell_id_s, n)
    cell_start = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.where(first, cell_id_s, n)].set(idxs)[:n]
    cell_count = jnp.zeros((n + 1,), jnp.int32).at[cell_id_s].add(1)[:n]
    # cell key table (hi/lo of each unique cell), scattered from firsts
    def _scatter_first(src):
        return jnp.zeros((n + 1,), jnp.int32).at[
            jnp.where(first, cell_id_s, n)].set(src)[:n]
    tab_hi = _scatter_first(jnp.where(first, hi_s, 0))
    tab_lo = _scatter_first(jnp.where(first, lo_s, 0))
    tab_valid = jnp.zeros((n + 1,), bool).at[
        jnp.where(first, cell_id_s, n)].set(first)[:n]

    # --- candidate list -----------------------------------------------------
    cands = []
    # (a) own-cell rank window: previous own_window points in sorted order,
    # clipped at the cell run start (densest links in collapsed blobs).
    my_pos = pos_in_sorted
    my_start = run_start_s[jnp.clip(my_pos, 0, n - 1)]
    for w in range(1, own_window + 1):
        p = my_pos - w
        ok = p >= my_start
        cands.append(jnp.where(ok, order[jnp.clip(p, 0, n - 1)], -1))
    # (b) neighbour cells: first `neighbors_per_cell` points of each of the
    # 26 adjacent cells, resolved with one batched hash-join.
    offs = jnp.asarray(_CELL_OFFSETS)
    q = cell4[None, :, :].repeat(26, axis=0)
    q = q.at[:, :, 1:].add(offs[:, None, :]).reshape(-1, 4)
    q_hi, q_lo = K.pack_coords(q, dims)
    q_valid = jnp.repeat(valid[None, :], 26, axis=0).reshape(-1) \
        & (q[:, 1:] >= 0).all(axis=1)
    q_hi, q_lo = K.mask_keys(q_hi, q_lo, q_valid)
    ncell = K.lookup(q_hi, q_lo, tab_hi, tab_lo, tab_valid).reshape(26, n)
    for j in range(neighbors_per_cell):
        c = jnp.clip(ncell, 0, n - 1)
        p = cell_start[c] + j
        ok = (ncell >= 0) & (j < cell_count[c])
        cands.append(jnp.where(ok, order[jnp.clip(p, 0, n - 1)], -1)
                     .reshape(26 * n))
    own = jnp.stack(cands[:own_window], 0)                  # (W, N)
    nb = jnp.stack(cands[own_window:], 0).reshape(-1, n)    # (26*J, N)
    cand = jnp.concatenate([own, nb], 0).T                  # (N, C)

    # distance check (exact radius) + validity
    ci = jnp.clip(cand, 0, n - 1)
    d2 = jnp.sum(jnp.square(shifted[:, None, :] - shifted[ci]), axis=-1)
    ok = (cand >= 0) & valid[:, None] & valid[ci] & (d2 <= radius * radius)
    cand = jnp.where(ok, cand, -1)

    # --- min-label propagation + pointer jumping ---------------------------
    init = jnp.where(valid, idxs, n)

    def body(state):
        lab, _, rounds = state
        # forward: take the min label over my candidates
        cl = jnp.where(cand >= 0, lab[jnp.clip(cand, 0, n - 1)], n)
        new = jnp.minimum(lab, cl.min(axis=1))
        # reverse: push my label onto my candidates (edges are undirected;
        # candidate lists are asymmetric, so a scatter-min closes the loop)
        dst = jnp.where(cand >= 0, cand, n)
        src = jnp.broadcast_to(new[:, None], cand.shape)
        new = jnp.concatenate([new, jnp.full((1,), n, new.dtype)]) \
            .at[dst].min(src)[:n]
        # pointer jumping: follow representatives (labels are point indices)
        for _ in range(2):
            new = jnp.minimum(new, new[jnp.clip(new, 0, n - 1)])
        return new, jnp.any(new != lab), rounds + 1

    def cond(state):
        return state[1] & (state[2] < max_rounds)

    labels, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(valid, labels, -1)
