"""Voxel key packing, sorting, dedup and hash-join lookups (device-side).

This is the L0 "sparse core" of the framework: every irregular structure in
the reference implementation (the `google::dense_hash_map` voxel dedup in
`softgroup/ops/src/voxelize/voxelize.cpp`, spconv's rulebook hash tables, the
octree in `octree_ball_query.cpp`) is re-expressed here as sort-based
primitives over packed integer keys, which is the XLA/TPU-friendly
formulation: static shapes, no data-dependent allocation, everything maps to
`sort` / `scan` / `gather` / `scatter` HLOs.

Keys are *pairs* of int32 (`hi`, `lo`) rather than a single int64 so that no
64-bit integer emulation is needed on TPU:

    hi = batch * dim_x + x          (requires batch * dim_x * 1 < 2**31)
    lo = y * dim_z + z              (requires dim_y * dim_z  < 2**31)

which supports spatial extents up to ~46k^2 per (y, z) plane and arbitrary
x-extent times batch up to 2**31 — far beyond any SoftGroup workload (the
largest reference scenes are S3DIS rooms at ~1500 voxels/dim,
`configs/softgroup/softgroup_s3dis_fold5.yaml`).

Invalid/padding entries use `INVALID_KEY` = int32 max so they sort to the end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INVALID_KEY = jnp.iinfo(jnp.int32).max


def pack_coords(coords: jax.Array, dims: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pack (N, 4) int32 coords ``(b, x, y, z)`` into (hi, lo) int32 key pairs.

    ``dims`` is a length-3 int32 array ``(dim_x, dim_y, dim_z)`` (runtime
    values are fine — they only enter as multipliers).
    """
    coords = coords.astype(jnp.int32)
    dims = dims.astype(jnp.int32)
    hi = coords[:, 0] * dims[0] + coords[:, 1]
    lo = coords[:, 2] * dims[2] + coords[:, 3]
    return hi, lo


def mask_keys(hi: jax.Array, lo: jax.Array, valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Replace keys of invalid entries with INVALID_KEY so they sort last."""
    return (
        jnp.where(valid, hi, INVALID_KEY),
        jnp.where(valid, lo, INVALID_KEY),
    )


def lexsort_keys(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Return the permutation sorting by (hi, lo) ascending (stable)."""
    return jnp.lexsort((lo, hi))


def first_occurrence_mask(hi_sorted: jax.Array, lo_sorted: jax.Array,
                          valid_sorted: jax.Array) -> jax.Array:
    """Mark the first entry of each run of equal (valid) keys in sorted order."""
    prev_hi = jnp.concatenate([jnp.full((1,), -1, hi_sorted.dtype), hi_sorted[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), -1, lo_sorted.dtype), lo_sorted[:-1]])
    is_new = (hi_sorted != prev_hi) | (lo_sorted != prev_lo)
    return is_new & valid_sorted


def lookup(q_hi: jax.Array, q_lo: jax.Array, t_hi: jax.Array,
           t_lo: jax.Array, t_valid: jax.Array | None = None) -> jax.Array:
    """Hash-join: for each query key return its index in the table, or -1.

    The table must have unique keys among valid entries.  Implemented as a
    tagged merge-sort join (concatenate, lexsort with table entries ordered
    before equal-keyed queries, running-max scan of table indices, then a
    key-equality check) — the deterministic XLA replacement for the
    reference's GPU hash probes.

    Complexity: one variadic sort of (T + Q) elements; this is the dominant
    cost of device-side rulebook construction and is paid once per geometry,
    not per conv layer.
    """
    nt = t_hi.shape[0]
    nq = q_hi.shape[0]
    if t_valid is not None:
        t_hi, t_lo = mask_keys(t_hi, t_lo, t_valid)
    hi = jnp.concatenate([t_hi, q_hi])
    lo = jnp.concatenate([t_lo, q_lo])
    is_q = jnp.concatenate(
        [jnp.zeros((nt,), jnp.int32), jnp.ones((nq,), jnp.int32)])
    payload = jnp.concatenate([
        jnp.arange(nt, dtype=jnp.int32),
        jnp.arange(nq, dtype=jnp.int32),
    ])
    order = jnp.lexsort((is_q, lo, hi))
    hi_s = hi[order]
    lo_s = lo[order]
    isq_s = is_q[order]
    pay_s = payload[order]

    tab_idx = jnp.where(isq_s == 0, pay_s, -1)
    last_tab = jax.lax.associative_scan(jnp.maximum, tab_idx)
    lt = jnp.clip(last_tab, 0, max(nt - 1, 0))
    ok = (last_tab >= 0) & (t_hi[lt] == hi_s) & (t_lo[lt] == lo_s) \
        & (hi_s != INVALID_KEY)
    res_sorted = jnp.where(ok, last_tab, -1)

    # Scatter results back to query order; non-query rows write to a spill slot.
    dst = jnp.where(isq_s == 1, pay_s, nq)
    out = jnp.full((nq + 1,), -1, jnp.int32).at[dst].set(res_sorted)
    return out[:nq]


def unique_keys(hi: jax.Array, lo: jax.Array, valid: jax.Array,
                capacity: int) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Deduplicate keys into at most ``capacity`` unique slots.

    Equivalent of `voxelize_idx`'s hash dedup (`voxelize.cpp:59-165`) but
    producing voxels in *sorted key order* rather than first-seen order (a
    permutation — downstream compute is order-invariant because features are
    always gathered back through the returned maps).

    Returns:
      uniq_pos:  (capacity,) int32 — index into the input of the first entry
                 of each unique key (undefined where ``uniq_valid`` is False).
      uniq_valid:(capacity,) bool
      inv_map:   (N,) int32 — for each input entry, the id of its unique slot;
                 invalid inputs map to ``capacity`` (a dustbin segment).
      n_unique:  () int32 — number of unique valid keys (may exceed capacity —
                 callers that care must check).
    """
    n = hi.shape[0]
    hi, lo = mask_keys(hi, lo, valid)
    order = lexsort_keys(hi, lo)
    hi_s, lo_s = hi[order], lo[order]
    valid_s = hi_s != INVALID_KEY
    first = first_occurrence_mask(hi_s, lo_s, valid_s)
    uid_s = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_unique = uid_s[-1] + 1 if n > 0 else jnp.int32(0)
    n_unique = jnp.where(valid_s.any(), n_unique, 0)
    uid_s = jnp.where(valid_s, jnp.minimum(uid_s, capacity - 1), capacity)

    # first-occurrence positions (in original input order) per unique id
    src_pos = order.astype(jnp.int32)
    dst = jnp.where(first, uid_s, capacity)
    uniq_pos = jnp.zeros((capacity + 1,), jnp.int32).at[dst].set(src_pos)[:capacity]
    uniq_valid = jnp.arange(capacity) < jnp.minimum(n_unique, capacity)

    # inverse map back to original order
    inv_map = jnp.zeros((n,), jnp.int32).at[order].set(uid_s)
    return uniq_pos, uniq_valid, inv_map, n_unique
