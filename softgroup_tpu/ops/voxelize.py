"""Voxelization: dedup integer coords and average point features per voxel.

Replaces the reference's `voxelize_idx` host hash-map dedup
(`softgroup/ops/src/voxelize/voxelize.cpp:59-165`) and the `voxelize_fp`
gather-mean CUDA kernel (`voxelize.cu:9-40`).

Two implementations with identical semantics:
  * `voxelize` — device-side, jit-compatible, static capacity + masks.  Used
    inside the model for clusters_voxelization and the SoftGroup++ pyramid
    map, where voxelization depends on network predictions.
  * `voxelize_np` — host-side numpy, exact dynamic shapes.  Used by the data
    pipeline (the reference also voxelizes on the host, in the DataLoader's
    collate, `softgroup/data/custom.py:239`).

Deviation from the reference (documented): voxels come out in sorted key
order rather than first-seen order.  This is a permutation; every consumer
gathers through the returned maps so results are unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import keys as K
from .segment import segment_mean


class Voxelized(NamedTuple):
    """Static-capacity voxelization result.

    vox_coords: (capacity, 4) int32 (b, x, y, z); rows past n_voxels undefined
    vox_valid:  (capacity,) bool
    p2v:        (N,) int32 point -> voxel id; invalid points -> capacity
    n_voxels:   () int32 (true count; caller must ensure <= capacity)
    """
    vox_coords: jax.Array
    vox_valid: jax.Array
    p2v: jax.Array
    n_voxels: jax.Array


def voxelize(coords: jax.Array, valid: jax.Array, dims: jax.Array,
             capacity: int) -> Voxelized:
    """Device-side voxelization of (N, 4) int32 coords ``(b, x, y, z)``."""
    hi, lo = K.pack_coords(coords, dims)
    uniq_pos, uniq_valid, inv_map, n_unique = K.unique_keys(hi, lo, valid, capacity)
    vox_coords = coords[jnp.clip(uniq_pos, 0, coords.shape[0] - 1)]
    vox_coords = jnp.where(uniq_valid[:, None], vox_coords, 0)
    # route invalid points (and overflow beyond capacity) to the dustbin
    p2v = jnp.where(valid, inv_map, capacity)
    return Voxelized(vox_coords.astype(jnp.int32), uniq_valid, p2v, n_unique)


def voxelize_linear(coords: jax.Array, valid: jax.Array, dims: jax.Array,
                    capacity: int):
    """Fast device voxelization on single-int32 linear keys.

    Requires b_max * dims[0] * dims[1] * dims[2] < 2^31 (always true for the
    proposal grids of clusters_voxelization: <= 1024 proposals x 20^3 cells).
    One argsort instead of the generic pair-key lexsort machinery.

    Returns (Voxelized, sorted_unique_keys (capacity,) int32 INT_MAX-padded)
    — the key table feeds linear-key rulebook builds directly.
    """
    imax = jnp.iinfo(jnp.int32).max
    c = coords.astype(jnp.int32)
    key = (((c[:, 0] * dims[0] + c[:, 1]) * dims[1] + c[:, 2]) * dims[2]
           + c[:, 3])
    key = jnp.where(valid, key, imax)
    n = key.shape[0]
    idxs = jnp.arange(n, dtype=jnp.int32)
    # one multi-operand sort carries the permutation with the key (argsort +
    # a separate key gather is two passes)
    key_s, order = jax.lax.sort((key, idxs), num_keys=1)
    valid_s = key_s != imax
    prev = jnp.concatenate([jnp.full((1,), -1, key_s.dtype), key_s[:-1]])
    first = valid_s & (key_s != prev)
    uid_s = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_unique = jnp.maximum(uid_s[-1] + 1, 0)
    # overflow beyond capacity goes to the dustbin row like invalid points
    # (matching `voxelize`); clipping into capacity-1 would silently merge
    # distinct voxels into the last row
    uid_s = jnp.where(valid_s & (uid_s < capacity), uid_s, capacity)
    # voxel table rows via top_k compaction of the first-occurrence
    # positions (ascending — same trick as forward_grouping) + gathers;
    # XLA's scatter alternative costs ~10 ns/row over all n entries
    big = jnp.int32(n)
    k_top = min(capacity, n)
    fpos = -jax.lax.top_k(jnp.where(first, -idxs, -big), k_top)[0]
    if k_top < capacity:
        fpos = jnp.concatenate(
            [fpos, jnp.full((capacity - k_top,), big, jnp.int32)])
    uniq_valid = fpos < big
    fpos_c = jnp.clip(fpos, 0, n - 1)
    rep = order[fpos_c]
    vox_coords = jnp.where(uniq_valid[:, None],
                           c[jnp.clip(rep, 0, n - 1)], 0).astype(jnp.int32)
    ckey = jnp.where(uniq_valid, key_s[fpos_c], imax)
    p2v = jnp.zeros((n,), jnp.int32).at[order].set(uid_s)
    p2v = jnp.where(valid, p2v, capacity)
    return Voxelized(vox_coords, uniq_valid, p2v, n_unique), ckey


def voxel_features(point_feats: jax.Array, p2v: jax.Array, capacity: int) -> jax.Array:
    """Mean point features per voxel — `voxelization` in the reference
    (`softgroup/ops/functions.py:200-234`), differentiable."""
    return segment_mean(point_feats, p2v, capacity)


def devoxelize(vox_feats: jax.Array, p2v: jax.Array) -> jax.Array:
    """Gather voxel features back to points — `output_feats[input_map]`
    (`softgroup/model/softgroup.py:374`).  Out-of-range p2v (invalid points)
    clamps to the last row; callers mask those rows.

    The pipeline sorts points by voxel rank (data/padding.py), so p2v is
    non-decreasing and the gather dispatches to the monotone windowed
    kernel (a block of 256 points spans <= 256 voxel rows, so w=512 can
    never drop an entry; the overflow guard covers device-built batches
    with arbitrary order).  bf16 feats only — the kernel's f32 path would
    need the bf16x3 split, and production backbone feats are bf16.

    Differentiable: the custom VJP's backward is the gather transpose —
    one segment-sum of the point cotangents over p2v (identical to what
    autodiff emitted for the plain-gather formulation)."""
    v = vox_feats.shape[0]
    idx = jnp.clip(p2v, 0, v - 1)
    from .dispatch import kernels_enabled
    if (kernels_enabled() and vox_feats.dtype == jnp.bfloat16
            and vox_feats.ndim == 2 and vox_feats.shape[1] <= 128
            and p2v.shape[0] % 256 == 0 and v >= 512):
        # raw p2v rides along UNUSED by the primal (pads >= v) so the
        # BACKWARD can segment-sum without the capacity-pad tail: clipped
        # to v-1 the tail funnels into one segment and overflows any
        # window, forcing the segsum kernel's fallback every step.  (The
        # primal keeps the exact pre-existing op structure — moving the
        # clip inside the custom_vjp measured +111 ms/scan on the
        # inference bench, an XLA scheduling artifact.)
        return _devox_vjp(vox_feats, idx, p2v)
    return vox_feats[idx]


@jax.custom_vjp
def _devox_vjp(vox_feats, idx, p2v):
    from .dispatch import kernel_interpret
    from .gather_kernel import (monotone_row_gather,
                                monotone_window_overflow)
    v = vox_feats.shape[0]
    n_bad = monotone_window_overflow(idx, 256, 512, v)
    return jax.lax.cond(
        n_bad == 0,
        lambda: monotone_row_gather(
            vox_feats, idx, block_b=256, window_w=512,
            interpret=kernel_interpret()).astype(vox_feats.dtype),
        lambda: vox_feats[idx])


def _devox_fwd(vox_feats, idx, p2v):
    # residuals must be jax types: a zero-size prototype carries (V, dtype)
    proto = jnp.zeros((vox_feats.shape[0], 0), vox_feats.dtype)
    return _devox_vjp(vox_feats, idx, p2v), (p2v, proto)


def _devox_bwd(res, g):
    p2v, proto = res
    v = proto.shape[0]
    from .dispatch import kernel_interpret, kernels_enabled
    def _segsum_fallback():
        return jax.ops.segment_sum(g.astype(jnp.float32),
                                   jnp.clip(p2v, 0, v - 1), num_segments=v)

    if (kernels_enabled() and g.dtype == jnp.bfloat16 and g.ndim == 2
            and g.shape[1] <= 128 and v % 256 == 0
            and g.shape[0] % 128 == 0 and g.shape[0] >= 1024):
        # sorted p2v => the gather transpose is a monotone segment sum;
        # the windowed kernel replaces XLA's serial scatter-add (~78 ms
        # for (1M, 32) cotangents at batch-4 bench scale).  Pad rows
        # (p2v >= v) drop out of the one-hot; the forward clips them to
        # row v-1, so their (loss-masked, normally zero) cotangent is
        # re-added there to keep the exact gather transpose.  The kernel's
        # searchsorted block bounds are only valid on non-decreasing p2v;
        # the host pipeline sorts points by voxel rank, but device-built
        # arbitrary-order batches fall back to the plain segment-sum
        # (ADVICE r04: without this guard an unsorted p2v would silently
        # produce wrong gradients).
        def _kernel():
            from .gather_kernel import monotone_segment_sum
            gv = monotone_segment_sum(g, p2v, v,
                                      interpret=kernel_interpret())
            pad = p2v >= v
            pad_sum = jnp.sum(
                jnp.where(pad[:, None], g.astype(jnp.float32), 0.0), axis=0)
            return gv.at[v - 1].add(pad_sum)

        sorted_p2v = jnp.all(p2v[1:] >= p2v[:-1])
        gv = jax.lax.cond(sorted_p2v, _kernel, _segsum_fallback)
    else:
        gv = _segsum_fallback()
    return gv.astype(proto.dtype), None, None


_devox_vjp.defvjp(_devox_fwd, _devox_bwd)


def voxelize_np(coords: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host voxelization with exact shapes.

    Args:
      coords: (N, 4) int array (b, x, y, z).
    Returns:
      vox_coords (M, 4) int32 in sorted key order, p2v (N,) int32,
      counts (M,) int32.
    """
    coords = np.asarray(coords)
    # int64 keys are free on the host
    key = ((coords[:, 0].astype(np.int64) << 48)
           | (coords[:, 1].astype(np.int64) << 32)
           | (coords[:, 2].astype(np.int64) << 16)
           | coords[:, 3].astype(np.int64))
    uniq, p2v, counts = np.unique(key, return_inverse=True, return_counts=True)
    first = np.zeros(len(uniq), dtype=np.int64)
    # first occurrence position per unique key (np.unique sorts keys; gather any
    # representative — coords are identical within a voxel)
    first[p2v[::-1]] = np.arange(len(coords) - 1, -1, -1)
    vox_coords = coords[first].astype(np.int32)
    return vox_coords, p2v.astype(np.int32), counts.astype(np.int32)
