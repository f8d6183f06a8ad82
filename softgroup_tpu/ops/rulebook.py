"""Sparse-convolution rulebook construction (device JAX + host numpy).

This replaces the external spconv 2.x engine's indice generation (the largest
hidden native component of the reference — SURVEY.md §2.2): `SubMConv3d`
k=3 rulebooks shared by `indice_key`, `SparseConv3d` k=2 s=2 downsampling and
`SparseInverseConv3d` upsampling (`softgroup/model/blocks.py:57-70,101-119`).

TPU-first formulation: a rulebook here is a dense (K, V) int32 gather table
("for output voxel v and kernel tap k, which input voxel feeds it; -1 if
none").  The convolution itself is then K gathers + K (V, Cin) x (Cin, Cout)
matmuls — large, static, MXU-shaped — see sparse_conv.py.

Geometry only depends on input coordinates, never on features or parameters,
so rulebooks are built once per batch: on the host by the data pipeline for
the backbone pyramid (overlapping the TPU step, like the reference's
collate-time voxelization), or on device (these functions are jittable) when
geometry depends on predictions (clusters_voxelization, pyramid_map).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from . import keys as K

# kernel tap offsets for 3x3x3 submanifold conv, index = (dx+1)*9+(dy+1)*3+(dz+1)
SUBM_OFFSETS = np.array(
    list(itertools.product((-1, 0, 1), repeat=3)), dtype=np.int32)  # (27, 3)
CENTER_TAP = 13  # (0, 0, 0)

# child offsets for k=2 s=2 conv, index = dx*4+dy*2+dz
DOWN_OFFSETS = np.array(
    list(itertools.product((0, 1), repeat=3)), dtype=np.int32)  # (8, 3)


def build_subm_rules(vox_coords: jax.Array, vox_valid: jax.Array,
                     dims: jax.Array) -> jax.Array:
    """(27, V) gather table for a 3^3 submanifold conv on this voxel set.

    Tap 13 (center) is the identity.  A single batched hash-join resolves all
    26 neighbour taps at once (one sort of 27*V keys), replacing spconv's
    per-layer GPU hash probes; the result is shared by every conv with the
    same `indice_key` in the reference (all blocks of one U-Net level).
    """
    v = vox_coords.shape[0]
    offs = jnp.asarray(SUBM_OFFSETS)  # (27, 3)
    q = vox_coords[None, :, :].repeat(27, axis=0)  # (27, V, 4)
    q = q.at[:, :, 1:].add(offs[:, None, :])
    q = q.reshape(-1, 4)
    q_hi, q_lo = K.pack_coords(q, dims)
    # out-of-range coords can collide with other cells after packing; mask them
    in_range = ((q[:, 1:] >= 0) & (q[:, 1:] < dims[None, :])).all(axis=1)
    q_valid = in_range & jnp.repeat(vox_valid[None, :], 27, axis=0).reshape(-1)
    q_hi, q_lo = K.mask_keys(q_hi, q_lo, q_valid)
    t_hi, t_lo = K.pack_coords(vox_coords, dims)
    rules = K.lookup(q_hi, q_lo, t_hi, t_lo, vox_valid).reshape(27, v)
    ident = jnp.where(vox_valid, jnp.arange(v, dtype=jnp.int32), -1)
    rules = rules.at[CENTER_TAP].set(ident)
    return rules


def build_downsample(vox_coords: jax.Array, vox_valid: jax.Array,
                     dims: jax.Array, capacity: int):
    """Voxel set for the next (2x coarser) level plus both-direction maps.

    Returns (out_coords (C,4), out_valid (C,), n_out,
             down_rules (8, C) child-index table for SparseConv3d k2s2,
             parent_idx (V,) fine->coarse voxel id (== capacity for invalid),
             child_tap (V,) which of the 8 taps each fine voxel occupies).

    Equivalent to spconv's strided indice generation; the inverse conv
    (`SparseInverseConv3d`, paired by indice_key) needs only (parent_idx,
    child_tap) — each fine voxel has exactly one parent at k=2 s=2, so the
    upsample is a plain gather + per-tap matmul with no scatter at all.
    """
    from .voxelize import voxelize  # local import to avoid cycle

    v = vox_coords.shape[0]
    parent_coords = jnp.concatenate(
        [vox_coords[:, :1],
         jnp.floor_divide(vox_coords[:, 1:], 2)], axis=1)
    coarse_dims = (dims + 1) // 2
    vx = voxelize(parent_coords, vox_valid, coarse_dims, capacity)
    parent_idx = vx.p2v  # (V,) fine voxel -> coarse voxel id, capacity if invalid
    xyz = vox_coords[:, 1:]
    child_tap = ((xyz[:, 0] & 1) * 4 + (xyz[:, 1] & 1) * 2
                 + (xyz[:, 2] & 1)).astype(jnp.int32)
    # scatter fine voxels into the (8, C) child table; no collisions possible
    # because (parent, tap) uniquely identifies a fine voxel.
    flat = jnp.where(vox_valid,
                     child_tap * (capacity + 1) + jnp.minimum(parent_idx, capacity),
                     8 * (capacity + 1) - 1)
    down_rules = jnp.full((8 * (capacity + 1),), -1, jnp.int32)
    down_rules = down_rules.at[flat].set(
        jnp.where(vox_valid, jnp.arange(v, dtype=jnp.int32), -1))
    down_rules = down_rules.reshape(8, capacity + 1)[:, :capacity]
    return vx.vox_coords, vx.vox_valid, vx.n_voxels, down_rules, parent_idx, child_tap


# ---------------------------------------------------------------------------
# Linear-key fast path (device): for grids with b*dx*dy*dz < 2^31 (the
# proposal grids of clusters_voxelization) — one batched sorted-searchsorted
# per rulebook instead of pair-key hash joins.
# ---------------------------------------------------------------------------

def build_subm_rules_linear(ckey: jax.Array, vox_coords: jax.Array,
                            vox_valid: jax.Array, dims: jax.Array) -> jax.Array:
    """(27, V) rulebook from a sorted linear key table (see voxelize_linear).

    Dispatch: the windowed sorted-key join kernel (join_kernel.py) replaces
    the searchsorted sort-join when eligible — the 27*V-query variadic sort
    + unsort scatter profiled at ~29 ms/train-step on the proposal grids
    (V=65536); the kernel's sequential window DMA + per-block compares run
    in ~2 ms.  Falls back to XLA in-kernel on window overflow."""
    v = ckey.shape[0]
    xyz = vox_coords[:, 1:]
    offs_np = SUBM_OFFSETS
    non_center = [i for i in range(27) if i != CENTER_TAP]
    from .dispatch import kernel_interpret, kernels_enabled
    if kernels_enabled() and v % 256 == 0 and v >= 768:
        from .join_kernel import sorted_key_rules_join
        rules26 = sorted_key_rules_join(
            jnp.where(vox_valid, ckey, jnp.iinfo(jnp.int32).max), xyz, dims,
            tuple(map(tuple, offs_np[non_center].tolist())),
            block_b=256, window_w=768, interpret=kernel_interpret())
        ident = jnp.where(vox_valid, jnp.arange(v, dtype=jnp.int32), -1)
        rules = jnp.concatenate(
            [rules26[:CENTER_TAP], ident[None, :], rules26[CENTER_TAP:]],
            axis=0)
        return rules
    dyz = dims[1] * dims[2]
    offs = jnp.asarray(offs_np)                          # (27, 3)
    deltas = offs[:, 0] * dyz + offs[:, 1] * dims[2] + offs[:, 2]
    in_lo = xyz
    in_hi = dims[None, :] - 1 - xyz
    ok = vox_valid[None, :] \
        & (offs[:, :, None] + in_lo.T[None] >= 0).all(axis=1) \
        & (offs[:, :, None] <= in_hi.T[None]).all(axis=1)
    q = ckey[None, :] + deltas[:, None]
    pos = jnp.searchsorted(ckey, q.reshape(-1), side='left', method='sort') \
        .astype(jnp.int32).reshape(27, v)
    pc = jnp.clip(pos, 0, v - 1)
    hit = ok & (pos < v) & (ckey[pc] == q)
    rules = jnp.where(hit, pc, -1)
    ident = jnp.where(vox_valid, jnp.arange(v, dtype=jnp.int32), -1)
    return rules.at[CENTER_TAP].set(ident)


def build_downsample_linear(vox_coords: jax.Array, vox_valid: jax.Array,
                            dims: jax.Array, capacity: int):
    """Linear-key version of build_downsample (same outputs + coarse ckey)."""
    from .voxelize import voxelize_linear

    v = vox_coords.shape[0]
    parent_coords = jnp.concatenate(
        [vox_coords[:, :1], jnp.floor_divide(vox_coords[:, 1:], 2)], axis=1)
    coarse_dims = (dims + 1) // 2
    vx, ckey = voxelize_linear(parent_coords, vox_valid, coarse_dims,
                               capacity)
    parent_idx = vx.p2v
    xyz = vox_coords[:, 1:]
    child_tap = ((xyz[:, 0] & 1) * 4 + (xyz[:, 1] & 1) * 2
                 + (xyz[:, 2] & 1)).astype(jnp.int32)
    flat = jnp.where(vox_valid,
                     child_tap * (capacity + 1) + jnp.minimum(parent_idx,
                                                              capacity),
                     8 * (capacity + 1) - 1)
    down_rules = jnp.full((8 * (capacity + 1),), -1, jnp.int32)
    down_rules = down_rules.at[flat].set(
        jnp.where(vox_valid, jnp.arange(v, dtype=jnp.int32), -1))
    down_rules = down_rules.reshape(8, capacity + 1)[:, :capacity]
    return (vx.vox_coords, vx.vox_valid, vx.n_voxels, down_rules, parent_idx,
            child_tap, ckey, coarse_dims)


# ---------------------------------------------------------------------------
# Host (numpy) versions — exact shapes, used by the input pipeline so the TPU
# step receives ready-made static geometry (the irregular work overlaps with
# device compute, the TPU-native analogue of collate-time voxelization).
# ---------------------------------------------------------------------------

def _keys_np(coords: np.ndarray) -> np.ndarray:
    c = coords.astype(np.int64)
    return (c[:, 0] << 48) | (c[:, 1] << 32) | (c[:, 2] << 16) | c[:, 3]


def build_subm_rules_np(vox_coords: np.ndarray, dims: np.ndarray) -> np.ndarray:
    """(27, M) gather table, -1 for missing neighbours; numpy oracle/host path."""
    m = len(vox_coords)
    table = _keys_np(vox_coords)
    order = np.argsort(table)
    sorted_keys = table[order]
    rules = np.full((27, m), -1, np.int32)
    for k, off in enumerate(SUBM_OFFSETS):
        if k == CENTER_TAP:
            rules[k] = np.arange(m, dtype=np.int32)
            continue
        q = vox_coords.copy()
        q[:, 1:] += off
        in_range = ((q[:, 1:] >= 0) & (q[:, 1:] < dims)).all(axis=1)
        qk = _keys_np(q)
        pos = np.searchsorted(sorted_keys, qk)
        pos = np.clip(pos, 0, m - 1)
        hit = (sorted_keys[pos] == qk) & in_range
        rules[k] = np.where(hit, order[pos], -1).astype(np.int32)
    return rules


def build_downsample_np(vox_coords: np.ndarray):
    """Host version of build_downsample; returns
    (out_coords (C,4), down_rules (8,C), parent_idx (M,), child_tap (M,))."""
    from .voxelize import voxelize_np

    parent_coords = vox_coords.copy()
    parent_coords[:, 1:] //= 2
    out_coords, parent_idx, _ = voxelize_np(parent_coords)
    c = len(out_coords)
    xyz = vox_coords[:, 1:]
    child_tap = ((xyz[:, 0] & 1) * 4 + (xyz[:, 1] & 1) * 2
                 + (xyz[:, 2] & 1)).astype(np.int32)
    down_rules = np.full((8, c), -1, np.int32)
    down_rules[child_tap, parent_idx] = np.arange(len(vox_coords), dtype=np.int32)
    return out_coords, down_rules, parent_idx, child_tap
