"""Grid pyramid: the precomputed multi-level sparse geometry for a U-Net pass.

The reference builds spconv index structures lazily inside the forward
(cached per `indice_key`).  Tpu-native design: geometry depends only on the
input coordinates, so we *separate geometry from compute* — one builder
produces the full per-level voxel sets and rulebooks (on host in the input
pipeline, or on device when geometry derives from predictions), and the
network forward is then a pure static-shape dense program.

Pyramid level l corresponds to the reference UBlock recursion depth l
(`softgroup/model/blocks.py:82-143`): level voxels carry the `subm{l+1}`
3^3 rulebook shared by all ResidualBlocks of that level, plus the
`spconv{l+1}` k2s2 maps down to level l+1 and back up.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .rulebook import (build_downsample, build_downsample_np, build_subm_rules,
                       build_subm_rules_np)
from .voxelize import Voxelized, voxelize, voxelize_np


@struct.dataclass
class LevelGeom:
    """Static-capacity geometry of one pyramid level.

    Two interchangeable encodings of the neighbour structure:
      * explicit rulebooks (subm_rules / down_rules) — host-precomputed for
        the backbone pyramid;
      * a sorted linear-key table (ckey + static spatial_d) — for
        device-built proposal-grid geometry, resolved in-kernel by the
        keyed windowed conv (ops/conv_kernel.py) with no rulebook at all.
    """
    vox_coords: jax.Array   # (V, 4) int32
    vox_valid: jax.Array    # (V,) bool
    subm_rules: jax.Array | None   # (27, V) int32, -1 = missing neighbour
    # maps to the next (coarser) level; last level carries dummies
    down_rules: jax.Array | None    # (8, V_next) int32 into this level
    parent_idx: jax.Array | None    # (V,) int32 into next level (V_next if invalid)
    child_tap: jax.Array | None     # (V,) int32 in [0, 8)
    dims: jax.Array        # (3,) int32 spatial extent at this level
    ckey: jax.Array | None = None   # (V,) sorted linear keys (keyed levels)
    spatial_d: int = struct.field(pytree_node=False, default=0)
    # host-precomputed windowed-conv metadata (conv_kernel.WindowMeta) for
    # subm_rules / down_rules — window geometry + compacted overflow
    # correction entries, so the device program does zero window work
    # (built in data/padding.py; None for device-built pyramids)
    subm_win: object | None = None
    down_win: object | None = None


@struct.dataclass
class Pyramid:
    levels: tuple[LevelGeom, ...] = struct.field(pytree_node=True)
    p2v: jax.Array = None          # (P,) int32 point -> level-0 voxel (cap if pad)
    point_valid: jax.Array = None  # (P,) bool


def build_pyramid(coords: jax.Array, valid: jax.Array, dims: jax.Array,
                  num_levels: int, capacities: Sequence[int]) -> Pyramid:
    """Device-side pyramid builder (jittable).

    Args:
      coords: (P, 4) int32 point coords (b, x, y, z), already scaled/clipped.
      valid: (P,) bool.
      dims: (3,) int32 level-0 spatial extent.
      capacities: static per-level voxel capacities, len == num_levels.
    """
    vx: Voxelized = voxelize(coords, valid, dims, capacities[0])
    levels = []
    cur_coords, cur_valid, cur_dims = vx.vox_coords, vx.vox_valid, dims
    for lvl in range(num_levels):
        subm = build_subm_rules(cur_coords, cur_valid, cur_dims)
        if lvl + 1 < num_levels:
            (nxt_coords, nxt_valid, _, down_rules, parent_idx,
             child_tap) = build_downsample(cur_coords, cur_valid, cur_dims,
                                           capacities[lvl + 1])
            levels.append(LevelGeom(cur_coords, cur_valid, subm, down_rules,
                                    parent_idx, child_tap, cur_dims))
            cur_coords, cur_valid = nxt_coords, nxt_valid
            cur_dims = (cur_dims + 1) // 2
        else:
            levels.append(LevelGeom(cur_coords, cur_valid, subm, None, None,
                                    None, cur_dims))
    return Pyramid(levels=tuple(levels), p2v=vx.p2v, point_valid=valid)


def build_pyramid_np(coords: np.ndarray, dims: np.ndarray, num_levels: int,
                     capacities: Sequence[int] | None = None) -> Pyramid:
    """Host pyramid builder with exact (or bucket-padded) shapes.

    When ``capacities`` is given, every per-level array is padded to the
    static capacity so repeated calls produce identical shapes (no
    recompilation across batches).

    Uses the native C++ kernels (ops/native.py) when available, numpy
    otherwise — identical outputs (tested in test_native.py).
    """
    from . import native
    if native.use_native():
        return _build_pyramid_native(np.asarray(coords), dims, num_levels,
                                     capacities)
    vox_coords, p2v, _ = voxelize_np(np.asarray(coords))
    n_pts = len(p2v)
    levels = []
    cur = vox_coords
    cur_dims = np.asarray(dims, np.int64)
    for lvl in range(num_levels):
        cap = capacities[lvl] if capacities is not None else len(cur)
        if len(cur) > cap:
            raise ValueError(
                f"level {lvl}: {len(cur)} voxels exceed capacity {cap}")
        subm = build_subm_rules_np(cur, cur_dims)
        if lvl + 1 < num_levels:
            nxt, down_rules, parent_idx, child_tap = build_downsample_np(cur)
            cap_next = (capacities[lvl + 1] if capacities is not None
                        else len(nxt))
            if len(nxt) > cap_next:
                raise ValueError(
                    f"level {lvl + 1}: {len(nxt)} voxels exceed {cap_next}")
            lv = _pad_level(cur, subm, down_rules, parent_idx, child_tap,
                            cap, cap_next, cur_dims)
            levels.append(lv)
            cur = nxt
            cur_dims = (cur_dims + 1) // 2
        else:
            lv = _pad_level(cur, subm, None, None, None, cap, 0, cur_dims)
            levels.append(lv)
    cap0 = capacities[0] if capacities is not None else len(vox_coords)
    return Pyramid(
        levels=tuple(levels),
        p2v=jnp.asarray(np.minimum(p2v, cap0), jnp.int32),
        point_valid=jnp.ones((n_pts,), bool),
    )


def _build_pyramid_native(coords, dims, num_levels, capacities):
    from . import native
    vox_coords, p2v, m = native.voxelize_native(coords)
    levels = []
    cur = vox_coords
    cur_dims = np.asarray(dims, np.int64)
    for lvl in range(num_levels):
        cap = capacities[lvl] if capacities is not None else len(cur)
        if len(cur) > cap:
            raise ValueError(
                f"level {lvl}: {len(cur)} voxels exceed capacity {cap}")
        subm = native.subm_rules_native(cur, cur_dims)
        if lvl + 1 < num_levels:
            nxt, down_rules, parent_idx, child_tap = \
                native.downsample_native(cur)
            cap_next = (capacities[lvl + 1] if capacities is not None
                        else len(nxt))
            if len(nxt) > cap_next:
                raise ValueError(
                    f"level {lvl + 1}: {len(nxt)} voxels exceed {cap_next}")
            levels.append(_pad_level(cur, subm, down_rules, parent_idx,
                                     child_tap, cap, cap_next, cur_dims))
            cur = nxt
            cur_dims = (cur_dims + 1) // 2
        else:
            levels.append(_pad_level(cur, subm, None, None, None, cap, 0,
                                     cur_dims))
    cap0 = capacities[0] if capacities is not None else len(vox_coords)
    return Pyramid(
        levels=tuple(levels),
        p2v=jnp.asarray(np.minimum(p2v, cap0), jnp.int32),
        point_valid=jnp.ones((len(p2v),), bool),
    )


def _pad_level(vc, subm, down_rules, parent_idx, child_tap, cap, cap_next,
               dims) -> LevelGeom:
    m = len(vc)

    def pad2(a, cap1, fill):
        out = np.full((a.shape[0], cap1), fill, a.dtype)
        out[:, :a.shape[1]] = a
        return jnp.asarray(out)

    def pad1(a, cap1, fill):
        out = np.full((cap1,), fill, a.dtype)
        out[:len(a)] = a
        return jnp.asarray(out)

    vcp = np.zeros((cap, 4), np.int32)
    vcp[:m] = vc
    return LevelGeom(
        vox_coords=jnp.asarray(vcp),
        vox_valid=jnp.asarray(np.arange(cap) < m),
        subm_rules=pad2(subm, cap, -1),
        down_rules=None if down_rules is None else pad2(down_rules, cap_next, -1),
        parent_idx=None if parent_idx is None else pad1(
            parent_idx.astype(np.int32), cap, cap_next),
        child_tap=None if child_tap is None else pad1(child_tap, cap, 0),
        dims=jnp.asarray(dims, jnp.int32),
    )
