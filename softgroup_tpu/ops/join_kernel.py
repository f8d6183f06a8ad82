"""Pallas TPU kernel: windowed monotone neighbour-cell join with centroid gate.

The neighbour-cell lookup of the grouping's cell graph asks, for each of the
26 Chebyshev offsets d and each cell i (sorted by linear key), "which table
index holds key[i] + enc(d), and is its centroid within the grouping
radius?".  As plain XLA this is a 26*m-query sort join (`jnp.searchsorted`
method='sort': variadic sort + unsort scatter) followed by 26*m row gathers
of the (m, 3) centroid table — together ~10 ms at bench scale, all of it
index shuffling — plus ~5 ms just materialising and re-laying-out the
(26, m) query matrix.

Structure to exploit: the table keys are sorted and each offset's query row
is `keys + const`, so every query row is NON-DECREASING.  A block of B
consecutive queries therefore matches a contiguous table window, exactly
like the windowed conv/gather kernels (`conv_kernel.py`,
`gather_kernel.py`):

  * queries are never materialised: the kernel rebuilds them from the key
    block, the per-cell coarse coords, and the per-offset scalars
    (delta-key, offset vector, grid dims) — the bounds test included;
  * a tiny exact searchsorted over the 2*R*nb block-boundary key extremes
    (~3.3k elements — negligible) gives each block its window start and an
    exact overflow test;
  * the kernel DMAs the key window (1, w) int32 (lane-major) and the
    bf16x3-split centroid window (w, 128; first 9 lanes used, lane-padded
    to a full tile for the manual DMA), computes the in-window position as
    a `sum(win < q)` VPU count, the hit as a key-equality one-hot, the
    candidate centroid as `onehot @ window` on the MXU (exact f32 via
    bf16x3), and applies the radius gate in-register;
  * a `lax.cond` falls back to the XLA join when any block's window
    overflows (pathological key distributions only).

Replaces (TPU-natively) the neighbour-resolution step of the reference's
grouping: GPU hash probes in `ballquery_batch_p`
(`softgroup/ops/src/bfs_cluster/bfs_cluster.cu:15-101`) and the octree walk
(`octree_ball_query.cu:56-147`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_kernel import f32_to_bf16x3

_INT_MAX = jnp.iinfo(jnp.int32).max


def _join_kernel(ws_ref, meta_ref, r2_ref, kblk_ref, cblk_ref, qpay_ref,
                 keys_hbm, pay_hbm, out_ref, kwin, pwin, sems,
                 *, b: int, w: int, nb: int):
    r = pl.program_id(0)
    j = pl.program_id(1)
    blk = r * nb + j

    # keys live in the LANE dim ((1, m) int32) and the payload is padded to
    # a full 128-lane tile: manual HBM->VMEM DMA slices must be 128-aligned
    # in the lane dim (same layout as conv_kernel._keyed_kernel)
    def start_dma(slot_i, blk_i):
        start = pl.multiple_of(ws_ref[0, blk_i], 128)
        pltpu.make_async_copy(keys_hbm.at[:, pl.ds(start, w)],
                              kwin.at[slot_i], sems.at[slot_i, 0]).start()
        pltpu.make_async_copy(pay_hbm.at[pl.ds(start, w)],
                              pwin.at[slot_i], sems.at[slot_i, 1]).start()

    slot = jax.lax.rem(blk, 2)
    nxt = jax.lax.rem(blk + 1, 2)

    @pl.when(blk == 0)
    def _():
        start_dma(0, 0)

    @pl.when(blk + 1 < pl.num_programs(0) * nb)
    def _():
        start_dma(nxt, blk + 1)

    start = pl.multiple_of(ws_ref[0, blk], 128)
    pltpu.make_async_copy(keys_hbm.at[:, pl.ds(start, w)],
                          kwin.at[slot], sems.at[slot, 0]).wait()
    pltpu.make_async_copy(pay_hbm.at[pl.ds(start, w)],
                          pwin.at[slot], sems.at[slot, 1]).wait()

    # rebuild this block's queries: q = key + delta(offset r), masked by the
    # grid bounds test on the cell's coarse coords (grouping.py `ok`)
    dlin = meta_ref[r, 0]
    ox, oy, oz = meta_ref[r, 1], meta_ref[r, 2], meta_ref[r, 3]
    d0, d1, d2 = meta_ref[0, 4], meta_ref[0, 5], meta_ref[0, 6]
    key_b = kblk_ref[0, :]                              # (b,) lanes
    cx, cy, cz = cblk_ref[0, :], cblk_ref[1, :], cblk_ref[2, :]
    okv = ((key_b != _INT_MAX)
           & (cx + ox >= 0) & (ox <= d0 - 1 - cx)
           & (cy + oy >= 0) & (oy <= d1 - 1 - cy)
           & (cz + oz >= 0) & (oz <= d2 - 1 - cz))
    qv = jnp.where(okv, key_b + dlin, _INT_MAX)

    wk = kwin[slot][0, :][None, :]                      # (1, w) int32
    q = qv[:, None]                                     # (b, 1) int32
    validw = wk != _INT_MAX
    lt = jnp.sum(((wk < q) & validw).astype(jnp.int32), axis=1)   # (b,)
    eq = (wk == q) & validw                             # (b, w)
    hit = jnp.any(eq, axis=1)
    oh = eq.astype(jnp.bfloat16)
    cc = jax.lax.dot(oh, pwin[slot],
                     preferred_element_type=jnp.float32)          # (b, 128)
    ccf = cc[:, 0:3] + cc[:, 3:6] + cc[:, 6:9]
    qp = qpay_ref[...].astype(jnp.float32)
    qcf = qp[:, 0:3] + qp[:, 3:6] + qp[:, 6:9]
    d2c = jnp.sum(jnp.square(qcf - ccf), axis=1)
    out_ref[0, :] = jnp.where(hit & (d2c <= r2_ref[0]), start + lt, -1)


@functools.partial(jax.jit, static_argnames=('offs', 'block_b', 'window_w',
                                             'interpret', 'force_kernel'))
def cell_neighbor_join(table_keys: jax.Array, centroid: jax.Array,
                       ccoord: jax.Array, dims: jax.Array,
                       offs: tuple, radius,
                       block_b: int = 256, window_w: int = 512,
                       interpret: bool = False,
                       force_kernel: bool = False) -> jax.Array:
    """cand[r, i] = j such that table_keys[j] == table_keys[i] + dlin(r) and
    ||centroid[j] - centroid[i]|| <= radius, else -1 — with the grid bounds
    test `0 <= ccoord[i] + offs[r] < dims` applied to each query.

    Args:
      table_keys: (m,) int32 linear cell keys
        ((x * dims[1] + y) * dims[2] + z), sorted ascending, unique among
        valid entries, padded with INT_MAX.
      centroid: (m, 3) f32 per-cell centroids.
      ccoord: (m, 3) int32 per-cell coarse coords (>= 0).
      dims: (3,) int32 grid extent (traced OK).
      offs: static tuple of R (dx, dy, dz) neighbour offsets.
      radius: centroid gate threshold (scalar; may be traced).
    Returns:
      (R, m) int32 candidate table indices (-1 = miss, bounds-fail, or
      gated out).
    """
    m = table_keys.shape[0]
    offs_np = np.asarray(offs, np.int32)
    rdim = len(offs_np)
    b, w = block_b, window_w
    assert m % b == 0 and m >= w, (m, b, w)
    # window starts are floored to 128-lane alignment, so a dense block of b
    # queries can span up to b + 127 table rows
    assert w % 128 == 0 and w >= b + 128, (b, w)
    nb = m // b

    dims = jnp.asarray(dims, jnp.int32)
    d_lin = ((offs_np[:, 0] * dims[1] + offs_np[:, 1]) * dims[2]
             + offs_np[:, 2]).astype(jnp.int32)          # (R,) traced

    pay = f32_to_bf16x3(centroid)                       # (m, 9)
    pay = jnp.pad(pay, ((0, 0), (0, 128 - pay.shape[1])))

    # exact block-boundary positions via one small sort join over the block
    # key extremes (bounds-masking ignored: it only loosens the windows)
    kb = table_keys.reshape(nb, b)
    lo_k = kb.min(axis=1)
    hi_k = jnp.where(kb != _INT_MAX, kb, jnp.int32(-1)).max(axis=1)
    lo_q = jnp.where(lo_k[None, :] != _INT_MAX,
                     lo_k[None, :] + d_lin[:, None], _INT_MAX)  # (R, nb)
    hi_q = jnp.where(hi_k[None, :] >= 0,
                     hi_k[None, :] + d_lin[:, None] + 1, jnp.int32(-1))
    bnd = jnp.concatenate([lo_q.reshape(-1), hi_q.reshape(-1)])
    pos = jnp.searchsorted(table_keys, bnd, side='left',
                           method='sort').astype(jnp.int32)
    pos_lo = pos[:rdim * nb]
    pos_hi = pos[rdim * nb:]
    starts = jnp.clip((pos_lo // 128) * 128, 0, m - w)
    has_valid = lo_q.reshape(-1) != _INT_MAX
    overflow = jnp.any(has_valid & (pos_hi > starts + w))

    r2 = jnp.asarray(radius, jnp.float32).reshape(1) ** 2
    meta = jnp.concatenate(
        [d_lin[:, None], jnp.broadcast_to(jnp.asarray(offs_np), (rdim, 3)),
         jnp.broadcast_to(dims[None, :], (rdim, 3)),
         jnp.zeros((rdim, 1), jnp.int32)], axis=1)       # (R, 8)

    coord_t = jnp.pad(ccoord.T, ((0, 5), (0, 0)))        # (8, m) int32

    def run_kernel(args):
        table_keys, pay, coord_t, starts = args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(rdim, nb),
            in_specs=[
                pl.BlockSpec((1, b), lambda r, j, ws, mt, rr: (0, j)),
                pl.BlockSpec((8, b), lambda r, j, ws, mt, rr: (0, j)),
                pl.BlockSpec((b, 128), lambda r, j, ws, mt, rr: (j, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec((1, b),
                                   lambda r, j, ws, mt, rr: (0, r * nb + j)),
            scratch_shapes=[
                pltpu.VMEM((2, 1, w), jnp.int32),
                pltpu.VMEM((2, w, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        kernel = functools.partial(_join_kernel, b=b, w=w, nb=nb)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, rdim * m), jnp.int32),
            interpret=interpret,
        )(starts[None, :].reshape(rdim, nb).reshape(1, -1), meta, r2,
          table_keys[None, :], coord_t, pay, table_keys[None, :], pay)
        return out.reshape(rdim, m)

    def run_xla(args):
        table_keys, _, _, _ = args
        return xla_cell_join(table_keys, centroid, ccoord, dims, offs_np,
                             radius)

    if force_kernel:  # test path: exercise the kernel unconditionally
        return run_kernel((table_keys, pay, coord_t, starts))
    return jax.lax.cond(overflow, run_xla, run_kernel,
                        (table_keys, pay, coord_t, starts))


def _rules_kernel(ws_ref, meta_ref, kblk_ref, cblk_ref, keys_hbm, out_ref,
                  kwin, sems, *, b: int, w: int, nb: int, rdim: int,
                  groups: tuple):
    """Gate-free sorted-key join for submanifold RULEBOOKS: one grid step
    resolves ALL offsets for one block of b voxels.  Three key windows per
    block (offsets grouped by dx, exactly like the conv kernel's window
    groups) keep the per-offset compare width at w instead of the full
    +-dyz span."""
    blk = pl.program_id(0)
    slot = jax.lax.rem(blk, 2)
    nxt = jax.lax.rem(blk + 1, 2)
    n_groups = 3

    def start_dmas(slot_i, blk_i):
        for g in range(n_groups):
            start = pl.multiple_of(ws_ref[g, blk_i], 128)
            pltpu.make_async_copy(keys_hbm.at[:, pl.ds(start, w)],
                                  kwin.at[slot_i, g],
                                  sems.at[slot_i, g]).start()

    @pl.when(blk == 0)
    def _():
        start_dmas(0, 0)

    @pl.when(blk + 1 < nb)
    def _():
        start_dmas(nxt, blk + 1)

    for g in range(n_groups):
        pltpu.make_async_copy(
            keys_hbm.at[:, pl.ds(pl.multiple_of(ws_ref[g, blk], 128), w)],
            kwin.at[slot, g], sems.at[slot, g]).wait()

    key_b = kblk_ref[0, :]                               # (b,) lanes
    cx, cy, cz = cblk_ref[0, :], cblk_ref[1, :], cblk_ref[2, :]
    d0, d1, d2 = meta_ref[0, 4], meta_ref[0, 5], meta_ref[0, 6]
    for r in range(rdim):
        g = groups[r]
        dlin = meta_ref[r, 0]
        ox, oy, oz = meta_ref[r, 1], meta_ref[r, 2], meta_ref[r, 3]
        okv = ((key_b != _INT_MAX)
               & (cx + ox >= 0) & (ox <= d0 - 1 - cx)
               & (cy + oy >= 0) & (oy <= d1 - 1 - cy)
               & (cz + oz >= 0) & (oz <= d2 - 1 - cz))
        qv = jnp.where(okv, key_b + dlin, _INT_MAX)
        wk = kwin[slot, g][0, :][None, :]                # (1, w)
        q = qv[:, None]                                  # (b, 1)
        validw = wk != _INT_MAX
        lt = jnp.sum(((wk < q) & validw).astype(jnp.int32), axis=1)
        hit = jnp.any((wk == q) & validw, axis=1)
        start = pl.multiple_of(ws_ref[g, blk], 128)
        out_ref[r, :] = jnp.where(okv & hit, start + lt, -1)


@functools.partial(jax.jit, static_argnames=('offs', 'block_b', 'window_w',
                                             'interpret', 'force_kernel'))
def sorted_key_rules_join(table_keys: jax.Array, xyz: jax.Array,
                          dims: jax.Array, offs: tuple,
                          block_b: int = 256, window_w: int = 512,
                          interpret: bool = False,
                          force_kernel: bool = False) -> jax.Array:
    """rules[r, i] = j with table_keys[j] == table_keys[i] + dlin(offs[r]),
    else -1, with the grid bounds test on xyz — the gate-free rulebook
    variant of cell_neighbor_join, all offsets resolved per block in one
    grid pass.

    Replaces the `searchsorted(method='sort')` build of
    `rulebook.build_subm_rules_linear` for the train-path proposal grids:
    the variadic sort + unsort scatter of 27*V queries profiled at ~29 ms
    per train step at V=65536 (round-5 profile, fusions .5818/.6060/.6061);
    the windowed join is pure sequential DMA + VPU compares.

    Args:
      table_keys: (m,) int32 sorted linear keys, INT_MAX pads.
      xyz: (m, 3) int32 voxel coords (>= 0; rows of pads arbitrary).
      dims: (3,) int32 grid extent (traced OK).
      offs: static tuple of R (dx, dy, dz) offsets with dx in {-1, 0, 1}.
    Returns:
      (R, m) int32 table indices (-1 = miss / bounds-fail).
    """
    m = table_keys.shape[0]
    offs_np = np.asarray(offs, np.int32)
    rdim = len(offs_np)
    b, w = block_b, window_w
    assert m % b == 0 and m >= w, (m, b, w)
    assert w % 128 == 0 and w >= b + 128, (b, w)
    nb = m // b
    groups = tuple(int(dx) + 1 for dx in offs_np[:, 0])

    dims = jnp.asarray(dims, jnp.int32)
    d_lin = ((offs_np[:, 0] * dims[1] + offs_np[:, 1]) * dims[2]
             + offs_np[:, 2]).astype(jnp.int32)          # (R,)
    # per-group delta range for the block-boundary window computation
    g_of = np.asarray(groups)
    dmin = jnp.stack([jnp.where(jnp.asarray(g_of == g), d_lin,
                                jnp.iinfo(jnp.int32).max).min()
                      for g in range(3)])
    dmax = jnp.stack([jnp.where(jnp.asarray(g_of == g), d_lin,
                                jnp.iinfo(jnp.int32).min).max()
                      for g in range(3)])

    kb = table_keys.reshape(nb, b)
    lo_k = kb.min(axis=1)
    hi_k = jnp.where(kb != _INT_MAX, kb, jnp.int32(-1)).max(axis=1)
    lo_q = jnp.where(lo_k[None, :] != _INT_MAX,
                     lo_k[None, :] + dmin[:, None], _INT_MAX)   # (3, nb)
    hi_q = jnp.where(hi_k[None, :] >= 0,
                     hi_k[None, :] + dmax[:, None] + 1, jnp.int32(-1))
    bnd = jnp.concatenate([lo_q.reshape(-1), hi_q.reshape(-1)])
    pos = jnp.searchsorted(table_keys, bnd, side='left',
                           method='sort').astype(jnp.int32)
    pos_lo = pos[:3 * nb]
    pos_hi = pos[3 * nb:]
    starts = jnp.clip((pos_lo // 128) * 128, 0, m - w).reshape(3, nb)
    has_valid = lo_q.reshape(-1) != _INT_MAX
    overflow = jnp.any(has_valid & (pos_hi > starts.reshape(-1) + w))

    meta = jnp.concatenate(
        [d_lin[:, None], jnp.asarray(offs_np),
         jnp.broadcast_to(dims[None, :], (rdim, 3)),
         jnp.zeros((rdim, 1), jnp.int32)], axis=1)       # (R, 8)
    rpad = -(-rdim // 8) * 8
    coord_t = jnp.pad(xyz.T, ((0, 5), (0, 0)))           # (8, m)

    def run_kernel(args):
        table_keys, coord_t, starts = args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, b), lambda j, ws, mt: (0, j)),
                pl.BlockSpec((8, b), lambda j, ws, mt: (0, j)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec((rpad, b), lambda j, ws, mt: (0, j)),
            scratch_shapes=[
                pltpu.VMEM((2, 3, 1, w), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        )
        kernel = functools.partial(_rules_kernel, b=b, w=w, nb=nb,
                                   rdim=rdim, groups=groups)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rpad, m), jnp.int32),
            interpret=interpret,
        )(starts, meta, table_keys[None, :], coord_t, table_keys[None, :])
        return out[:rdim]

    def run_xla(args):
        table_keys, _, _ = args
        return xla_rules_join(table_keys, xyz, dims, offs_np)

    if force_kernel:
        return run_kernel((table_keys, coord_t, starts))
    return jax.lax.cond(overflow, run_xla, run_kernel,
                        (table_keys, coord_t, starts))


def xla_rules_join(table_keys: jax.Array, xyz: jax.Array, dims: jax.Array,
                   offs_np: np.ndarray) -> jax.Array:
    """Plain-XLA oracle/fallback (the original build_subm_rules_linear
    body, minus the center tap)."""
    m = table_keys.shape[0]
    offs = jnp.asarray(np.asarray(offs_np, np.int32))
    rdim = offs.shape[0]
    dims = jnp.asarray(dims, jnp.int32)
    d_lin = ((offs[:, 0] * dims[1] + offs[:, 1]) * dims[2]
             + offs[:, 2]).astype(jnp.int32)
    in_lo = xyz
    in_hi = dims[None, :] - 1 - xyz
    ok = ((table_keys != _INT_MAX)[None, :]
          & (offs[:, :, None] + in_lo.T[None] >= 0).all(axis=1)
          & (offs[:, :, None] <= in_hi.T[None]).all(axis=1))
    q = jnp.where(ok, table_keys[None, :] + d_lin[:, None], _INT_MAX)
    pos = jnp.searchsorted(table_keys, q.reshape(-1), side='left',
                           method='sort').astype(jnp.int32)
    pos = pos.reshape(rdim, m)
    pc = jnp.clip(pos, 0, m - 1)
    hit = ok & (pos < m) & (table_keys[pc] == q)
    return jnp.where(hit, pc, -1)


def xla_cell_join(table_keys: jax.Array, centroid: jax.Array,
                  ccoord: jax.Array, dims: jax.Array, offs_np: np.ndarray,
                  radius) -> jax.Array:
    """Plain-XLA oracle/fallback: sort-join searchsorted + gathered gate."""
    m = table_keys.shape[0]
    offs = jnp.asarray(np.asarray(offs_np, np.int32))
    rdim = offs.shape[0]
    dims = jnp.asarray(dims, jnp.int32)
    d_lin = ((offs[:, 0] * dims[1] + offs[:, 1]) * dims[2]
             + offs[:, 2]).astype(jnp.int32)
    in_lo = ccoord
    in_hi = dims[None, :] - 1 - ccoord
    ok = ((table_keys != _INT_MAX)[None, :]
          & (offs[:, :, None] + in_lo.T[None] >= 0).all(axis=1)
          & (offs[:, :, None] <= in_hi.T[None]).all(axis=1))
    q = jnp.where(ok, table_keys[None, :] + d_lin[:, None], _INT_MAX)
    pos = jnp.searchsorted(table_keys, q.reshape(-1), side='left',
                           method='sort').astype(jnp.int32)
    pos = pos.reshape(rdim, m)
    pc = jnp.clip(pos, 0, m - 1)
    hit = ok & (pos < m) & (table_keys[pc] == q)
    cand = jnp.where(hit, pc, -1)
    cc = jnp.clip(cand, 0, m - 1)
    d2 = jnp.sum(jnp.square(centroid[None, :, :] - centroid[cc]), axis=-1)
    return jnp.where((cand >= 0) & (d2 <= radius * radius), cand, -1)
