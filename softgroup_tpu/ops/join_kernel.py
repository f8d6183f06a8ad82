"""Pallas TPU kernel: windowed monotone searchsorted-join with centroid gate.

The neighbour-cell lookup of the grouping's cell graph asks, for each of the
26 Chebyshev offsets d and each cell i (sorted by linear key), "which table
index holds key[i] + enc(d), and is its centroid within the grouping
radius?".  As plain XLA this is a 26*m-query sort join (`jnp.searchsorted`
method='sort': variadic sort + unsort scatter) followed by 26*m row gathers
of the (m, 3) centroid table — together ~10 ms at bench scale, all of it
index shuffling.

Structure to exploit: the table keys are sorted and each query row is
`keys + const`, so every query row is NON-DECREASING.  A block of B
consecutive queries therefore matches a contiguous table window, exactly
like the windowed conv/gather kernels (`conv_kernel.py`,
`gather_kernel.py`):

  * a tiny exact searchsorted over the 2*R*nb block-boundary queries
    (~3.3k elements — negligible) gives each block its window start and an
    exact overflow test;
  * the kernel DMAs the key window (w, 1) int32 and the bf16x3-split
    centroid window (w, 128; bf16x3 in the first 9 lanes, lane-padded to a
    full tile for the manual DMA), computes the in-window position as a
    `sum(win < q)` VPU count, the hit as a key-equality one-hot, the
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


def _join_kernel(ws_ref, r2_ref, qblk_ref, qpay_ref, keys_hbm, pay_hbm,
                 out_ref, kwin, pwin, sems, *, b: int, w: int, nb: int):
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

    wk = kwin[slot][0, :][None, :]                      # (1, w) int32
    q = qblk_ref[0, :][:, None]                         # (b, 1) int32
    validw = wk != _INT_MAX
    lt = jnp.sum(((wk < q) & validw).astype(jnp.int32), axis=1)   # (b,)
    eq = (wk == q) & validw                             # (b, w)
    hit = jnp.any(eq, axis=1)
    oh = eq.astype(jnp.bfloat16)
    cc = jax.lax.dot(oh, pwin[slot],
                     preferred_element_type=jnp.float32)          # (b, 16)
    ccf = cc[:, 0:3] + cc[:, 3:6] + cc[:, 6:9]
    qp = qpay_ref[...].astype(jnp.float32)
    qcf = qp[:, 0:3] + qp[:, 3:6] + qp[:, 6:9]
    d2 = jnp.sum(jnp.square(qcf - ccf), axis=1)
    out_ref[0, :] = jnp.where(hit & (d2 <= r2_ref[0]), start + lt, -1)


@functools.partial(jax.jit, static_argnames=('block_b', 'window_w',
                                             'interpret', 'force_kernel'))
def monotone_key_join(table_keys: jax.Array, centroid: jax.Array,
                      queries: jax.Array, radius,
                      block_b: int = 256, window_w: int = 512,
                      interpret: bool = False,
                      force_kernel: bool = False) -> jax.Array:
    """cand[r, i] = j such that table_keys[j] == queries[r, i] and
    ||centroid[j] - centroid[i]|| <= radius, else -1.

    Args:
      table_keys: (m,) int32, sorted ascending, unique among valid entries,
        padded with INT_MAX.
      centroid: (m, 3) f32 per-cell centroids (row i = query cell i's own
        centroid; the gate compares centroid[i] vs centroid[cand]).
      queries: (R, m) int32; each row non-decreasing over its valid
        (< INT_MAX) entries.  m % block_b == 0.
      radius: gate threshold (scalar; may be traced — pyramid mode scales
        it at runtime).
    Returns:
      (R, m) int32 candidate table indices (-1 = miss or gated out).
    """
    m = table_keys.shape[0]
    rdim, mq = queries.shape
    b, w = block_b, window_w
    assert mq == m and m % b == 0 and m >= w, (m, b, w)
    # window starts are floored to 128-lane alignment, so a dense block of b
    # queries can span up to b + 127 table rows
    assert w % 128 == 0 and w >= b + 128, (b, w)
    nb = m // b

    pay = f32_to_bf16x3(centroid)                       # (m, 9)
    pay = jnp.pad(pay, ((0, 0), (0, 128 - pay.shape[1])))

    # exact block-boundary positions via one small sort join: 'left' of the
    # block-min query and 'left' of (block-max query + 1) == 'right' of max
    qr = queries.reshape(rdim, nb, b)
    lo_q = qr.min(axis=2)
    hi_q = jnp.where(qr != _INT_MAX, qr, jnp.int32(-1)).max(axis=2)
    bnd = jnp.concatenate(
        [lo_q.reshape(-1),
         jnp.where(hi_q < _INT_MAX - 1, hi_q + 1, hi_q).reshape(-1)])
    pos = jnp.searchsorted(table_keys, bnd, side='left',
                           method='sort').astype(jnp.int32)
    pos_lo = pos[:rdim * nb]
    pos_hi = pos[rdim * nb:]
    starts = jnp.clip((pos_lo // 128) * 128, 0, m - w)
    has_valid = lo_q.reshape(-1) != _INT_MAX
    overflow = jnp.any(has_valid & (pos_hi > starts + w))

    r2 = jnp.asarray(radius, jnp.float32).reshape(1) ** 2

    def run_kernel(args):
        table_keys, pay, queries, starts = args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rdim, nb),
            in_specs=[
                # queries flattened to (1, R*m): a (1, b) block of a 2-D
                # array with leading dim 1 satisfies the Mosaic tiling rule
                pl.BlockSpec((1, b), lambda r, j, ws, rr: (0, r * nb + j)),
                pl.BlockSpec((b, 128), lambda r, j, ws, rr: (j, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec((1, b),
                                   lambda r, j, ws, rr: (0, r * nb + j)),
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
        )(starts[None, :], r2, queries.reshape(1, -1), pay,
          table_keys[None, :], pay)
        return out.reshape(rdim, m)

    def run_xla(args):
        table_keys, _, queries, _ = args
        return xla_key_join(table_keys, centroid, queries, radius)

    if force_kernel:  # test path: exercise the kernel unconditionally
        return run_kernel((table_keys, pay, queries, starts))
    return jax.lax.cond(overflow, run_xla, run_kernel,
                        (table_keys, pay, queries, starts))


def xla_key_join(table_keys: jax.Array, centroid: jax.Array,
                 queries: jax.Array, radius: float) -> jax.Array:
    """Plain-XLA oracle/fallback: sort-join searchsorted + gathered gate."""
    m = table_keys.shape[0]
    rdim = queries.shape[0]
    pos = jnp.searchsorted(table_keys, queries.reshape(-1), side='left',
                           method='sort').astype(jnp.int32)
    pos = pos.reshape(rdim, m)
    pc = jnp.clip(pos, 0, m - 1)
    hit = (pos < m) & (table_keys[pc] == queries) & (queries != _INT_MAX)
    cand = jnp.where(hit, pc, -1)
    cc = jnp.clip(cand, 0, m - 1)
    d2 = jnp.sum(jnp.square(centroid[None, :, :] - centroid[cc]), axis=-1)
    return jnp.where((cand >= 0) & (d2 <= radius * radius), cand, -1)
