"""Pallas TPU kernel: exact windowed row gather for MONOTONE indices.

XLA's row gather on TPU moves a full (16, 128) tile per gathered row
(~10 ns/row), which makes the entry-building gathers of `forward_grouping`
(wide point-row gather by `pt_e`, cell-table gather by `cid_s`) cost several
ms each at bench scale.  Both gathers share a structural property: the index
vector is NON-DECREASING, so a block of B consecutive outputs reads a
contiguous source window of <= B rows (the compaction/cumsum that produces
the indices can only step forward).  The gather then becomes sequential
window DMAs + one one-hot matmul per block — the same trick as the windowed
sparse-conv kernel (`conv_kernel.py`), minus the weight transform.

Exactness: the one-hot matmul runs in bf16 on the MXU.  A bf16 one-hot row
(0.0/1.0, both exact) times a bf16 source value reproduces the value
exactly, so gathering is exact for bf16 sources.  f32 sources are split
column-wise into three bf16 components (hi = bf16(x), lo = bf16(x - hi),
lo2 = bf16(x - hi - lo): 3 x 8 mantissa bits cover the 24-bit f32
significand), gathered in the same matmul, and re-summed — the classic
bf16x3 exact-f32 decomposition, at one MXU pass instead of the six of a
HIGHEST-precision f32 matmul.

Replaces (at inference): the reference's per-proposal/per-class index
round-trips have no direct analogue — this is the TPU-native cost model
(softgroup.py:433-473 builds the same entry lists with CUDA gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def f32_to_bf16x3(x: jax.Array) -> jax.Array:
    """(N, C) f32 -> (N, 3C) bf16 exact decomposition (hi | lo | lo2)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    lo = r.astype(jnp.bfloat16)
    lo2 = (r - lo.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo, lo2], axis=1)


def bf16x3_sum(y: jax.Array, c: int) -> jax.Array:
    """(N, 3C[+extra]) f32 partial gathers -> (N, C) exact f32 sum."""
    return y[:, :c] + y[:, c:2 * c] + y[:, 2 * c:3 * c]


def _gather_kernel(ws_ref, lidx_ref, src_ref, out_ref, win, sems, *,
                   b: int, w: int, nb: int, cp: int):
    blk = pl.program_id(0)
    slot = jax.lax.rem(blk, 2)
    nxt = jax.lax.rem(blk + 1, 2)

    def start_dma(slot_i, blk_i):
        start = pl.multiple_of(ws_ref[0, blk_i] * 16, 16)
        pltpu.make_async_copy(src_ref.at[pl.ds(start, w)],
                              win.at[slot_i], sems.at[slot_i]).start()

    @pl.when(blk == 0)
    def _():
        start_dma(0, 0)

    @pl.when(blk + 1 < nb)
    def _():
        start_dma(nxt, blk + 1)

    pltpu.make_async_copy(src_ref.at[pl.ds(pl.multiple_of(
        ws_ref[0, blk] * 16, 16), w)], win.at[slot], sems.at[slot]).wait()
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    oh = (lidx_ref[0][:, None] == iota).astype(jnp.bfloat16)
    out_ref[:] = jax.lax.dot(
        oh, win[slot], precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=('block_b', 'window_w',
                                             'interpret'))
def monotone_row_gather(src: jax.Array, idx: jax.Array, block_b: int = 256,
                        window_w: int = 384,
                        interpret: bool = False) -> jax.Array:
    """out[i] = src[idx[i]] for non-decreasing int32 ``idx``.

    Args:
      src: (V, C) bf16 source rows, C <= 128 (pad columns outside if the
        logical payload needs the f32 split — see f32_to_bf16x3).
      idx: (E,) int32, non-decreasing, values in [0, V).  E % block_b == 0,
        V >= window_w.  Entries whose window span exceeds window_w - 16
        (impossible when idx is non-decreasing and window_w >= block_b + 16)
        would read as zero.
    Returns:
      (E, C) f32 gathered rows.
    """
    v, c = src.shape
    e = idx.shape[0]
    b, w = block_b, window_w
    assert e % b == 0 and v >= w and w >= b + 16, (e, b, v, w)
    nb = e // b

    cp = c
    if c % 128:
        src = jnp.pad(src, ((0, 0), (0, 128 - c % 128)))
        cp = src.shape[1]

    blk_min = idx.reshape(nb, b).min(axis=1)
    starts = (jnp.clip(blk_min, 0, max(v - w, 0)) // 16)[None, :]  # (1, nb)
    local = idx - starts[0].repeat(b) * 16
    local = jnp.where((local >= 0) & (local < w), local, -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, b), lambda i, ws: (0, i)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # src
        ],
        out_specs=pl.BlockSpec((b, cp), lambda i, ws: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, w, cp), src.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_gather_kernel, b=b, w=w, nb=nb, cp=cp)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, cp), jnp.float32),
        interpret=interpret,
    )(starts, local[None, :], src)
    return out[:, :c]


def monotone_window_overflow(idx: jax.Array, block_b: int,
                             window_w: int, v: int) -> jax.Array:
    """Number of entries whose row would fall outside its block's window —
    the caller can `lax.cond` to a plain XLA gather when nonzero (possible
    for monotone index streams whose per-block span exceeds window_w, e.g.
    sparse entry patterns)."""
    nb = idx.shape[0] // block_b
    blk_min = idx.reshape(nb, block_b).min(axis=1)
    starts = (jnp.clip(blk_min, 0, max(v - window_w, 0)) // 16) * 16
    local = idx - starts.repeat(block_b)
    return jnp.sum((local < 0) | (local >= window_w))


def _segsum_kernel(ws_ref, src_ref, seg_ref, out_ref, win, wins, sems, *,
                   b: int, w: int, nb: int, cp: int):
    blk = pl.program_id(0)
    slot = jax.lax.rem(blk, 2)
    nxt = jax.lax.rem(blk + 1, 2)

    def start_dma(slot_i, blk_i):
        start = pl.multiple_of(ws_ref[0, blk_i] * 128, 128)
        pltpu.make_async_copy(src_ref.at[pl.ds(start, w)],
                              win.at[slot_i], sems.at[slot_i, 0]).start()
        pltpu.make_async_copy(seg_ref.at[:, pl.ds(start, w)],
                              wins.at[slot_i], sems.at[slot_i, 1]).start()

    @pl.when(blk == 0)
    def _():
        start_dma(0, 0)

    @pl.when(blk + 1 < nb)
    def _():
        start_dma(nxt, blk + 1)

    start = pl.multiple_of(ws_ref[0, blk] * 128, 128)
    pltpu.make_async_copy(src_ref.at[pl.ds(start, w)],
                          win.at[slot], sems.at[slot, 0]).wait()
    pltpu.make_async_copy(seg_ref.at[:, pl.ds(start, w)],
                          wins.at[slot], sems.at[slot, 1]).wait()
    segw = wins[slot][0, :][None, :]                     # (1, w) int32
    row = blk * b + jax.lax.broadcasted_iota(jnp.int32, (b, w), 0)
    oh = (segw == row).astype(jnp.bfloat16)              # (b, w)
    out_ref[:] = jax.lax.dot(oh, win[slot],
                             precision=jax.lax.Precision.DEFAULT,
                             preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=('num_segments', 'block_b',
                                             'window_w', 'interpret'))
def monotone_segment_sum(values: jax.Array, seg: jax.Array,
                         num_segments: int, block_b: int = 256,
                         window_w: int = 1024,
                         interpret: bool = False) -> jax.Array:
    """out[s] = sum of values rows with seg == s, for NON-DECREASING seg.

    The gather-transpose of monotone_row_gather: a block of B consecutive
    segments reads one contiguous source window (sorted seg => each
    segment's rows are a run), the one-hot is built in-kernel by comparing
    the DMA'd seg window against the block's segment ids, and duplicates
    sum on the MXU with f32 accumulation — XLA instead lowers
    `segment_sum` over these shapes to a serial scatter-add (~78 ms for
    1M x 32 rows at bench scale; this kernel ~3 ms).

    Args:
      values: (N, C) bf16, C <= 128.  N % 128 == 0.
      seg: (N,) int32 non-decreasing; rows with seg >= num_segments (e.g. a
        capacity-pad tail) are DROPPED — same as jax.ops.segment_sum's
        out-of-range behaviour on both the kernel and fallback branches.
      num_segments: output rows; % block_b == 0.
    Returns:
      (num_segments, C) f32.  Falls back to jax.ops.segment_sum when any
      block's rows exceed its window.
    """
    n, c = values.shape
    b, w = block_b, window_w
    assert num_segments % b == 0 and n % 128 == 0 and n >= w, \
        (num_segments, b, n, w)
    nb = num_segments // b

    cp = c
    src = values
    if c % 128:
        src = jnp.pad(values, ((0, 0), (0, 128 - c % 128)))
        cp = src.shape[1]

    # per-block point range: first row with seg >= blk*b
    bounds = jnp.searchsorted(
        seg, jnp.arange(0, num_segments + b, b, dtype=seg.dtype),
        side='left').astype(jnp.int32)
    pos_lo, pos_hi = bounds[:-1], bounds[1:]
    starts = (jnp.clip(pos_lo, 0, max(n - w, 0)) // 128)     # units of 128
    overflow = jnp.any(pos_hi > starts * 128 + w)

    def run_kernel(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # src
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # seg
            ],
            out_specs=pl.BlockSpec((b, cp), lambda i, ws: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, w, cp), src.dtype),
                pltpu.VMEM((2, 1, w), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        kernel = functools.partial(_segsum_kernel, b=b, w=w, nb=nb, cp=cp)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((num_segments, cp), jnp.float32),
            interpret=interpret,
        )(starts[None, :], src, seg[None, :])
        return out[:, :c]

    def run_xla(_):
        return jax.ops.segment_sum(values.astype(jnp.float32), seg,
                                   num_segments=num_segments)

    return jax.lax.cond(overflow, run_xla, run_kernel, None)


def monotone_segment_sum_f32(values: jax.Array, seg: jax.Array,
                             num_segments: int, block_b: int = 256,
                             window_w: int = 1024, split: int = 3,
                             interpret: bool = False) -> jax.Array:
    """f32 monotone segment sum through the one-hot MXU reduction.

    split: bf16 column components per f32 column (split*C <= 128 required).
    3 = exact f32 (24 mantissa bits); 2 = 16 mantissa bits — more precise
    than bf16-input rounding, for C in (42, 64]; 1 = plain bf16 inputs with
    f32 accumulation.  Same seg semantics/fallback as
    monotone_segment_sum."""
    c = values.shape[1]
    assert split * c <= 128, (split, c)
    if split == 3:
        cols = f32_to_bf16x3(values)
    elif split == 2:
        hi = values.astype(jnp.bfloat16)
        lo = (values - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        cols = jnp.concatenate([hi, lo], axis=1)
    else:
        cols = values.astype(jnp.bfloat16)
    got = monotone_segment_sum(cols, seg, num_segments, block_b=block_b,
                               window_w=window_w, interpret=interpret)
    out = got[:, :c]
    for j in range(1, split):
        out = out + got[:, j * c:(j + 1) * c]
    return out


@jax.custom_vjp
def gather_rows_segsum_vjp(src: jax.Array, idx: jax.Array) -> jax.Array:
    """src[idx] with a sort + monotone-segment-sum backward.

    The gather transpose XLA emits is a serial scatter-add of the (E, C)
    cotangent into (V, C) (~95 ms for 524k x 35 rows at batch-4 bench
    scale).  The backward here sorts the cotangent rows by target (one
    argsort + one row gather) and reduces with the one-hot MXU segment-sum
    kernel (~12 ms total).  The primal is EXACTLY ``src[idx]`` — identical
    inference program.  idx must be pre-clipped to [0, V)."""
    return src[idx]


def _grs_fwd(src, idx):
    proto = jnp.zeros((src.shape[0], 0), src.dtype)
    return src[idx], (idx, proto)


def _grs_bwd(res, g):
    idx, proto = res
    v = proto.shape[0]
    e = idx.shape[0]
    c = g.shape[1]
    from .dispatch import kernel_interpret, kernels_enabled
    if (kernels_enabled() and v % 256 == 0 and e % 128 == 0 and e >= 1024
            and 2 * c <= 128 and g.dtype in (jnp.float32, jnp.bfloat16)):
        order = jnp.argsort(idx)
        idx_s = idx[order]
        g_s = g[order].astype(jnp.float32)
        split = 3 if 3 * c <= 128 else 2
        gv = monotone_segment_sum_f32(g_s, idx_s, v, split=split,
                                      interpret=kernel_interpret())
    else:
        gv = jax.ops.segment_sum(g.astype(jnp.float32), idx,
                                 num_segments=v)
    return gv.astype(proto.dtype), None


gather_rows_segsum_vjp.defvjp(_grs_fwd, _grs_bwd)


def monotone_gather_f32(src: jax.Array, idx: jax.Array, extra: jax.Array
                        | None = None, block_b: int = 256,
                        window_w: int = 384, interpret: bool = False):
    """Exact f32 row gather for non-decreasing ``idx``.

    src (V, C) f32 is bf16x3-split (3C columns); ``extra`` (V, Cx) optional
    bf16-exact columns (small ints, flags) ride along in the same matmul.
    Returns (E, C) f32 [, (E, Cx) f32].
    """
    c = src.shape[1]
    cols = f32_to_bf16x3(src)
    cx = 0
    if extra is not None:
        cx = extra.shape[1]
        cols = jnp.concatenate([cols, extra.astype(jnp.bfloat16)], axis=1)
    got = monotone_row_gather(cols, idx, block_b=block_b, window_w=window_w,
                              interpret=interpret)
    out = bf16x3_sum(got, c)
    if extra is None:
        return out
    return out, got[:, 3 * c:3 * c + cx]
