"""Pallas TPU kernel for sparse convolution: windowed gather-GEMM.

Why: XLA's row gather on TPU moves a full (16, 128) tile per gathered row, so
at C=32 the plain gather-GEMM conv (sparse_conv.subm_conv) runs at ~3% of HBM
bandwidth and dominates the backbone.  This kernel exploits a structural
property of our rulebooks: voxels are stored in sorted linear-key order, so
for every kernel tap the rule targets are MONOTONE in the output index, and
an output block of B voxels reads a *contiguous* input window of ~B rows
(measured: W <= 1.6 B on ScanNet-scale scenes).  The gather then becomes

    out[block] = sum_k onehot(local_rules[k]) @ (window[g(k)] @ W_k)

i.e. sequential-DMA windows + one-hot matmuls that run on the MXU — no
row-granular HBM traffic at all.  Taps are grouped by dx (the slow key axis):
taps of one group share one window DMA.

This replaces spconv 2.x's implicit-GEMM CUDA kernels (the reference's
engine, `softgroup/model/blocks.py:57-70,101-119`) as the production conv
path; sparse_conv.py remains the portable XLA fallback and the test oracle.

Semantics: identical to sparse_conv.subm_conv — rules (K, V_out) int32 global
gather indices, -1 = missing neighbour contributes zero.  Rule targets MUST
be monotone non-decreasing per tap over valid entries (guaranteed for
sorted-key voxelizations; see rulebook.py).  Entries whose window overflows W
are dropped (window_rules reports a count; pick W from measurement).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT_MAX = jnp.iinfo(jnp.int32).max


def window_rules(rules: jax.Array, group_of_tap: np.ndarray, n_groups: int,
                 w: int, b: int, v_in: int):
    """Per-(block, group) window starts + window-local rule indices.

    Args:
      rules: (K, V_out) int32 global gather indices, -1 missing; monotone
        non-decreasing per tap.
      group_of_tap: (K,) static tap -> window group (taps grouped by dx).
      w, b: window width / output block size (static).
      v_in: input row count (window starts are clamped to [0, v_in - w]).
    Returns:
      local: (K, V_out) int32 window-local indices (anything outside [0, w)
        contributes zero in the kernel — no clipping needed).
      starts: (nb, n_groups) int32 window start rows in UNITS OF 16 (the
        kernel multiplies by 16 so Mosaic can prove sublane alignment of the
        DMA slice; w must include a 16-row alignment margin).
      n_overflow: () int32 — entries dropped because the block's window
        exceeded w (should be 0 with a properly sized w).
    """
    k, v_out = rules.shape
    nb = v_out // b
    rb = rules.reshape(k, nb, b)
    big = jnp.where(rb < 0, _INT_MAX, rb)
    starts = []
    for g in range(n_groups):
        taps = np.nonzero(group_of_tap == g)[0]
        s = big[taps].min(axis=(0, 2))          # (nb,)
        s = jnp.where(s == _INT_MAX, 0, s)
        starts.append(jnp.clip(s, 0, max(v_in - w, 0)) // 16)
    starts = jnp.stack(starts, axis=1).astype(jnp.int32)   # (nb, n_groups)
    gmap = jnp.asarray(group_of_tap, jnp.int32)
    ws_tap = starts.T[gmap] * 16                             # (K, nb)
    local = rb - ws_tap[:, :, None]
    local = jnp.where(rb < 0, -1, local)
    n_overflow = jnp.sum(local >= w)
    return local.reshape(k, v_out), starts, n_overflow


def _conv_kernel(ws_ref, rules_ref, wstack_ref, feats_ref, out_ref,
                 win, u, sems, *, b: int, w: int, k: int, n_groups: int,
                 tpg: int, cin: int, cout: int, nb: int):
    """One output block: DMA n_groups windows (double-buffered across the
    sequential grid), weight-transform each window once, then accumulate
    one-hot gather matmuls per tap."""
    blk = pl.program_id(0)
    slot = jax.lax.rem(blk, 2)
    nxt = jax.lax.rem(blk + 1, 2)

    def start_dmas(slot_i, blk_i):
        for g in range(n_groups):
            start = pl.multiple_of(ws_ref[blk_i, g] * 16, 16)
            pltpu.make_async_copy(
                feats_ref.at[pl.ds(start, w)],
                win.at[slot_i, g],
                sems.at[slot_i, g],
            ).start()

    @pl.when(blk == 0)
    def _():
        start_dmas(0, 0)

    @pl.when(blk + 1 < nb)
    def _():
        start_dmas(nxt, blk + 1)

    for g in range(n_groups):
        start = pl.multiple_of(ws_ref[blk, g] * 16, 16)
        pltpu.make_async_copy(feats_ref.at[pl.ds(start, w)],
                              win.at[slot, g], sems.at[slot, g]).wait()

    cd = jnp.bfloat16
    for g in range(n_groups):
        u[g] = jax.lax.dot(
            win[slot, g].astype(cd), wstack_ref[g].astype(cd),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32).astype(cd)

    iota = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    acc = jnp.zeros((b, cout), jnp.float32)
    for t in range(k):
        g, p = t // tpg, t % tpg
        oh = (rules_ref[t][:, None] == iota).astype(cd)
        acc += jax.lax.dot(oh, u[g, :, p * cout:(p + 1) * cout],
                           precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('group_of_tap', 'n_groups',
                                             'block_b', 'window_w',
                                             'interpret'))
def windowed_conv(feats: jax.Array, wstack: jax.Array, rules: jax.Array,
                  group_of_tap: tuple, n_groups: int,
                  block_b: int = 256, window_w: int = 512,
                  interpret: bool = False) -> jax.Array:
    """Sparse conv via the windowed gather-GEMM kernel.

    Args:
      feats: (V_in, Cin) input features (bf16 recommended).
      wstack: (n_groups, Cin, tpg*Cout) — tap weights stacked group-major
        (tap t = group g * tpg + p, weight at wstack[g][:, p*Cout:...]).
      rules: (K, V_out) int32 global gather table (monotone per tap).
      group_of_tap: tap -> group (static tuple).
    Returns:
      (V_out, Cout) in feats.dtype, f32-accumulated.
    """
    v_in, cin = feats.shape
    k, v_out = rules.shape
    tpg = k // n_groups
    cout = wstack.shape[2] // tpg
    b, w = block_b, window_w
    assert v_out % b == 0 and v_in >= w, (v_out, b, v_in, w)
    nb = v_out // b
    gmap = np.asarray(group_of_tap, np.int32)

    # manual HBM->VMEM window DMA requires full 128-lane tiles: pad Cin (the
    # physical HBM layout is lane-padded anyway, and the extra K rows in the
    # transform matmul are zero — same MXU pass count)
    if cin % 128:
        pad = 128 - cin % 128
        feats = jnp.pad(feats, ((0, 0), (0, pad)))
        wstack = jnp.pad(wstack, ((0, 0), (0, pad), (0, 0)))
        cin = cin + pad

    local, starts, _ = window_rules(rules, gmap, n_groups, w, b, v_in)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((k, b), lambda i, ws: (0, i)),      # local rules
            pl.BlockSpec(wstack.shape, lambda i, ws: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # feats
        ],
        out_specs=pl.BlockSpec((b, cout), lambda i, ws: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, n_groups, w, cin), feats.dtype),
            pltpu.VMEM((n_groups, w, tpg * cout), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, n_groups)),
        ],
    )
    kernel = functools.partial(_conv_kernel, b=b, w=w, k=k,
                               n_groups=n_groups, tpg=tpg, cin=cin,
                               cout=cout, nb=nb)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_out, cout), feats.dtype),
        interpret=interpret,
    )(starts, local, wstack, feats)


# ---------------------------------------------------------------------------
# Entry points matching sparse_conv.py signatures
# ---------------------------------------------------------------------------

# SUBM_OFFSETS order is (dx+1)*9 + (dy+1)*3 + (dz+1): taps 0-8 have dx=-1,
# 9-17 dx=0, 18-26 dx=+1 — already group-major by dx.
_SUBM_GROUPS = tuple([0] * 9 + [1] * 9 + [2] * 9)
# DOWN_OFFSETS order is dx*4 + dy*2 + dz: taps 0-3 dx=0, 4-7 dx=1.
_DOWN_GROUPS = (0, 0, 0, 0, 1, 1, 1, 1)


def _stack_weight(weight: jax.Array, n_groups: int) -> jax.Array:
    """(K, Cin, Cout) -> (n_groups, Cin, tpg*Cout), taps group-major."""
    k, cin, cout = weight.shape
    tpg = k // n_groups
    return jnp.transpose(weight.reshape(n_groups, tpg, cin, cout),
                         (0, 2, 1, 3)).reshape(n_groups, cin, tpg * cout)


def subm_conv_windowed(feats, weight, rules, block_b=256, window_w=512,
                       interpret=False):
    """Drop-in for sparse_conv.subm_conv (k=3^3, 27 taps)."""
    return windowed_conv(feats, _stack_weight(weight, 3), rules,
                         _SUBM_GROUPS, 3, block_b, window_w, interpret)


def down_conv_windowed(feats, weight, down_rules, block_b=256, window_w=512,
                       interpret=False):
    """Drop-in for sparse_conv.down_conv (k=2 s=2, 8 taps)."""
    return windowed_conv(feats, _stack_weight(weight, 2), down_rules,
                         _DOWN_GROUPS, 2, block_b, window_w, interpret)


def inverse_conv_windowed(feats, weight, parent_idx, child_tap,
                          block_b=256, window_w=512, interpret=False):
    """Drop-in for sparse_conv.inverse_conv.

    Each fine voxel gathers exactly one coarse parent at one tap, so the
    8-tap rulebook is rules[k][v] = parent_idx[v] where child_tap[v] == k.
    All taps share the parent window (one group)."""
    k = weight.shape[0]
    v_fine = parent_idx.shape[0]
    taps = jnp.arange(k, dtype=jnp.int32)[:, None]
    pi = jnp.where(parent_idx >= feats.shape[0], -1, parent_idx)
    rules = jnp.where((child_tap[None, :] == taps) & (pi[None, :] >= 0),
                      pi[None, :], -1).astype(jnp.int32)
    return windowed_conv(feats, _stack_weight(weight, 1), rules,
                         tuple([0] * k), 1, block_b, window_w, interpret)
