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
are dropped (window_rules reports a count; W=384 drops <= 0.005% of taps on
the worst ScanNet-scale scenes measured — the same order of approximation
as the reference's nondeterministic 1000-neighbour ball-query cap,
`functions.py:237-275`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT_MAX = jnp.iinfo(jnp.int32).max


_SUBM_CORR_CHUNK = 49152
_DOWN_CORR_CHUNK = 16384


def subm_plan(v_out: int) -> tuple[int, int, int, int]:
    """(block_b, window_w, n_win, corr_cap) for submanifold rulebooks, by
    static output capacity.  DUAL windows (n_win=2) jump the block-target
    gaps single windows must span; entries outside the windows are re-added
    exactly by the sparse correction.  Width trades the kernel's per-block
    one-hot compare cost (~K*We*B VPU ops — the bound at C=32) against
    correction volume: on batch-4 room rulebooks overflow is 2.5% of live
    entries at w=256 vs 3.5% at w=192 vs 5.5% at w=160, and the measured
    batch-4 train step is 1505 ms (w=256) / 1420 ms (w=192) / 1993 ms
    (w=160, corrections dominate) — w=192 is the knee.  corr_cap SCALES
    with v_out (overflow is per-scene and a multi-scene batch concatenates
    scenes): with a fixed cap, a batch-4 train step fell past the cap into
    the full XLA conv at 852k rows — ~240 ms/conv (gathers superlinear at
    >2M-row tables), 7.8 s/step."""
    m = max(1, -(-v_out // 196608))
    if v_out >= 65536:
        return 256, 192, 2, _SUBM_CORR_CHUNK * m
    return 128, 192, 2, _SUBM_CORR_CHUNK * m


def down_plan(v_out: int) -> tuple[int, int, int, int]:
    """(block_b, window_w, n_win, corr_cap) for k2s2 down rulebooks: fine
    voxel order is not monotone in coarse order across x-slab boundaries,
    so single windows overflow STRUCTURALLY (spans ~1900 rows at block
    128); dual windows jump the gap.  Width shrinks with level size (the
    kernel's one-hot compare cost is ~K*We per output row, so tighter
    windows are a direct VPU cut): batch-4 room rulebooks overflow 0.012%
    at w=192 on the big L0->L1 level and 1.5% at w=256 on L1->L2, but
    30%+ at w<=256 on the sparse deep levels, which keep w=384.  corr_cap
    scales like subm_plan's."""
    if v_out >= 196608:
        w = 192
    elif v_out >= 98304:
        w = 256
    else:
        w = 384
    return 128, w, 2, _DOWN_CORR_CHUNK * max(1, -(-v_out // 98304))


def _mm(lhs, rhs):
    """The ONE matmul site for every kernel below (ADVICE.md: the tacc /
    non-tacc branches previously duplicated precision/dtype settings):
    bf16-cast operands, DEFAULT precision, f32 accumulation."""
    cd = jnp.bfloat16
    return jax.lax.dot(lhs.astype(cd), rhs.astype(cd),
                       precision=jax.lax.Precision.DEFAULT,
                       preferred_element_type=jnp.float32)


def window_rules(rules: jax.Array, group_of_tap: np.ndarray, n_groups: int,
                 w: int, b: int, v_in: int, m_step: int = 1,
                 n_win: int = 1):
    """Per-(block, group) window starts + window-local rule indices.

    Args:
      rules: (K, V_out) int32 global gather indices, -1 missing; monotone
        non-decreasing per tap.
      group_of_tap: (K,) static tap -> window group (taps grouped by dx).
      w, b: per-window width / output block size (static).
      v_in: input row count (window starts are clamped to [0, v_in - w]).
      m_step: output blocks per kernel grid step (amortizes the per-step
        control overhead, ~3 us/step measured).
      n_win: windows per (block, group).  n_win=2 places window 1 at the
        block's min target and window 2 at its first UNCOVERED target —
        same FLOPs/DMA as one 2w window but it jumps the gap when a block's
        targets split into two runs (the structural case for down convs:
        fine-voxel order breaks at x-slab boundaries, spans up to ~1900
        rows where two 384-wide windows cover everything).
    Returns:
      local: (K, V_out) int32 window-local indices into the CONCATENATED
        n_win*w window slab (anything outside [0, n_win*w) contributes zero
        in the kernel — no clipping needed).
      starts: (n_win*n_groups*m_step + 1, nb//m_step) int32 window start
        rows in UNITS OF 16 (the kernel multiplies by 16 so Mosaic can
        prove sublane alignment of the DMA slice), row
        (g*n_win + j)*m_step + m = window j of group g of the step's m-th
        block; -1 for blocks that are pure capacity padding (the kernel
        skips their DMA and zeroes their rows).  Last row: any-valid flag
        per step.
      n_overflow: () int32 — entries dropped because no window covers them
        (should be ~0 with properly sized w).
    """
    k, v_out = rules.shape
    nb = v_out // b
    assert nb % m_step == 0, (nb, m_step)
    rb = rules.reshape(k, nb, b)
    blk_valid = (rb >= 0).any(axis=(0, 2))                  # (nb,)
    starts = []                       # n_groups entries of (n_win, nb)
    locals_g = []                     # per group: (tpg, nb, b) local index
    tap_order = []
    for g in range(n_groups):
        taps = np.nonzero(group_of_tap == g)[0]
        tap_order.extend(taps.tolist())
        sel = rb[taps]                                       # (tpg, nb, b)
        live = sel >= 0
        assigned = ~live
        loc = jnp.where(live, n_win * w, -1)   # live default: dropped
        g_starts = []
        for j in range(n_win):
            rem = jnp.where(assigned, _INT_MAX, sel)
            s = rem.min(axis=(0, 2))                         # (nb,)
            empty = s == _INT_MAX
            s = jnp.clip(jnp.where(empty, 0, s),
                         0, max(v_in - w, 0)) // 16
            # -1 marks an unused window: the kernel skips its DMA entirely
            g_starts.append(jnp.where(empty, -1, s))
            lj = sel - s[None, :, None] * 16
            in_j = ~assigned & (lj >= 0) & (lj < w)
            loc = jnp.where(in_j, j * w + lj, loc)
            assigned = assigned | in_j
        locals_g.append(loc)
        starts.append(jnp.stack(g_starts, axis=0))          # (n_win, nb)
    starts = jnp.stack(starts, axis=0).astype(jnp.int32)    # (ng, n_win, nb)
    local = jnp.concatenate(locals_g, axis=0)               # (K, nb, b)
    inv = np.argsort(np.asarray(tap_order))
    local = local[np.asarray(inv)]
    n_overflow = jnp.sum(local >= n_win * w)
    starts = jnp.where(blk_valid[None, None, :], starts, -1)
    ns = nb // m_step
    # (ng, n_win, ns, m_step) -> rows (g*n_win + j)*m_step + m
    starts = starts.reshape(n_groups * n_win, ns, m_step) \
        .transpose(0, 2, 1).reshape(n_groups * n_win * m_step, ns)
    # per-block validity rows (a valid block can still have -1 window rows
    # when a GROUP has no live entries — the kernel must not zero it), then
    # the per-step any-valid flag
    blk_flag = blk_valid.reshape(ns, m_step).T.astype(jnp.int32)
    step_valid = blk_valid.reshape(ns, m_step).any(axis=1)
    starts = jnp.concatenate(
        [starts, blk_flag, step_valid[None, :].astype(jnp.int32)], axis=0)
    return local.reshape(k, v_out), starts, n_overflow


def window_rules_np(rules: np.ndarray, group_of_tap: np.ndarray,
                    n_groups: int, w: int, b: int, v_in: int,
                    n_win: int = 1):
    """HOST (numpy) mirror of ``window_rules`` (m_step=1): identical greedy
    window placement, bit-identical outputs (tested in test_conv_kernel).

    Why it exists: window geometry depends only on the rulebook, which the
    host builds per batch (data/padding.py) — precomputing it there removes
    all window/compaction work from the device program.  The device-side
    version survives for device-built rulebooks (e.g. backward weight-grad
    windows) and as the no-metadata fallback."""
    int_max = np.iinfo(np.int32).max
    rules = np.asarray(rules)
    k, v_out = rules.shape
    nb = v_out // b
    rb = rules.reshape(k, nb, b)
    blk_valid = (rb >= 0).any(axis=(0, 2))
    starts, locals_g, tap_order = [], [], []
    for g in range(n_groups):
        taps = np.nonzero(group_of_tap == g)[0]
        tap_order.extend(taps.tolist())
        sel = rb[taps]
        live = sel >= 0
        assigned = ~live
        loc = np.where(live, n_win * w, -1)
        g_starts = []
        for j in range(n_win):
            rem = np.where(assigned, int_max, sel)
            s = rem.min(axis=(0, 2))
            empty = s == int_max
            s = np.clip(np.where(empty, 0, s), 0, max(v_in - w, 0)) // 16
            g_starts.append(np.where(empty, -1, s))
            lj = sel - s[None, :, None] * 16
            in_j = ~assigned & (lj >= 0) & (lj < w)
            loc = np.where(in_j, j * w + lj, loc)
            assigned = assigned | in_j
        locals_g.append(loc)
        starts.append(np.stack(g_starts, axis=0))
    starts = np.stack(starts, axis=0).astype(np.int32)
    local = np.concatenate(locals_g, axis=0)
    inv = np.argsort(np.asarray(tap_order))
    local = local[inv]
    n_overflow = int((local >= n_win * w).sum())
    starts = np.where(blk_valid[None, None, :], starts, -1)
    starts = starts.reshape(n_groups * n_win, nb)
    blk_flag = blk_valid[None, :].astype(np.int32)
    starts = np.concatenate([starts, blk_flag, blk_flag], axis=0)
    return (local.reshape(k, v_out).astype(np.int32), starts,
            n_overflow)


class WindowMeta:
    """Host-precomputed windowed-conv metadata for one rulebook: the
    window_rules outputs plus the compacted overflow-correction entries
    (flat (tap, out_voxel, src_row) triples of every rulebook entry the
    windows drop).  A plain pytree-of-arrays (registered below) so it rides
    inside LevelGeom through jit/shard_map."""

    def __init__(self, local, starts, n_overflow, corr_ke, corr_ve,
                 corr_src, ve_sorted=False):
        self.local = local
        self.starts = starts
        self.n_overflow = n_overflow
        self.corr_ke = corr_ke
        self.corr_ve = corr_ve
        self.corr_src = corr_src
        # static: live corr entries sorted by out-voxel (ve) — enables the
        # segment-sum correction path (overflow_correction_sorted)
        self.ve_sorted = bool(ve_sorted)

    def tree_flatten(self):
        return ((self.local, self.starts, self.n_overflow, self.corr_ke,
                 self.corr_ve, self.corr_src), self.ve_sorted)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, ve_sorted=aux)


jax.tree_util.register_pytree_node(
    WindowMeta, WindowMeta.tree_flatten, WindowMeta.tree_unflatten)


def build_window_meta_np(rules: np.ndarray, group_of_tap, n_groups: int,
                         w: int, b: int, v_in: int, n_win: int,
                         corr_cap: int) -> WindowMeta:
    """Host-side WindowMeta: window_rules_np + gather-compacted overflow
    entries, as jnp arrays ready to ship with the batch.  Uses the native
    C++ kernel (csrc/hostops.cpp sg_window_meta) when available — the numpy
    mirror costs ~4 s per ScanNet-scale scan, the native one ~50 ms."""
    from . import native
    rules = np.asarray(rules)
    gmap = np.asarray(group_of_tap, np.int32)
    v_out = rules.shape[1]
    if native.use_native():
        local, starts, n_over, ke, ve, src = native.window_meta_native(
            rules, gmap, n_groups, w, b, v_in, n_win, corr_cap)
        ke, ve, src = (np.array(ke), np.array(ve), np.array(src))
    else:
        local, starts, n_over = window_rules_np(rules, gmap, n_groups, w, b,
                                                v_in, n_win)
        flat = rules.reshape(-1)
        eidx = np.flatnonzero(local.reshape(-1) >= n_win * w)[:corr_cap]
        ke = np.full((corr_cap,), -1, np.int32)
        ve = np.full((corr_cap,), -1, np.int32)
        src = np.full((corr_cap,), -1, np.int32)
        m = len(eidx)
        ke[:m] = eidx // v_out
        ve[:m] = eidx % v_out
        src[:m] = flat[eidx]
    # sort the live prefix by out-voxel: the correction then applies as a
    # monotone segment sum over ve (overflow_correction_sorted) instead of
    # a chunked scatter-add carry.  Order-insensitive consumers (the dw
    # correction) are unaffected.
    n_live = int((np.asarray(ve) >= 0).sum())
    order = np.argsort(ve[:n_live], kind='stable')
    ke[:n_live] = ke[:n_live][order]
    ve[:n_live] = ve[:n_live][order]
    src[:n_live] = src[:n_live][order]
    return WindowMeta(jnp.asarray(local), jnp.asarray(starts),
                      jnp.asarray(np.int32(n_over)), jnp.asarray(ke),
                      jnp.asarray(ve), jnp.asarray(src), ve_sorted=True)


def window_overflow(rules: jax.Array, group_of_tap, n_groups: int,
                    w: int, b: int, v_in: int, n_win: int = 1) -> jax.Array:
    """() int32 count of rulebook entries the windowed kernel would DROP
    because no (block, group) window covers them.

    Production dispatch (sparse_conv.py) guards every windowed-kernel call
    on this count (<= correction capacity) so a pathological rulebook can
    never silently zero taps (VERDICT.md round-1 weak #4).  The count is
    the same one window_rules computes; calling it standalone costs O(K*V)
    int ops — noise next to the conv itself."""
    gmap = np.asarray(group_of_tap, np.int32)
    return window_rules(rules, gmap, n_groups, w, b, v_in, n_win=n_win)[2]


def keyed_window_overflow(out_keys: jax.Array, in_keys: jax.Array, d: int,
                          offsets, group_of_tap, n_groups: int, w: int,
                          b: int, strided: bool) -> jax.Array:
    """() int32 count of (block, group) windows the KEYED kernel cannot
    cover: conservative bound via one searchsorted of each block-group's
    maximal query key against the sorted in-key table.

    Mirrors keyed_windowed_conv's window-start computation (qmin formula)
    exactly; the end bound uses side='right' on qmax, so every actual tap
    hit (key <= qmax) lies strictly below it — zero here PROVES no dropped
    taps.  False positives are possible on blocks with sparse key gaps;
    the dispatch falls back to the exact XLA conv in that case."""
    v_in = in_keys.shape[0]
    v_out = out_keys.shape[0]
    nb = v_out // b
    ok = (out_keys >= 0) & (out_keys != _INT_MAX)
    out_keys_c = jnp.where(ok, out_keys, -1)
    blk = out_keys_c.reshape(nb, b)
    blk_min = jnp.where(blk >= 0, blk, jnp.int32(2 ** 30)).min(axis=1)
    blk_max = jnp.where(blk >= 0, blk, -1).max(axis=1)
    df = 2 * d if strided else d

    def child_key(key, dx, dy, dz):
        zc = key % d
        yc = (key // d) % d
        xc = (key // (d * d)) % d
        bc = key // (d * d * d)
        return ((bc * df + 2 * xc + dx) * df + 2 * yc + dy) * df \
            + 2 * zc + dz

    qmins, qmaxs = [], []
    for g in range(n_groups):
        taps = [o for t, o in enumerate(offsets) if group_of_tap[t] == g]
        if strided:
            dx_lo = min(o[0] for o in taps)
            dx_hi = max(o[0] for o in taps)
            qmins.append(child_key(blk_min, dx_lo, 0, 0))
            qmaxs.append(child_key(blk_max, dx_hi, 1, 1))
        else:
            deltas = [o[0] * d * d + o[1] * d + o[2] for o in taps]
            qmins.append(blk_min + min(deltas))
            qmaxs.append(blk_max + max(deltas))
    qmin = jnp.stack(qmins, axis=1).reshape(-1)
    qmax = jnp.stack(qmaxs, axis=1).reshape(-1)
    in_sorted = jnp.where(in_keys == _INT_MAX, jnp.int32(2 ** 30), in_keys)
    lo = jnp.searchsorted(in_sorted, qmin, side='left', method='sort') \
        .astype(jnp.int32)
    # EXACTLY the kernel's start: clamp to v_in - w, then align DOWN to the
    # 128-row DMA granule (keyed_windowed_conv: clip(pos,...) // 128 * 128)
    lo = jnp.clip(lo, 0, max(v_in - w, 0)) // 128 * 128
    hi = jnp.searchsorted(in_sorted, qmax, side='right', method='sort') \
        .astype(jnp.int32)
    blk_live = (blk_min < jnp.int32(2 ** 30)).repeat(n_groups)
    return jnp.sum(blk_live & (hi - lo > w))


def _conv_kernel(ws_ref, rules_ref, wstack_ref, feats_ref, out_ref,
                 win, u, sems, *, b: int, w: int, k: int, n_groups: int,
                 tpg: int, cin: int, cout: int, ns: int, m_step: int,
                 tacc: bool = False, n_win: int = 1):
    """One grid step = m_step output blocks: DMA their windows (double-
    buffered across the sequential grid), then per block weight-transform
    each window once and accumulate one-hot gather matmuls per tap.
    Multiple blocks per step amortize the ~3 us fixed per-step control
    cost (the dominant non-MXU term at production sizes).

    n_win > 1: each (block, group) has n_win windows DMA'd into one
    contiguous (n_win*w, Cin) VMEM slab; rule locals index the slab (see
    window_rules).  Start row (g*n_win + j)*m_step + m; -1 skips that
    window's DMA (unused second window / padding block).

    tacc=True computes the TRANSPOSED accumulator: the per-tap gather
    matmul becomes uT (Cout, W) @ ohT (W, B) -> (Cout, B), so the MXU's
    128-lane output dimension is the full block B instead of Cout — at
    Cout < 128 the standard orientation pads Cout to 128 lanes and wastes
    up to 4x of the dominant one-hot matmul (the kernel is MXU-bound).
    Costs one (W, Cin) window transpose per group and one (Cout, B)
    accumulator transpose per block; wstack must arrive pre-transposed as
    (n_groups, tpg*Cout, Cin)."""
    step = pl.program_id(0)
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)
    we = n_win * w
    nrows = n_groups * n_win * m_step
    any_row = nrows + m_step           # per-step any-valid flag row

    def row(g, j, m):
        return (g * n_win + j) * m_step + m

    def start_dmas(slot_i, step_i):
        @pl.when(ws_ref[any_row, step_i] > 0)
        def _():
            for m in range(m_step):
                for g in range(n_groups):
                    for j in range(n_win):
                        @pl.when(ws_ref[row(g, j, m), step_i] >= 0)
                        def _(m=m, g=g, j=j):
                            start = pl.multiple_of(
                                ws_ref[row(g, j, m), step_i] * 16, 16)
                            pltpu.make_async_copy(
                                feats_ref.at[pl.ds(start, w)],
                                win.at[slot_i, m, g, pl.ds(j * w, w)],
                                sems.at[slot_i, m, g, j],
                            ).start()

                        # a skipped window (no live entries) must be ZEROED,
                        # not left as stale VMEM: a NaN bit pattern there
                        # would survive the one-hot's 0 coefficient
                        # (NaN * 0 = NaN) and pollute the accumulator
                        @pl.when(ws_ref[row(g, j, m), step_i] < 0)
                        def _(m=m, g=g, j=j):
                            win[slot_i, m, g, j * w:(j + 1) * w, :] = \
                                jnp.zeros((w, cin), win.dtype)

    @pl.when(step == 0)
    def _():
        start_dmas(0, 0)

    @pl.when(step + 1 < ns)
    def _():
        start_dmas(nxt, step + 1)

    @pl.when(ws_ref[any_row, step] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(ws_ref[any_row, step] > 0)
    def _():
        cd = jnp.bfloat16
        iota = (jax.lax.broadcasted_iota(jnp.int32, (we, b), 0) if tacc
                else jax.lax.broadcasted_iota(jnp.int32, (b, we), 1))
        for m in range(m_step):
            @pl.when(ws_ref[nrows + m, step] == 0)
            def _(m=m):
                out_ref[m * b:(m + 1) * b, :] = jnp.zeros(
                    (b, cout), out_ref.dtype)

            @pl.when(ws_ref[nrows + m, step] > 0)
            def _(m=m):
                for g in range(n_groups):
                    for j in range(n_win):
                        @pl.when(ws_ref[row(g, j, m), step] >= 0)
                        def _(m=m, g=g, j=j):
                            pltpu.make_async_copy(
                                feats_ref.at[pl.ds(pl.multiple_of(
                                    ws_ref[row(g, j, m), step] * 16, 16),
                                    w)],
                                win.at[slot, m, g, pl.ds(j * w, w)],
                                sems.at[slot, m, g, j]).wait()
                if tacc:
                    for g in range(n_groups):
                        u[g] = _mm(wstack_ref[g],
                                   win[slot, m, g].T).astype(cd)
                    acc = jnp.zeros((cout, b), jnp.float32)
                    for t in range(k):
                        g, p = t // tpg, t % tpg
                        oh = (rules_ref[t, m * b:(m + 1) * b][None, :]
                              == iota).astype(cd)
                        acc += _mm(u[g, p * cout:(p + 1) * cout, :], oh)
                    out_ref[m * b:(m + 1) * b, :] = acc.T.astype(
                        out_ref.dtype)
                else:
                    for g in range(n_groups):
                        u[g] = _mm(win[slot, m, g],
                                   wstack_ref[g]).astype(cd)
                    acc = jnp.zeros((b, cout), jnp.float32)
                    for t in range(k):
                        g, p = t // tpg, t % tpg
                        oh = (rules_ref[t, m * b:(m + 1) * b][:, None]
                              == iota).astype(cd)
                        acc += _mm(oh, u[g, :, p * cout:(p + 1) * cout])
                    out_ref[m * b:(m + 1) * b, :] = acc.astype(
                        out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('group_of_tap', 'n_groups',
                                             'block_b', 'window_w', 'm_step',
                                             'tacc', 'n_win', 'interpret'))
def windowed_conv(feats: jax.Array, wstack: jax.Array, rules: jax.Array,
                  group_of_tap: tuple, n_groups: int,
                  block_b: int = 256, window_w: int = 512, m_step: int = 1,
                  tacc: bool = False, n_win: int = 1,
                  interpret: bool = False) -> jax.Array:
    """Sparse conv via the windowed gather-GEMM kernel.

    Args:
      feats: (V_in, Cin) input features (bf16 recommended).
      wstack: (n_groups, Cin, tpg*Cout) — tap weights stacked group-major
        (tap t = group g * tpg + p, weight at wstack[g][:, p*Cout:...]).
      rules: (K, V_out) int32 global gather table (monotone per tap).
      group_of_tap: tap -> group (static tuple).
      m_step: output blocks per grid step (control-overhead amortization).
    Returns:
      (V_out, Cout) in feats.dtype, f32-accumulated.
    """
    v_in, cin = feats.shape
    k, v_out = rules.shape
    b, w = block_b, window_w
    gmap = np.asarray(group_of_tap, np.int32)
    local, starts, _ = window_rules(rules, gmap, n_groups, w, b, v_in,
                                    m_step, n_win)
    return _windowed_conv_core(feats, wstack, local, starts, n_groups,
                               b, w, m_step, tacc, interpret, n_win)


def _windowed_conv_core(feats, wstack, local, starts, n_groups, block_b,
                        window_w, m_step, tacc, interpret, n_win=1):
    """Kernel body of windowed_conv with precomputed (local, starts) from
    window_rules (pass the SAME n_win) — so exact dispatch
    (sparse_conv._windowed_exact) can share one window_rules pass between
    the overflow count, the kernel, and the overflow correction."""
    v_in, cin = feats.shape
    k, v_out = local.shape
    tpg = k // n_groups
    cout = wstack.shape[2] // tpg
    b, w = block_b, window_w
    we = n_win * w
    assert v_out % (b * m_step) == 0 and v_in >= w, (v_out, b, m_step,
                                                     v_in, w)
    ns = v_out // (b * m_step)

    # manual HBM->VMEM window DMA requires full 128-lane tiles: pad Cin (the
    # physical HBM layout is lane-padded anyway, and the extra K rows in the
    # transform matmul are zero — same MXU pass count)
    if cin % 128:
        pad = 128 - cin % 128
        feats = jnp.pad(feats, ((0, 0), (0, pad)))
        wstack = jnp.pad(wstack, ((0, 0), (0, pad), (0, 0)))
        cin = cin + pad
    # the kernel's transform matmul runs in bf16 regardless; casting the
    # weight stack outside halves its VMEM block (matters at C=224)
    wstack = wstack.astype(jnp.bfloat16)
    if tacc:
        wstack = jnp.swapaxes(wstack, 1, 2)  # (n_groups, tpg*cout, cin)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((k, b * m_step), lambda i, ws: (0, i)),  # rules
            pl.BlockSpec(wstack.shape, lambda i, ws: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # feats
        ],
        out_specs=pl.BlockSpec((b * m_step, cout), lambda i, ws: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, m_step, n_groups, we, cin), feats.dtype),
            pltpu.VMEM((n_groups, tpg * cout, we) if tacc
                       else (n_groups, we, tpg * cout), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, m_step, n_groups, n_win)),
        ],
    )
    kernel = functools.partial(_conv_kernel, b=b, w=w, k=k,
                               n_groups=n_groups, tpg=tpg, cin=cin,
                               cout=cout, ns=ns, m_step=m_step, tacc=tacc,
                               n_win=n_win)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_out, cout), feats.dtype),
        interpret=interpret,
    )(starts, local, wstack, feats)


def overflow_correction(feats: jax.Array, weight: jax.Array,
                        rules: jax.Array, local: jax.Array, w: int,
                        cap: int, v_out: int,
                        chunk: int = _SUBM_CORR_CHUNK) -> jax.Array:
    """Exact (V_out, Cout) correction for rulebook entries the windowed
    kernel DROPPED (window-local index >= w): compact up to ``cap`` dropped
    (tap, out_voxel) entries with a cumsum, gather their input rows, apply
    the per-tap weight via one one-hot block matmul (same trick as the
    scatter-free inverse conv), and scatter-add into the output.

    With zero overflow this is a fixed small cost (one cumsum over the
    rulebook + cap dustbin rows); with overflow <= cap the kernel + this
    correction is EXACT, so tight windows stay fast without the full XLA
    fallback (down-conv windows overflow structurally at ScanNet scale —
    spans up to ~1900 rows at block 128 — because fine-voxel order is not
    monotone in coarse-voxel order across x-slab boundaries)."""
    n = rules.size
    flat_rules = rules.reshape(-1)
    mask = local.reshape(-1) >= w
    # GATHER-based compaction: slot s holds the index of the (s+1)-th set
    # bit, found by binary search on the running count.  The obvious scatter
    # formulation (full(cap).at[slot].set(arange(n))) has n=5.3M updates
    # funneling into one dustbin slot; XLA lowers that to a serialized
    # scatter fusion measured at 73.6 ms/conv on room scenes (the round-2
    # profile's top op, 515 of 522 ms/scan) vs 0.04 ms for this form.
    # NOTE: sits inside the dispatch lax.cond, so XLA cannot CSE it across
    # convs sharing a rulebook (~8 ms each on room scenes) — production
    # ships host-precomputed entries instead (WindowMeta -> corr paths).
    cs = jnp.cumsum(mask.astype(jnp.int32))
    pos = jnp.searchsorted(cs, jnp.arange(1, cap + 1, dtype=jnp.int32),
                           side='left').astype(jnp.int32)
    valid = pos < n
    eclip = jnp.where(valid, pos, 0)
    ke = jnp.where(valid, eclip // rules.shape[1], -1)
    ve = jnp.where(valid, eclip % rules.shape[1], -1)
    src = jnp.where(valid, flat_rules[eclip], -1)
    return overflow_correction_entries(feats, weight, ke, ve, src, v_out,
                                       chunk=chunk)


def overflow_correction_entries(feats: jax.Array, weight: jax.Array,
                                ke: jax.Array, ve: jax.Array,
                                src: jax.Array, v_out: int,
                                chunk: int = _SUBM_CORR_CHUNK) -> jax.Array:
    """Exact (V_out, Cout) correction from compacted dropped-entry triples
    (tap, out_voxel, src_row), -1 = unused slot: gather the input rows,
    apply the per-tap weight via one one-hot block matmul (the scatter-free
    inverse-conv trick), scatter-add into the output.

    Caps above ``chunk`` run as a lax.scan over chunk-sized slices so the
    (chunk, K*Cin) one-hot block matrix stays bounded (~340 MB bf16 at the
    base chunk) however large the batch-scaled cap grows."""
    k, cin, cout = weight.shape
    cap = ke.shape[0]
    v_in = feats.shape[0]
    padded = jnp.concatenate(
        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    cd = jnp.bfloat16
    wflat = weight.astype(cd).reshape(k * cin, cout)

    def apply_chunk(out, ent):
        ke_c, ve_c, src_c = ent
        valid = ve_c >= 0
        rows = padded[jnp.where(src_c < 0, v_in, src_c)]   # (chunk, Cin)
        oh = jax.nn.one_hot(jnp.clip(ke_c, 0, k - 1), k, dtype=cd)
        aug = (oh[:, :, None] * rows[:, None, :].astype(cd)).reshape(
            -1, k * cin)
        contrib = jnp.dot(aug, wflat, preferred_element_type=jnp.float32)
        contrib = jnp.where(valid[:, None], contrib, 0.0)
        return out.at[jnp.where(valid, ve_c, v_out)].add(contrib)

    out = jnp.zeros((v_out + 1, cout), jnp.float32)
    if cap <= chunk:
        out = apply_chunk(out, (ke, ve, src))
    else:
        assert cap % chunk == 0, (cap, chunk)
        # live entries form a compacted PREFIX (both the host WindowMeta
        # build and the device cumsum compaction emit them first), so only
        # ceil(n_live / chunk) chunks carry work — the static cap is sized
        # for the worst batch and typically 1.5-2x the live count (batch-4
        # rooms: 113k live of 245k cap at L0).  A fori_loop over the live
        # chunks skips the dead ones instead of scanning the full cap.
        n_live = jnp.sum(ve >= 0)
        n_chunks = jnp.minimum((n_live + chunk - 1) // chunk, cap // chunk)

        def body(i, o):
            ent = tuple(jax.lax.dynamic_slice(a, (i * chunk,), (chunk,))
                        for a in (ke, ve, src))
            return apply_chunk(o, ent)

        out = jax.lax.fori_loop(0, n_chunks, body, out)
    return out[:v_out]


def overflow_correction_sorted(feats: jax.Array, weight: jax.Array,
                               ke: jax.Array, ve: jax.Array,
                               src: jax.Array, v_out: int,
                               chunk: int = _SUBM_CORR_CHUNK) -> jax.Array:
    """Correction from VE-SORTED compacted dropped entries: per-entry
    contributions via the one-hot block matmul (chunk-unrolled, NO carried
    (V_out, Cout) buffer), then ONE monotone segment sum over ve through
    the MXU one-hot kernel — replaces the chunk-scan whose every iteration
    scatter-added into a ~109 MB carry (~4 ms/chunk at batch-4 L0).

    Precision: the segment sum splits each f32 contribution column into
    bf16 components (3 -> exact f32 when 3*Cout <= 128, else 2 -> 16
    mantissa bits, already finer than the bf16-input rounding of the
    contributions themselves); falls back to one scatter-add when the
    entries don't fit the kernel's windows or shape constraints."""
    k, cin, cout = weight.shape
    cap = ke.shape[0]
    v_in = feats.shape[0]
    padded = jnp.concatenate(
        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    cd = jnp.bfloat16
    wflat = weight.astype(cd).reshape(k * cin, cout)

    def contrib_chunk(ke_c, ve_c, src_c):
        valid = ve_c >= 0
        rows = padded[jnp.where(src_c < 0, v_in, src_c)]
        oh = jax.nn.one_hot(jnp.clip(ke_c, 0, k - 1), k, dtype=cd)
        aug = (oh[:, :, None] * rows[:, None, :].astype(cd)).reshape(
            -1, k * cin)
        c = jnp.dot(aug, wflat, preferred_element_type=jnp.float32)
        return jnp.where(valid[:, None], c, 0.0)

    if cap <= chunk:
        contrib = contrib_chunk(ke, ve, src)
    else:
        assert cap % chunk == 0, (cap, chunk)
        nc = cap // chunk
        contrib = jnp.concatenate([
            contrib_chunk(ke[i * chunk:(i + 1) * chunk],
                          ve[i * chunk:(i + 1) * chunk],
                          src[i * chunk:(i + 1) * chunk])
            for i in range(nc)])                       # (cap, Cout) f32

    seg = jnp.where(ve >= 0, ve, v_out)   # pads -> dropped by the segsum
    from .dispatch import kernel_interpret, kernels_enabled
    split = 3 if 3 * cout <= 128 else (2 if 2 * cout <= 128 else 1)
    if (kernels_enabled() and v_out % 256 == 0 and cap % 128 == 0
            and cap >= 1024 and cout <= 128):
        from .gather_kernel import monotone_segment_sum_f32
        return monotone_segment_sum_f32(contrib, seg, v_out, split=split,
                                        interpret=kernel_interpret())
    return jnp.zeros((v_out + 1, cout), jnp.float32).at[
        jnp.minimum(seg, v_out)].add(contrib)[:v_out]


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
                       m_step=1, tacc=False, n_win=1, interpret=False):
    """Drop-in for sparse_conv.subm_conv (k=3^3, 27 taps)."""
    return windowed_conv(feats, _stack_weight(weight, 3), rules,
                         _SUBM_GROUPS, 3, block_b, window_w, m_step,
                         tacc, n_win, interpret)


def down_conv_windowed(feats, weight, down_rules, block_b=256, window_w=512,
                       m_step=1, tacc=False, n_win=1, interpret=False):
    """Drop-in for sparse_conv.down_conv (k=2 s=2, 8 taps)."""
    return windowed_conv(feats, _stack_weight(weight, 2), down_rules,
                         _DOWN_GROUPS, 2, block_b, window_w, m_step,
                         tacc, n_win, interpret)


def inverse_conv_windowed(feats, weight, parent_idx, child_tap,
                          block_b=256, window_w=512, m_step=1, tacc=False,
                          interpret=False):
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
                         tuple([0] * k), 1, block_b, window_w, m_step,
                         tacc, interpret=interpret)


# ---------------------------------------------------------------------------
# Keyed windowed conv: neighbour resolution INSIDE the kernel
# ---------------------------------------------------------------------------
#
# For device-built geometry (the tiny refinement U-Net on proposal grids,
# `clusters_voxelization` reference softgroup.py:655-709) building an
# explicit rulebook costs a large sorted join (searchsorted over 27*V
# queries).  But the one-hot gather matrix the windowed kernel needs is just
# an EQUALITY COMPARE on linear keys: OH[i, j] = (key[i] + delta_k ==
# win_keys[j]).  So this variant takes the sorted key table itself, DMAs a
# key window alongside each feature window, and resolves all 27 taps with
# VPU compares — the only remaining host-of-kernel geometry is a tiny
# (n_blocks x n_groups) searchsorted for the window starts.
#
# Keys are dense proposal-grid lin indices: ((b*D + x)*D + y)*D + z with
# static D = spatial_shape; tap validity needs a bounds check on the decoded
# coords (otherwise x=D-1 + 1 wraps into the next proposal's x=0).

def _keyed_kernel(ws_ref, blk_keys_ref, wstack_ref, feats_ref, keys_ref,
                  out_ref, win, wink, u, sems, *, b, w, n_groups, tpg,
                  cin, cout, nb, d, offsets, group_of_tap, strided,
                  tacc=False):
    blk = pl.program_id(0)
    slot = jax.lax.rem(blk, 2)
    nxt = jax.lax.rem(blk + 1, 2)

    def start_dmas(slot_i, blk_i):
        @pl.when(ws_ref[n_groups, blk_i] > 0)
        def _():
            for g in range(n_groups):
                start = pl.multiple_of(ws_ref[g, blk_i] * 128, 128)
                pltpu.make_async_copy(feats_ref.at[pl.ds(start, w)],
                                      win.at[slot_i, g],
                                      sems.at[slot_i, g, 0]).start()
                pltpu.make_async_copy(keys_ref.at[:, pl.ds(start, w)],
                                      wink.at[slot_i, g],
                                      sems.at[slot_i, g, 1]).start()

    @pl.when(blk == 0)
    def _():
        start_dmas(0, 0)

    @pl.when(blk + 1 < nb)
    def _():
        start_dmas(nxt, blk + 1)

    @pl.when(ws_ref[n_groups, blk] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(ws_ref[n_groups, blk] > 0)
    def _():
        for g in range(n_groups):
            start = pl.multiple_of(ws_ref[g, blk] * 128, 128)
            pltpu.make_async_copy(feats_ref.at[pl.ds(start, w)],
                                  win.at[slot, g], sems.at[slot, g, 0]).wait()
            pltpu.make_async_copy(keys_ref.at[:, pl.ds(start, w)],
                                  wink.at[slot, g], sems.at[slot, g, 1]).wait()

        cd = jnp.bfloat16
        for g in range(n_groups):
            u[g] = (_mm(wstack_ref[g], win[slot, g].T) if tacc
                    else _mm(win[slot, g], wstack_ref[g])).astype(cd)

        key = blk_keys_ref[0]                          # (B,)
        valid = key >= 0
        d2, d3 = d * d, d * d * d
        zc = jax.lax.rem(key, d)
        yc = jax.lax.rem(jax.lax.div(key, d), d)
        xc = jax.lax.rem(jax.lax.div(key, d2), d)
        bc = jax.lax.div(key, d3)
        acc = (jnp.zeros((cout, b), jnp.float32) if tacc
               else jnp.zeros((b, cout), jnp.float32))
        k = len(offsets)
        for t in range(k):
            dx, dy, dz = offsets[t]
            g = group_of_tap[t]
            if strided:
                # output key on the COARSE grid; child = 2*coord + tap offset
                q = ((bc * (2 * d) + 2 * xc + dx) * (2 * d)
                     + 2 * yc + dy) * (2 * d) + 2 * zc + dz
                ok = valid
            else:
                q = key + dx * d2 + dy * d + dz
                ok = valid & (xc + dx >= 0) & (xc + dx < d) \
                    & (yc + dy >= 0) & (yc + dy < d) \
                    & (zc + dz >= 0) & (zc + dz < d)
            q = jnp.where(ok, q, -1)
            p = t % tpg
            if tacc:
                oht = (wink[slot, g].reshape(w, 1) == q[None, :]) \
                    .astype(cd)                             # (W, B)
                acc += _mm(u[g, p * cout:(p + 1) * cout, :], oht)
            else:
                oh = (q[:, None] == wink[slot, g]).astype(cd)   # (B, W)
                acc += _mm(oh, u[g, :, p * cout:(p + 1) * cout])
        out_ref[:] = (acc.T if tacc else acc).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    'spatial_shape', 'n_groups', 'group_of_tap', 'offsets', 'strided',
    'block_b', 'window_w', 'tacc', 'interpret'))
def keyed_windowed_conv(feats, wstack, out_keys, in_keys, spatial_shape,
                        n_groups, group_of_tap, offsets, strided=False,
                        block_b=128, window_w=512, tacc=False,
                        interpret=False):
    """Windowed conv resolving neighbours by key equality in-kernel.

    Args:
      feats: (V_in, Cin); in_keys (V_in,) SORTED linear keys (INT_MAX pads).
      out_keys: (V_out,) sorted linear keys of output voxels (-1/INT_MAX
        pads; == in_keys for submanifold).
      spatial_shape: static D of the per-proposal grid (the key stride);
        for strided=True it is the COARSE D (fine grid is 2D).
      offsets: static tuple of (dx, dy, dz) taps, group-major by dx.
      strided: k2s2 down conv (out on coarse grid, window over fine keys).
    """
    v_in, cin = feats.shape
    v_out = out_keys.shape[0]
    k = len(offsets)
    tpg = k // n_groups
    cout = wstack.shape[2] // tpg
    b, w = block_b, window_w
    assert v_out % b == 0 and v_in >= w, (v_out, b, v_in, w)
    nb = v_out // b

    if cin % 128:
        pad = 128 - cin % 128
        feats = jnp.pad(feats, ((0, 0), (0, pad)))
        wstack = jnp.pad(wstack, ((0, 0), (0, pad), (0, 0)))
        cin = cin + pad

    if tacc:
        wstack = jnp.swapaxes(wstack, 1, 2)  # (n_groups, tpg*cout, cin)

    d = spatial_shape
    ok = (out_keys >= 0) & (out_keys != _INT_MAX)
    out_keys_c = jnp.where(ok, out_keys, -1)

    # window starts: one tiny searchsorted per (block, group) on the minimal
    # in-key each block's group can reference
    blk_first = out_keys_c.reshape(nb, b)
    blk_first = jnp.where(blk_first >= 0, blk_first, jnp.int32(2 ** 30))
    blk_first = blk_first.min(axis=1)                  # (nb,)
    dmins = []
    df = 2 * d if strided else d
    for g in range(n_groups):
        taps = [o for t, o in enumerate(offsets) if group_of_tap[t] == g]
        if strided:
            # child key of the block-min coarse key with the minimal tap
        # (decode on host side of the kernel: done in jnp here)
            dx = min(o[0] for o in taps)
            zc = blk_first % d
            yc = (blk_first // d) % d
            xc = (blk_first // (d * d)) % d
            bc = blk_first // (d * d * d)
            qmin = ((bc * df + 2 * xc + dx) * df + 2 * yc) * df + 2 * zc
        else:
            delta = min(o[0] * d * d + o[1] * d + o[2] for o in taps)
            qmin = blk_first + delta
        dmins.append(qmin)
    q = jnp.stack(dmins, axis=1).reshape(-1)           # (nb*n_groups,)
    in_sorted = jnp.where(in_keys == _INT_MAX, jnp.int32(2 ** 30), in_keys)
    pos = jnp.searchsorted(in_sorted, q, side='left', method='sort') \
        .astype(jnp.int32).reshape(nb, n_groups)
    starts = (jnp.clip(pos, 0, max(v_in - w, 0)) // 128).T  # (n_groups, nb)
    blk_valid = (blk_first < jnp.int32(2 ** 30)).astype(jnp.int32)[None, :]
    starts = jnp.concatenate([starts, blk_valid], axis=0)

    keys2d = in_sorted[None, :]                        # (1, V_in)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, b), lambda i, ws: (0, i)),     # out keys
            pl.BlockSpec(wstack.shape, lambda i, ws: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # feats
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # keys2d
        ],
        out_specs=pl.BlockSpec((b, cout), lambda i, ws: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, n_groups, w, cin), feats.dtype),
            pltpu.VMEM((2, n_groups, 1, w), jnp.int32),
            pltpu.VMEM((n_groups, tpg * cout, w) if tacc
                       else (n_groups, w, tpg * cout), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, n_groups, 2)),
        ],
    )
    kernel = functools.partial(
        _keyed_kernel, b=b, w=w, n_groups=n_groups, tpg=tpg, cin=cin,
        cout=cout, nb=nb, d=d, offsets=tuple(offsets),
        group_of_tap=tuple(group_of_tap), strided=strided, tacc=tacc)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_out, cout), feats.dtype),
        interpret=interpret,
    )(starts, out_keys_c[None, :], wstack, feats, keys2d)


_SUBM_OFFS = tuple((dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                   for dz in (-1, 0, 1))
_DOWN_OFFS = tuple((dx, dy, dz) for dx in (0, 1) for dy in (0, 1)
                   for dz in (0, 1))


def keyed_subm_conv(feats, weight, ckey, spatial_shape, block_b=128,
                    window_w=512, tacc=False, interpret=False):
    """Submanifold conv on a sorted proposal-grid key table (no rulebook)."""
    return keyed_windowed_conv(
        feats, _stack_weight(weight, 3), ckey, ckey, spatial_shape, 3,
        _SUBM_GROUPS, _SUBM_OFFS, False, block_b, window_w, tacc, interpret)


def keyed_down_conv(feats, weight, fine_key, coarse_key, coarse_d,
                    block_b=128, window_w=1024, tacc=False, interpret=False):
    """k2s2 down conv: coarse out keys, window over the fine key table
    (each coarse block references up to ~8x block_b fine rows, hence the
    wider window — measured worst 766 on dense proposal blobs)."""
    return keyed_windowed_conv(
        feats, _stack_weight(weight, 2), coarse_key, fine_key, coarse_d, 2,
        _DOWN_GROUPS, _DOWN_OFFS, True, block_b, window_w, tacc, interpret)


# ---------------------------------------------------------------------------
# Differentiable wrappers for the keyed convs: the backward reconstructs an
# explicit rulebook from the key table (one searchsorted — paid only inside
# the training backward, never at inference) and reuses the XLA conv VJP.
# ---------------------------------------------------------------------------

def _rules_from_keys(out_keys, in_keys, d, offsets, strided):
    """(K, V_out) rulebook by key lookup (jittable, XLA)."""
    ok = (out_keys >= 0) & (out_keys != _INT_MAX)
    key = jnp.where(ok, out_keys, -1)
    d2, d3 = d * d, d * d * d
    zc = key % d
    yc = (key // d) % d
    xc = (key // d2) % d
    bc = key // d3
    qs = []
    df = 2 * d
    for (dx, dy, dz) in offsets:
        if strided:
            q = ((bc * df + 2 * xc + dx) * df + 2 * yc + dy) * df \
                + 2 * zc + dz
            t_ok = ok
        else:
            q = key + dx * d2 + dy * d + dz
            t_ok = ok & (xc + dx >= 0) & (xc + dx < d) \
                & (yc + dy >= 0) & (yc + dy < d) \
                & (zc + dz >= 0) & (zc + dz < d)
        qs.append(jnp.where(t_ok, q, jnp.int32(2 ** 30)))
    q = jnp.stack(qs, axis=0)                               # (K, V_out)
    tab = jnp.where(in_keys == _INT_MAX, jnp.int32(2 ** 30) - 1, in_keys)
    pos = jnp.searchsorted(tab, q.reshape(-1), side='left', method='sort') \
        .astype(jnp.int32).reshape(q.shape)
    v_in = in_keys.shape[0]
    pc = jnp.clip(pos, 0, v_in - 1)
    hit = (pos < v_in) & (tab[pc] == q)
    return jnp.where(hit, pc, -1)


def _keyed_vjp(fwd_fn, rules_fn):
    @jax.custom_vjp
    def f(feats, weight, *keys_args):
        return fwd_fn(feats, weight, *keys_args)

    def fwd(feats, weight, *keys_args):
        return f(feats, weight, *keys_args), (feats, weight, keys_args)

    def bwd(res, g):
        from .sparse_conv import _conv_xla
        feats, weight, keys_args = res
        rules = rules_fn(*keys_args)
        g_feats = jax.vjp(
            lambda x: _conv_xla(x, weight, rules, feats.dtype), feats
        )[1](g)[0]
        g_weight = jax.vjp(
            lambda w: _conv_xla(feats, w, rules, feats.dtype), weight
        )[1](g)[0]
        return (g_feats, g_weight) + (None,) * len(keys_args)

    f.defvjp(fwd, bwd)
    return f


def keyed_subm_conv_ad(feats, weight, ckey, spatial_shape, **kw):
    def fwd(x, w, k):
        from .sparse_conv import _conv_xla
        n_bad = keyed_window_overflow(
            k, k, spatial_shape, _SUBM_OFFS, _SUBM_GROUPS, 3,
            kw.get('window_w', 512), kw.get('block_b', 128), False)
        return jax.lax.cond(
            n_bad == 0,
            lambda: keyed_subm_conv(x, w, k, spatial_shape, **kw),
            lambda: _conv_xla(x, w, _rules_from_keys(
                k, k, spatial_shape, _SUBM_OFFS, False), x.dtype))

    f = _keyed_vjp(
        fwd,
        lambda k: _rules_from_keys(k, k, spatial_shape, _SUBM_OFFS, False))
    return f(feats, weight, ckey)


def keyed_down_conv_ad(feats, weight, fine_key, coarse_key, coarse_d, **kw):
    def fwd(x, w, fk, ck):
        from .sparse_conv import _conv_xla
        n_bad = keyed_window_overflow(
            ck, fk, coarse_d, _DOWN_OFFS, _DOWN_GROUPS, 2,
            kw.get('window_w', 1024), kw.get('block_b', 128), True)
        return jax.lax.cond(
            n_bad == 0,
            lambda: keyed_down_conv(x, w, fk, ck, coarse_d, **kw),
            lambda: _conv_xla(x, w, _rules_from_keys(
                ck, fk, coarse_d, _DOWN_OFFS, True), x.dtype))

    f = _keyed_vjp(
        fwd,
        lambda fk, ck: _rules_from_keys(ck, fk, coarse_d, _DOWN_OFFS, True))
    return f(feats, weight, fine_key, coarse_key)


def dw_overflow_correction(feats: jax.Array, g_out: jax.Array,
                           ke: jax.Array, ve: jax.Array, src: jax.Array,
                           k: int,
                           chunk: int = _SUBM_CORR_CHUNK) -> jax.Array:
    """Exact (K, Cin, Cout) weight-grad correction for rulebook entries the
    dw kernel's windows DROP: dW[t] += feats[src_e] (x) g[ve_e] for every
    compacted dropped entry (tap t, out_voxel ve, src row) — the same
    one-hot block-matrix trick as the forward correction, transposed:
    aug (cap, K*Cin) ^T @ g_rows (cap, Cout) is ONE matmul.  Chunked like
    overflow_correction_entries for batch-scaled caps."""
    cin = feats.shape[1]
    cout = g_out.shape[1]
    cap = ke.shape[0]
    v_in = feats.shape[0]
    padded = jnp.concatenate(
        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    cd = jnp.bfloat16

    def chunk_dw(acc, ent):
        # The (chunk, K*Cin) one-hot augmented block + ONE matmul.  A
        # per-tap masked-matmul variant (K small matmuls, no widened
        # intermediate) was tried in round 5 and profiled 2x SLOWER on the
        # real train step (8.9 vs 4.2 ms per L0 correction): the K matmuls
        # re-stream rows/grows from HBM with M=N=Cout-sliver MXU shapes,
        # while XLA fuses this aug build into one well-shaped contraction.
        ke_c, ve_c, src_c = ent
        valid = ve_c >= 0
        rows = padded[jnp.where(src_c < 0, v_in, src_c)]
        grows = g_out[jnp.clip(ve_c, 0, g_out.shape[0] - 1)]
        grows = jnp.where(valid[:, None], grows.astype(cd), 0)
        oh = jax.nn.one_hot(jnp.clip(ke_c, 0, k - 1), k, dtype=cd)
        aug = (oh[:, :, None] * rows[:, None, :].astype(cd)).reshape(
            -1, k * cin)
        return acc + jax.lax.dot_general(
            aug, grows, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jnp.zeros((k * cin, cout), jnp.float32)
    if cap <= chunk:
        acc = chunk_dw(acc, (ke, ve, src))
    else:
        assert cap % chunk == 0, (cap, chunk)
        # live-prefix fori_loop — see overflow_correction_entries
        n_live = jnp.sum(ve >= 0)
        n_chunks = jnp.minimum((n_live + chunk - 1) // chunk, cap // chunk)

        def body(i, a):
            ent = tuple(jax.lax.dynamic_slice(x, (i * chunk,), (chunk,))
                        for x in (ke, ve, src))
            return chunk_dw(a, ent)

        acc = jax.lax.fori_loop(0, n_chunks, body, acc)
    return acc.reshape(k, cin, cout)


# ---------------------------------------------------------------------------
# Weight-gradient kernel: dW[k] = sum_v feats[rules[k, v]] (x) g[v]
# ---------------------------------------------------------------------------
#
# The training backward's weight gradient is the same windowed gather as the
# forward followed by a per-tap outer-product reduction; XLA's fallback pays
# 27 row gathers per conv.  This kernel reuses the forward's windows/one-hots
# and accumulates dW in a VMEM-resident output across the sequential grid.

def _dw_kernel(ws_ref, rules_ref, g_ref, feats_ref, out_ref, win, sems, *,
               b, w, k, n_groups, tpg, cin, cout, nb, n_win=1):
    blk = pl.program_id(0)
    slot = jax.lax.rem(blk, 2)
    nxt = jax.lax.rem(blk + 1, 2)
    we = n_win * w
    nrows = n_groups * n_win          # then block-flag row, then any row

    def start_dmas(slot_i, blk_i):
        @pl.when(ws_ref[nrows + 1, blk_i] > 0)
        def _():
            for g in range(n_groups):
                for j in range(n_win):
                    @pl.when(ws_ref[g * n_win + j, blk_i] >= 0)
                    def _(g=g, j=j):
                        start = pl.multiple_of(
                            ws_ref[g * n_win + j, blk_i] * 16, 16)
                        pltpu.make_async_copy(
                            feats_ref.at[pl.ds(start, w)],
                            win.at[slot_i, g, pl.ds(j * w, w)],
                            sems.at[slot_i, g, j]).start()

                    @pl.when(ws_ref[g * n_win + j, blk_i] < 0)
                    def _(g=g, j=j):
                        # stale VMEM could carry NaN past the one-hot zero
                        win[slot_i, g, j * w:(j + 1) * w, :] = \
                            jnp.zeros((w, cin), win.dtype)

    @pl.when(blk == 0)
    def _():
        start_dmas(0, 0)
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(blk + 1 < nb)
    def _():
        start_dmas(nxt, blk + 1)

    @pl.when(ws_ref[nrows, blk] > 0)
    def _():
        for g in range(n_groups):
            for j in range(n_win):
                @pl.when(ws_ref[g * n_win + j, blk] >= 0)
                def _(g=g, j=j):
                    pltpu.make_async_copy(
                        feats_ref.at[pl.ds(pl.multiple_of(
                            ws_ref[g * n_win + j, blk] * 16, 16), w)],
                        win.at[slot, g, pl.ds(j * w, w)],
                        sems.at[slot, g, j]).wait()

        cd = jnp.bfloat16
        gb = g_ref[:].astype(cd)                        # (B, Cout)
        # contraction order matters: h_t = oh^T @ g costs W*B*Cout (no Cin
        # factor — the padded Cin=128 never enters), then ONE per-group
        # (Cin, W) x (W, tpg*Cout) matmul produces the group's whole dW
        # block.  ~2x fewer FLOPs than gather-then-outer-product and the
        # MXU sees K=W, N=tpg*Cout shapes instead of N=Cout slivers.
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (we, b), 0)
        for g in range(n_groups):
            hs = []
            for p in range(tpg):
                t = g * tpg + p
                oht = (rules_ref[t][None, :] == iota_w).astype(cd)  # (We, B)
                hs.append(_mm(oht, gb).astype(cd))
            h = jnp.concatenate(hs, axis=1)              # (We, tpg*Cout)
            out_ref[g] += jax.lax.dot_general(
                win[slot, g].astype(cd), h,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)      # (Cin, tpg*Cout)


@functools.partial(jax.jit, static_argnames=('group_of_tap', 'n_groups',
                                             'block_b', 'window_w',
                                             'n_win', 'interpret'))
def windowed_conv_dw(feats, g_out, rules, group_of_tap, n_groups,
                     block_b=128, window_w=384, n_win=1, interpret=False,
                     local=None, starts=None):
    """Weight gradient of windowed_conv wrt the (K, Cin, Cout) weights.

    ``local``/``starts``: optional precomputed window geometry (WindowMeta,
    same (b, w, n_win) — the forward's metadata is reusable because dw
    shares the forward's windows); computed on device otherwise."""
    v_in, cin_real = feats.shape
    k, v_out = rules.shape
    cout = g_out.shape[1]
    tpg = k // n_groups
    b, w = block_b, window_w
    we = n_win * w
    assert v_out % b == 0 and v_in >= w
    nb = v_out // b
    feats_p = feats
    cin = cin_real
    if cin % 128:
        pad = 128 - cin % 128
        feats_p = jnp.pad(feats, ((0, 0), (0, pad)))
        cin += pad
    if local is None:
        gmap = np.asarray(group_of_tap, np.int32)
        local, starts, _ = window_rules(rules, gmap, n_groups, w, b, v_in,
                                        n_win=n_win)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((k, b), lambda i, ws: (0, i)),
            pl.BlockSpec((b, cout), lambda i, ws: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((n_groups, cin, tpg * cout),
                               lambda i, ws: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, n_groups, we, cin), feats_p.dtype),
            pltpu.SemaphoreType.DMA((2, n_groups, n_win)),
        ],
    )
    kernel = functools.partial(_dw_kernel, b=b, w=w, k=k, n_groups=n_groups,
                               tpg=tpg, cin=cin, cout=cout, nb=nb,
                               n_win=n_win)
    dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups, cin, tpg * cout),
                                       jnp.float32),
        interpret=interpret,
    )(starts, local, g_out, feats_p)
    # (n_groups, cin, tpg*cout) -> (K, cin_real, cout), inverting _stack_weight
    dw = dw.reshape(n_groups, cin, tpg, cout).transpose(0, 2, 1, 3)
    return dw.reshape(k, cin, cout)[:, :cin_real, :]
