"""Sparse 3D convolution compute path: gather + per-tap GEMM over rulebooks.

Replaces spconv 2.x's implicit-GEMM CUDA kernels (the reference's external
sparse-conv engine, used at `softgroup/model/blocks.py:57-70,101-119`).

TPU-first formulation: with a dense (K, V) rulebook (see rulebook.py), a
sparse conv is

    out[v] = sum_k  feats_with_zero_row[rules[k, v]] @ W[k]

i.e. K gathers of (V, Cin) followed by K (V, Cin) x (Cin, Cout) matmuls that
XLA tiles straight onto the MXU.  V is padded/static, so the whole U-Net
compiles to one fused dense program — no rulebook re-building, no dynamic
allocation, no atomics (the scatter of spconv's gather-GEMM-scatter vanishes
because our rulebooks are output-indexed).

The invalid-tap convention: rules == -1 gathers row V (an appended zero row),
so missing neighbours contribute exactly zero — the same semantics as
spconv's submanifold convolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Pallas windowed-gather kernel dispatch (see conv_kernel.py): XLA's row
# gather moves a full (16, 128) tile per row AND serializes badly in fused
# programs, so the kernel wins at every U-Net width (measured per-conv,
# chained-in-one-jit, ScanNet-scale rulebooks: 3.9 vs 11.5 ms at
# V=196k/C=32; 0.09 vs 0.32 ms at V=8k/C=128; 0.07 vs 0.43 ms at
# V=4k/C=160); XLA remains the portable fallback (CPU tests) and the
# autodiff implementation.
_KERNEL_MAX_CHANNELS = 256
_KERNEL_MIN_VOXELS = 512


def _kernel_bw(v_out: int) -> tuple[int, int, int]:
    """(block_b, window_w, n_win) by output size — see conv_kernel.subm_plan
    (the single source of window sizing, shared with the host-side
    WindowMeta precompute in data/padding.py)."""
    from .conv_kernel import subm_plan
    return subm_plan(v_out)[:3]


def _kernel_ok(v_out: int, v_in: int, cout: int) -> bool:
    from .dispatch import kernels_enabled
    b, w, _ = _kernel_bw(v_out)
    return (kernels_enabled()
            and cout <= _KERNEL_MAX_CHANNELS
            and v_out % b == 0
            and v_out >= _KERNEL_MIN_VOXELS
            and v_in >= w)


def _windowed_exact(feats, weight, rules, groups, n_groups,
                    corr_cap=4096, b=None, w=None, n_win=1, win=None):
    """Windowed-kernel conv, EXACT at any rulebook: window_rules feeds the
    kernel, the overflow count, and (when overflow > 0) the sparse
    correction that re-adds dropped taps.  Only rulebooks with more than
    ``corr_cap`` dropped entries fall back to the full XLA conv.

    ``win`` (conv_kernel.WindowMeta): host-precomputed window geometry +
    compacted correction entries, shipped with the batch (data/padding.py).
    Without it everything is recomputed on device per conv — and because it
    sits inside this dispatch's lax.cond, XLA cannot CSE it across the
    convs sharing a rulebook (measured ~8 ms/conv extra on room scenes)."""
    import numpy as np

    from .conv_kernel import (_stack_weight, _windowed_conv_core,
                              overflow_correction,
                              overflow_correction_entries, window_rules)
    from .dispatch import kernel_interpret, tacc_enabled
    if b is None:
        b, w, n_win = _kernel_bw(rules.shape[1])
    if feats.shape[0] < w or rules.shape[1] % b:
        return _conv_xla(feats, weight, rules, feats.dtype)
    v_out = rules.shape[1]
    if win is not None:
        local, starts, n_over = win.local, win.starts, win.n_overflow
    else:
        gmap = np.asarray(groups, np.int32)
        local, starts, n_over = window_rules(rules, gmap, n_groups, w, b,
                                             feats.shape[0], n_win=n_win)
    wstack = _stack_weight(weight, n_groups)

    from .conv_kernel import _DOWN_CORR_CHUNK, _SUBM_CORR_CHUNK
    chunk = _DOWN_CORR_CHUNK if rules.shape[0] == 8 else _SUBM_CORR_CHUNK

    def correction():
        if win is not None and getattr(win, 've_sorted', False):
            from .conv_kernel import overflow_correction_sorted
            return overflow_correction_sorted(
                feats, weight, win.corr_ke, win.corr_ve, win.corr_src,
                v_out, chunk=chunk)
        if win is not None:
            return overflow_correction_entries(
                feats, weight, win.corr_ke, win.corr_ve, win.corr_src,
                v_out, chunk=chunk)
        return overflow_correction(feats, weight, rules, local, n_win * w,
                                   corr_cap, v_out, chunk=chunk)

    def kernel_path():
        out = _windowed_conv_core(feats, wstack, local, starts, n_groups,
                                  b, w, 1, tacc_enabled(),
                                  kernel_interpret(), n_win)
        return jax.lax.cond(
            n_over == 0,
            lambda: out,
            lambda: (out.astype(jnp.float32) + correction()
                     ).astype(out.dtype))

    return jax.lax.cond(n_over <= corr_cap, kernel_path,
                        lambda: _conv_xla(feats, weight, rules, feats.dtype))


def _gather_padded(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows of ``feats`` with -1 mapping to a zero row."""
    v = feats.shape[0]
    zero_row = jnp.zeros((1,) + feats.shape[1:], feats.dtype)
    padded = jnp.concatenate([feats, zero_row], axis=0)
    return padded[jnp.where(idx < 0, v, idx)]


def subm_conv(feats: jax.Array, weight: jax.Array, rules: jax.Array,
              compute_dtype=None, win=None) -> jax.Array:
    """Submanifold k=3 conv: feats (V, Cin), weight (27, Cin, Cout),
    rules (27, V) -> (V, Cout).

    Matches `spconv.SubMConv3d(kernel_size=3, padding=1, bias=False)`.
    The 27 gathers+matmuls are expressed as one batched einsum so XLA can
    schedule them as a single large contraction.  ``win``: optional
    host-precomputed WindowMeta for this rulebook (see _windowed_exact).
    """
    cd = compute_dtype or feats.dtype
    if rules.shape[0] == 27 and feats.shape[0] == rules.shape[1]:
        return _subm_vjp(feats.astype(cd), weight, rules,
                         win).astype(feats.dtype)
    if rules.shape[0] == 8:
        return _down_vjp(feats.astype(cd), weight, rules,
                         win).astype(feats.dtype)
    return _conv_xla(feats, weight, rules, cd)


def _conv_xla(feats, weight, rules, cd):
    """Portable gather-GEMM path (and the autodiff implementation).

    Unrolled taps (python loop): XLA schedules the K gathers in parallel
    with the matmuls; a lax.scan would serialize them."""
    v_out = rules.shape[1]
    c_out = weight.shape[2]
    v = feats.shape[0]
    zero_row = jnp.zeros((1,) + feats.shape[1:], feats.dtype)
    padded = jnp.concatenate([feats, zero_row], axis=0)
    acc = jnp.zeros((v_out, c_out), jnp.float32)
    for k in range(rules.shape[0]):
        g = padded[jnp.where(rules[k] < 0, v, rules[k])].astype(cd)
        acc = acc + jnp.dot(g, weight[k].astype(cd),
                            preferred_element_type=jnp.float32)
    return acc.astype(feats.dtype)


def _dw(feats, g, rules, groups, n_groups, weight_dtype, win=None):
    """Weight gradient — Pallas kernel when eligible, XLA gather-vjp
    otherwise (CPU).  Both are exact.  Unlike the forward, the dw kernel
    has NO Cout cap: its output is the (n_groups, Cin, tpg*Cout) weight
    block, so wide channels never blow up VMEM.

    ``win`` (WindowMeta): the FORWARD's host-precomputed window geometry —
    dw uses the same (b, w, n_win) plan per rulebook kind, so the windows,
    overflow count, and compacted dropped entries are all reusable, and the
    dw overflow correction (dw_overflow_correction) keeps the kernel path
    exact at any realistic overflow instead of falling back to the 27x
    gather XLA backward (on surface scenes L0/L1 always overflow, which
    made every training step pay the fallback: 7.9 s/step at batch 4)."""
    from .conv_kernel import down_plan, subm_plan
    from .dispatch import kernels_enabled
    k = len(groups)
    b, w, n_win, cap = (down_plan if k == 8 else subm_plan)(rules.shape[1])

    def xla_dw():
        zeros_w = jnp.zeros((k,) + (feats.shape[1], g.shape[1]),
                            weight_dtype)
        return jax.vjp(lambda w: _conv_xla(feats, w, rules, feats.dtype),
                       zeros_w)[1](g)[0]

    if (kernels_enabled()
            and rules.shape[1] % b == 0
            and rules.shape[1] >= _KERNEL_MIN_VOXELS
            and feats.shape[0] >= w):
        from .conv_kernel import (dw_overflow_correction, window_overflow,
                                  windowed_conv_dw)
        from .dispatch import kernel_interpret
        gc = g.astype(feats.dtype)
        if win is not None:
            local, starts, n_over = win.local, win.starts, win.n_overflow

            def kernel_path():
                dw = windowed_conv_dw(feats, gc, rules, groups, n_groups,
                                      b, w, n_win=n_win,
                                      interpret=kernel_interpret(),
                                      local=local, starts=starts)
                from .conv_kernel import (_DOWN_CORR_CHUNK,
                                          _SUBM_CORR_CHUNK)
                chunk = _DOWN_CORR_CHUNK if k == 8 else _SUBM_CORR_CHUNK
                dw = jax.lax.cond(
                    n_over == 0,
                    lambda: dw,
                    lambda: dw + dw_overflow_correction(
                        feats, gc, win.corr_ke, win.corr_ve, win.corr_src,
                        k, chunk=chunk))
                return dw.astype(weight_dtype)

            return jax.lax.cond(n_over <= cap, kernel_path, xla_dw)
        return jax.lax.cond(
            window_overflow(rules, groups, n_groups, w, b,
                            feats.shape[0], n_win=n_win) == 0,
            lambda: windowed_conv_dw(feats, gc, rules,
                                     groups, n_groups, b, w, n_win=n_win,
                                     interpret=kernel_interpret())
            .astype(weight_dtype),
            xla_dw)
    return xla_dw()


@jax.custom_vjp
def _subm_vjp(feats, weight, rules, win):
    """Submanifold conv with a scatter-free backward.

    Forward: Pallas windowed kernel when eligible, XLA gather-GEMM
    otherwise.  Backward grad-wrt-feats uses offset symmetry — the
    transpose of tap k is tap K-1-k on the SAME rulebook (subm in/out voxel
    sets coincide) — so it is just the conv with flipped transposed weights:
    pure gathers on both backends, never XLA's scatter-add transpose.
    """
    if _kernel_ok(rules.shape[1], feats.shape[0], weight.shape[2]):
        from .conv_kernel import _SUBM_GROUPS, subm_plan
        # transposed accumulator (tacc, threaded via dispatch.py): the
        # one-hot matmul's output lanes become the block dim instead of
        # Cout padded to 128 lanes.  Measured in-program (bench.py):
        # 106.5 -> 76.4 ms/scan enabling it at every width.
        return _windowed_exact(feats, weight, rules, _SUBM_GROUPS, 3,
                               corr_cap=subm_plan(rules.shape[1])[3],
                               win=win)
    return _conv_xla(feats, weight, rules, feats.dtype)


def _subm_fwd(feats, weight, rules, win):
    return _subm_vjp(feats, weight, rules, win), (feats, weight, rules, win)


def _subm_bwd(res, g):
    from .conv_kernel import _SUBM_GROUPS
    feats, weight, rules, win = res
    w_t = jnp.flip(jnp.swapaxes(weight, 1, 2), axis=0)
    # the transposed conv runs on the SAME rulebook, and WindowMeta is
    # weight-independent (the correction applies whatever weights the call
    # passes — here the flipped transposed ones), so win is reused as-is
    g_feats = _subm_vjp(g.astype(feats.dtype), w_t, rules, win)
    g_weight = _dw(feats, g, rules, _SUBM_GROUPS, 3, weight.dtype,
                   win=win)
    return g_feats, g_weight, None, None


_subm_vjp.defvjp(_subm_fwd, _subm_bwd)


@jax.custom_vjp
def _down_vjp(feats, weight, rules, win):
    """k2s2 down conv with a scatter-free backward: grad wrt the fine feats
    is the paired INVERSE conv (each fine voxel has exactly one (parent,
    tap)) — a gather, reconstructed from the down rulebook with one small
    int scatter instead of XLA's (V_fine, C) scatter-add transpose."""
    if _kernel_ok(rules.shape[1], feats.shape[0], weight.shape[2]):
        from .conv_kernel import _DOWN_GROUPS, down_plan
        b, w, n_win, cap = down_plan(rules.shape[1])
        return _windowed_exact(feats, weight, rules, _DOWN_GROUPS, 2,
                               corr_cap=cap, b=b, w=w, n_win=n_win,
                               win=win)
    return _conv_xla(feats, weight, rules, feats.dtype)


def _down_fwd(feats, weight, rules, win):
    return _down_vjp(feats, weight, rules, win), (feats, weight, rules, win)


def _down_bwd(res, g):
    from .conv_kernel import _DOWN_GROUPS
    feats, weight, rules, win = res
    v_f = feats.shape[0]
    v_c = rules.shape[1]
    k = rules.shape[0]
    flat_v = jnp.where(rules >= 0, rules, v_f).reshape(-1)
    cols = jnp.broadcast_to(jnp.arange(v_c, dtype=jnp.int32)[None, :],
                            (k, v_c)).reshape(-1)
    taps = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[:, None],
                            (k, v_c)).reshape(-1)
    parent_idx = jnp.full((v_f + 1,), v_c, jnp.int32).at[flat_v].set(
        cols)[:v_f]
    child_tap = jnp.zeros((v_f + 1,), jnp.int32).at[flat_v].set(taps)[:v_f]
    w_t = jnp.swapaxes(weight, 1, 2)
    g_feats = inverse_conv(g.astype(feats.dtype), w_t, parent_idx, child_tap)
    g_weight = _dw(feats, g, rules, _DOWN_GROUPS, 2, weight.dtype,
                   win=win)
    return g_feats, g_weight, None, None


_down_vjp.defvjp(_down_fwd, _down_bwd)


def down_conv(feats: jax.Array, weight: jax.Array, down_rules: jax.Array,
              compute_dtype=None, win=None) -> jax.Array:
    """Strided k=2 s=2 conv: feats (V_fine, Cin), weight (8, Cin, Cout),
    down_rules (8, V_coarse) -> (V_coarse, Cout).

    Matches `spconv.SparseConv3d(kernel_size=2, stride=2, bias=False)`.
    """
    return subm_conv(feats, weight, down_rules, compute_dtype, win)


def _inverse_fwd(feats, weight, parent_idx, child_tap, cd):
    """Scatter-free inverse conv forward: place each fine voxel's parent
    features into its tap's Cin-block of a (V_fine, 8*Cin) matrix (a fused
    one-hot broadcast-multiply) and run ONE (V, 8*Cin) x (8*Cin, Cout)
    matmul.  Identical math to per-tap matmuls + tap select, but the MXU
    sees a single K=8*Cin contraction and autodiff never emits the
    (V_fine, 8, Cout) tap-select scatter (measured ~40 ms/step across the
    U-Net decoder at bench scale)."""
    k, cin, cout = weight.shape
    pf = _gather_padded(feats, parent_idx)  # (V_fine, Cin); invalid -> 0
    oh = jax.nn.one_hot(jnp.clip(child_tap, 0, k - 1), k, dtype=cd)
    aug = (oh[:, :, None] * pf[:, None, :].astype(cd)).reshape(-1, k * cin)
    out = jnp.dot(aug, weight.astype(cd).reshape(k * cin, cout),
                  preferred_element_type=jnp.float32)
    return out, aug


def inverse_conv(feats: jax.Array, weight: jax.Array, parent_idx: jax.Array,
                 child_tap: jax.Array, down_rules: jax.Array | None = None,
                 compute_dtype=None, win=None) -> jax.Array:
    """Inverse (up) k=2 conv: feats (V_coarse, Cin), weight (8, Cin, Cout),
    parent_idx (V_fine,), child_tap (V_fine,) -> (V_fine, Cout).

    Matches `spconv.SparseInverseConv3d(kernel_size=2)` paired with the k2s2
    conv by indice_key.  Each fine voxel has exactly one coarse parent, so
    the upsample is a gather + a one-hot block matmul (`_inverse_fwd`).

    With ``down_rules`` (the paired (8, V_coarse) rulebook) the backward is
    fully scatter-free: grad wrt the coarse feats is exactly the paired DOWN
    conv of the fine cotangent with per-tap transposed weights (each coarse
    voxel sums its <= 8 children's gradients — a gather), and the weight
    grad is one (8*Cin, V) x (V, Cout) matmul.
    """
    cd = compute_dtype or feats.dtype
    if down_rules is not None:
        return _inv_vjp(feats.astype(cd), weight, parent_idx, child_tap,
                        down_rules, win).astype(feats.dtype)
    out, _ = _inverse_fwd(feats, weight, parent_idx, child_tap, cd)
    return out.astype(feats.dtype)


@jax.custom_vjp
def _inv_vjp(feats, weight, parent_idx, child_tap, down_rules, win):
    out, _ = _inverse_fwd(feats, weight, parent_idx, child_tap, feats.dtype)
    return out.astype(feats.dtype)


def _inv_fwd(feats, weight, parent_idx, child_tap, down_rules, win):
    return _inv_vjp(feats, weight, parent_idx, child_tap, down_rules,
                    win), (feats, weight, parent_idx, child_tap, down_rules,
                           win)


def _inv_bwd(res, g):
    feats, weight, parent_idx, child_tap, down_rules, win = res
    k, cin, cout = weight.shape
    # dfeats: the paired down conv of the cotangent (gather, no scatter)
    w_t = jnp.swapaxes(weight, 1, 2)
    gc = g.astype(feats.dtype)
    if _kernel_ok(down_rules.shape[1], g.shape[0], cin):
        from .conv_kernel import _DOWN_GROUPS, down_plan
        b, w, n_win, cap = down_plan(down_rules.shape[1])
        g_feats = _windowed_exact(gc, w_t, down_rules, _DOWN_GROUPS, 2,
                                  corr_cap=cap, b=b, w=w, n_win=n_win,
                                  win=win)
    else:
        g_feats = _conv_xla(gc, w_t, down_rules, feats.dtype)
    # dW: one big matmul against the recomputed one-hot block matrix
    _, aug = _inverse_fwd(feats, weight, parent_idx, child_tap, feats.dtype)
    g_weight = jnp.dot(aug.T, g.astype(aug.dtype),
                       preferred_element_type=jnp.float32)
    g_weight = g_weight.reshape(k, cin, cout).astype(weight.dtype)
    return g_feats.astype(feats.dtype), g_weight, None, None, None, None


_inv_vjp.defvjp(_inv_fwd, _inv_bwd)


def linear(feats: jax.Array, weight: jax.Array, bias: jax.Array | None = None,
           compute_dtype=None) -> jax.Array:
    """Plain (V, Cin) x (Cin, Cout) matmul — the reference's
    `Custom1x1Subm3d` 1x1 conv (`blocks.py:31-41`) and nn.Linear."""
    cd = compute_dtype or feats.dtype
    out = jnp.dot(feats.astype(cd), weight.astype(cd),
                  preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(feats.dtype)
