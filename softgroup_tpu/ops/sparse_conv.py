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
# programs, so the kernel wins at every U-Net width; XLA remains the
# portable fallback (CPU tests) and the autodiff implementation.
_KERNEL_MAX_CHANNELS = 64
_KERNEL_B = 128
_KERNEL_W = 384


def _kernel_ok(v_out: int, v_in: int, cout: int) -> bool:
    return (jax.default_backend() == 'tpu'
            and cout <= _KERNEL_MAX_CHANNELS
            and v_out % _KERNEL_B == 0
            and v_in >= _KERNEL_W)


def _gather_padded(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows of ``feats`` with -1 mapping to a zero row."""
    v = feats.shape[0]
    zero_row = jnp.zeros((1,) + feats.shape[1:], feats.dtype)
    padded = jnp.concatenate([feats, zero_row], axis=0)
    return padded[jnp.where(idx < 0, v, idx)]


def subm_conv(feats: jax.Array, weight: jax.Array, rules: jax.Array,
              compute_dtype=None) -> jax.Array:
    """Submanifold k=3 conv: feats (V, Cin), weight (27, Cin, Cout),
    rules (27, V) -> (V, Cout).

    Matches `spconv.SubMConv3d(kernel_size=3, padding=1, bias=False)`.
    The 27 gathers+matmuls are expressed as one batched einsum so XLA can
    schedule them as a single large contraction.
    """
    cd = compute_dtype or feats.dtype
    v_out = rules.shape[1]
    c_out = weight.shape[2]
    if _kernel_ok(v_out, feats.shape[0], c_out) \
            and rules.shape[0] in (27, 8):
        return _conv_windowed_vjp(feats.astype(cd), weight,
                                  rules).astype(feats.dtype)
    return _conv_xla(feats, weight, rules, cd)


def _conv_xla(feats, weight, rules, cd):
    """Portable gather-GEMM path (and the autodiff implementation)."""
    v_out = rules.shape[1]
    c_out = weight.shape[2]

    def tap(acc, kw):
        w_k, r_k = kw
        g = _gather_padded(feats, r_k).astype(cd)  # (V, Cin)
        acc = acc + jnp.dot(g, w_k.astype(cd),
                            preferred_element_type=jnp.float32)
        return acc, None

    init = jnp.zeros((v_out, c_out), jnp.float32)
    out, _ = jax.lax.scan(tap, init, (weight, rules))
    return out.astype(feats.dtype)


@jax.custom_vjp
def _conv_windowed_vjp(feats, weight, rules):
    """Pallas windowed kernel forward with a differentiable backward.

    Backward: grad wrt feats reuses the kernel for 27-tap submanifold convs
    (offset symmetry: the transpose of tap k is tap K-1-k on the same
    rulebook, valid because subm in/out voxel sets coincide); everything
    else falls back to the XLA path's VJP.
    """
    from .conv_kernel import down_conv_windowed, subm_conv_windowed
    if rules.shape[0] == 27:
        return subm_conv_windowed(feats, weight, rules, _KERNEL_B, _KERNEL_W)
    return down_conv_windowed(feats, weight, rules, _KERNEL_B, _KERNEL_W)


def _conv_windowed_fwd(feats, weight, rules):
    return _conv_windowed_vjp(feats, weight, rules), (feats, weight, rules)


def _conv_windowed_bwd(res, g):
    feats, weight, rules = res
    k = weight.shape[0]
    subm = k == 27 and feats.shape[0] == rules.shape[1]
    if subm and _kernel_ok(feats.shape[0], feats.shape[0], weight.shape[1]):
        from .conv_kernel import subm_conv_windowed
        w_t = jnp.flip(jnp.swapaxes(weight, 1, 2), axis=0)
        g_feats = subm_conv_windowed(g.astype(feats.dtype), w_t, rules,
                                     _KERNEL_B, _KERNEL_W)
    else:
        g_feats = jax.vjp(
            lambda f: _conv_xla(f, weight, rules, feats.dtype), feats
        )[1](g)[0]
    g_weight = jax.vjp(
        lambda w: _conv_xla(feats, w, rules, feats.dtype), weight)[1](g)[0]
    return g_feats, g_weight, None


_conv_windowed_vjp.defvjp(_conv_windowed_fwd, _conv_windowed_bwd)


def down_conv(feats: jax.Array, weight: jax.Array, down_rules: jax.Array,
              compute_dtype=None) -> jax.Array:
    """Strided k=2 s=2 conv: feats (V_fine, Cin), weight (8, Cin, Cout),
    down_rules (8, V_coarse) -> (V_coarse, Cout).

    Matches `spconv.SparseConv3d(kernel_size=2, stride=2, bias=False)`.
    """
    return subm_conv(feats, weight, down_rules, compute_dtype)


def inverse_conv(feats: jax.Array, weight: jax.Array, parent_idx: jax.Array,
                 child_tap: jax.Array, compute_dtype=None) -> jax.Array:
    """Inverse (up) k=2 conv: feats (V_coarse, Cin), weight (8, Cin, Cout),
    parent_idx (V_fine,), child_tap (V_fine,) -> (V_fine, Cout).

    Matches `spconv.SparseInverseConv3d(kernel_size=2)` paired with the k2s2
    conv by indice_key.  Each fine voxel has exactly one coarse parent, so the
    upsample is a gather + one weight-select matmul: we compute all 8 tap
    matmuls on the gathered parents and pick per-voxel — still one big MXU
    contraction, no scatter.
    """
    cd = compute_dtype or feats.dtype
    pf = _gather_padded(feats, parent_idx)  # (V_fine, Cin); invalid -> 0
    # (V_fine, 8, Cout) then select tap
    allk = jax.lax.dot_general(
        pf.astype(cd), weight.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    tap = jnp.clip(child_tap, 0, weight.shape[0] - 1)
    out = jnp.take_along_axis(allk, tap[:, None, None], axis=1)[:, 0, :]
    return out.astype(feats.dtype)


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
