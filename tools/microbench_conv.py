#!/usr/bin/env python3
"""Micro-benchmark: sparse-conv formulations at ScanNet bench scale.

Compares the per-tap scan gather-GEMM (current subm_conv) against an
implicit-GEMM formulation (one (V, K) row gather -> (V, K*Cin) reshape ->
single matmul), at the channel widths of the backbone U-Net.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def scan_conv(feats, weight, rules):
    v_out = rules.shape[1]
    c_out = weight.shape[2]
    v = feats.shape[0]
    zero_row = jnp.zeros((1,) + feats.shape[1:], feats.dtype)
    padded = jnp.concatenate([feats, zero_row], axis=0)

    def tap(acc, kw):
        w_k, r_k = kw
        g = padded[jnp.where(r_k < 0, v, r_k)].astype(jnp.bfloat16)
        return acc + jnp.dot(g, w_k.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32), None

    init = jnp.zeros((v_out, c_out), jnp.float32)
    out, _ = jax.lax.scan(tap, init, (weight, rules))
    return out.astype(feats.dtype)


def ig_conv(feats, weight, rules):
    """Implicit GEMM: one gather + one matmul."""
    v = feats.shape[0]
    k, v_out = rules.shape
    cin = feats.shape[1]
    cout = weight.shape[2]
    zero_row = jnp.zeros((1, cin), feats.dtype)
    padded = jnp.concatenate([feats, zero_row], axis=0).astype(jnp.bfloat16)
    idx = jnp.where(rules < 0, v, rules).T          # (V, K)
    g = padded[idx].reshape(v_out, k * cin)          # (V, K*Cin)
    out = jnp.dot(g, weight.astype(jnp.bfloat16).reshape(k * cin, cout),
                  preferred_element_type=jnp.float32)
    return out.astype(feats.dtype)


def bench(fn, feats, weight, rules, iters=20):
    f = jax.jit(fn)
    out = f(feats, weight, rules)
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    outs = [f(feats, weight, rules) for _ in range(iters)]
    np.asarray(outs[-1][0, 0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    rng = np.random.RandomState(0)
    # (V, Cin, Cout) per U-Net level (bench caps, channels=32, 7 levels)
    cases = [
        (196608, 32, 32),
        (98304, 64, 64),
        (49152, 96, 96),
        (24576, 128, 128),
        (12288, 160, 160),
        (6144, 192, 192),
        (3072, 224, 224),
    ]
    for v, cin, cout in cases:
        feats = jnp.asarray(rng.randn(v, cin), jnp.bfloat16)
        weight = jnp.asarray(rng.randn(27, cin, cout) * 0.05, jnp.float32)
        # realistic rulebook: ~70% hit rate, random neighbours
        rules = rng.randint(0, v, size=(27, v)).astype(np.int32)
        miss = rng.rand(27, v) > 0.7
        rules[miss] = -1
        rules[13] = np.arange(v)
        rules = jnp.asarray(rules)
        t_scan = bench(scan_conv, feats, weight, rules)
        t_ig = bench(ig_conv, feats, weight, rules)
        print(f'V={v:7d} C={cin:3d}->{cout:3d}  scan {t_scan:7.2f} ms   '
              f'ig {t_ig:7.2f} ms   speedup {t_scan / t_ig:5.2f}x')


if __name__ == '__main__':
    main()
