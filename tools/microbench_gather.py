#!/usr/bin/env python3
"""Probe: does Mosaic support an in-VMEM dynamic row gather inside a Pallas
TPU kernel?  Tries `jnp.take(window, idx, axis=0)` and fancy indexing on a
VMEM block; falls back to reporting the error strings."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(kind: str):
    W, B, C = 512, 256, 32

    def kernel(win_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        if kind == 'take':
            out_ref[:] = jnp.take(win_ref[:], idx, axis=0)
        elif kind == 'fancy':
            out_ref[:] = win_ref[idx]
        elif kind == 'onehot':
            oh = (idx[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (B, W), 1)).astype(jnp.bfloat16)
            out_ref[:] = jax.lax.dot(
                oh, win_ref[:], preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)

    rng = np.random.RandomState(0)
    win = jnp.asarray(rng.randn(W, C), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, W, size=(B,)), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = np.asarray(f(win, idx))
        ref = np.asarray(win)[np.asarray(idx)]
        ok = np.allclose(out, ref, atol=1e-2)
        print(f'{kind}: OK, correct={ok}')
    except Exception as e:  # noqa: BLE001
        print(f'{kind}: FAIL — {type(e).__name__}: {str(e)[:300]}')


if __name__ == '__main__':
    for kind in ('take', 'fancy', 'onehot'):
        probe(kind)
