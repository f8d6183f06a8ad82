#!/usr/bin/env python3
"""Correctness + speed check of the Pallas windowed conv vs the XLA path,
on realistic (sorted-key) rulebooks."""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from softgroup_tpu.data.synthetic import collate_scenes, make_scene
from softgroup_tpu.ops.conv_kernel import (subm_conv_windowed, window_rules,
                                           _SUBM_GROUPS)
from softgroup_tpu.ops.rulebook import build_downsample_np, build_subm_rules_np
from softgroup_tpu.ops.sparse_conv import subm_conv
from softgroup_tpu.ops.voxelize import voxelize_np


def timed(f, *args, iters=20):
    out = f(*args)
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    np.asarray(outs[-1][0, 0])
    return (time.perf_counter() - t0) / iters * 1000.0, out


def main():
    rng = np.random.RandomState(0)
    scenes = [make_scene(rng, n_points=250000, n_instances=12)]
    data = collate_scenes(scenes, scale=50.0)
    vox_coords, _, _ = voxelize_np(data['coords'])
    dims = vox_coords[:, 1:].max(0) + 1
    level_coords = [vox_coords]
    for _ in range(6):
        oc, _, _, _ = build_downsample_np(level_coords[-1])
        level_coords.append(oc)

    for lvl, c in [(0, 32), (1, 64), (2, 96), (3, 128)]:
        vc = level_coords[lvl]
        d = vc[:, 1:].max(0) + 1
        rules_np = build_subm_rules_np(vc, d)
        v_real = len(vc)
        cap = 1 << int(np.ceil(np.log2(v_real)))
        cap = max(cap, int(np.ceil(v_real / 256)) * 256)
        cap = ((v_real + 255) // 256) * 256 + 256
        rules = np.full((27, cap), -1, np.int32)
        rules[:, :v_real] = rules_np
        feats = jnp.asarray(rng.randn(cap, c), jnp.bfloat16)
        weight = jnp.asarray(rng.randn(27, c, c) * 0.05, jnp.float32)
        rules_j = jnp.asarray(rules)

        # window check
        _, _, n_over = window_rules(
            rules_j, np.asarray(_SUBM_GROUPS, np.int32), 3, 512, 256, cap)
        print(f'lvl{lvl}: V={v_real} cap={cap} overflow={int(n_over)}')

        ref_fn = jax.jit(lambda f, w, r: subm_conv(f, w, r, jnp.bfloat16))
        t_ref, ref = timed(ref_fn, feats, weight, rules_j)
        t_ker, out = timed(lambda f, w, r: subm_conv_windowed(f, w, r),
                           feats, weight, rules_j)
        ref = np.asarray(ref, np.float32)
        out = np.asarray(out, np.float32)
        err = np.abs(ref - out).max()
        rel = err / max(np.abs(ref).max(), 1e-6)
        print(f'      xla {t_ref:7.2f} ms   pallas {t_ker:7.2f} ms   '
              f'speedup {t_ref / t_ker:5.2f}x   max_rel_err {rel:.2e}')


if __name__ == "__main__" and len(sys.argv) == 1:
    main()

def sweep():
    rng = np.random.RandomState(0)
    scenes = [make_scene(rng, n_points=250000, n_instances=12)]
    data = collate_scenes(scenes, scale=50.0)
    vox_coords, _, _ = voxelize_np(data['coords'])
    for lvl, c in [(0, 32), (1, 64)]:
        vc = vox_coords
        for _ in range(lvl):
            vc, _, _, _ = build_downsample_np(vc)
        d = vc[:, 1:].max(0) + 1
        rules_np = build_subm_rules_np(vc, d)
        v_real = len(vc)
        for B, W in [(128, 256), (256, 512), (512, 768), (512, 1024)]:
            cap = ((v_real + B - 1) // B) * B + B
            rules = np.full((27, cap), -1, np.int32)
            rules[:, :v_real] = rules_np
            feats = jnp.asarray(rng.randn(cap, c), jnp.bfloat16)
            weight = jnp.asarray(rng.randn(27, c, c) * 0.05, jnp.float32)
            rules_j = jnp.asarray(rules)
            _, _, n_over = window_rules(
                rules_j, np.asarray(_SUBM_GROUPS, np.int32), 3, W, B, cap)
            try:
                t, _ = timed(lambda f, w, r: subm_conv_windowed(
                    f, w, r, block_b=B, window_w=W), feats, weight, rules_j)
                print(f'lvl{lvl} C={c} B={B} W={W}: {t:6.2f} ms '
                      f'(overflow {int(n_over)})')
            except Exception as e:
                print(f'lvl{lvl} C={c} B={B} W={W}: FAIL {str(e)[:80]}')


if __name__ == '__main__' and len(sys.argv) > 1 and sys.argv[1] == 'sweep':
    sweep()
