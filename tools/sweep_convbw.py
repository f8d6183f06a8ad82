#!/usr/bin/env python3
"""Sweep (block_b, window_w) for the Pallas windowed subm conv per U-Net
level: wall time + entries dropped by window overflow (approximation cost).

The one-hot matmul cost per output row is 27 * W * Cout, so a tighter
window is a direct FLOP cut — bounded by the worst per-block input span of
real rulebooks (measured here on synthetic ScanNet-scale scenes).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from softgroup_tpu.data.synthetic import collate_scenes, make_scene
from softgroup_tpu.ops.conv_kernel import (_SUBM_GROUPS, subm_conv_windowed,
                                           window_rules)
from softgroup_tpu.ops.rulebook import build_downsample_np, build_subm_rules_np
from softgroup_tpu.ops.voxelize import voxelize_np


def timed(f, *args, iters=30):
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
    level_coords = [vox_coords]
    for _ in range(3):
        oc, _, _, _ = build_downsample_np(level_coords[-1])
        level_coords.append(oc)

    caps = {0: 196608, 1: 98304, 2: 32768, 3: 8192}
    for lvl, c in [(0, 32), (1, 64), (2, 96)]:
        vc = level_coords[lvl]
        d = vc[:, 1:].max(0) + 1
        rules_np = build_subm_rules_np(vc, d)
        v_real = len(vc)
        cap = caps[lvl]
        rules = np.full((27, cap), -1, np.int32)
        rules[:, :v_real] = rules_np[:, :cap]
        feats = jnp.asarray(rng.randn(cap, c), jnp.bfloat16)
        weight = jnp.asarray(rng.randn(27, c, c) * 0.05, jnp.float32)
        rules_j = jnp.asarray(rules)
        n_valid = int((rules >= 0).sum())

        print(f'level {lvl}: V_real={v_real} cap={cap} C={c} '
              f'valid taps={n_valid}')
        configs = [(b, w, m) for b, w in
                   [(64, 128), (64, 160), (96, 176), (128, 192), (128, 256),
                    (256, 384), (384, 512)]
                   for m in (1, 2, 4, 8, 16) if cap % (b * m) == 0]
        best = {c: np.inf for c in configs}
        drops = {}
        # 3 interleaved passes: the tunnelled chip drifts ~2x between
        # runs, so only per-config minima across interleaved passes are
        # comparable
        for rep in range(3):
            for b, w, m in configs:
                if rep == 0:
                    _, _, n_over = window_rules(
                        rules_j, np.asarray(_SUBM_GROUPS, np.int32), 3, w,
                        b, cap)
                    drops[(b, w, m)] = int(n_over)
                    if m > 1 and n_over == 0:
                        ref = subm_conv_windowed(feats, weight, rules_j,
                                                 b, w, 1)
                        got = subm_conv_windowed(feats, weight, rules_j,
                                                 b, w, m)
                        bad = int(jnp.sum(jnp.any(
                            jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32)) > 1e-2,
                            axis=1)))
                        if bad:
                            print(f'  B={b} W={w} M={m}: {bad} rows '
                                  f'mismatch vs M=1!')
                try:
                    t, _ = timed(lambda f: subm_conv_windowed(
                        f, weight, rules_j, b, w, m), feats, iters=15)
                except Exception as e:  # noqa: BLE001
                    best[(b, w, m)] = None
                    if rep == 0:
                        print(f'  B={b:4d} W={w:4d} M={m}  FAILED '
                              f'{type(e).__name__}')
                    continue
                best[(b, w, m)] = min(best[(b, w, m)], t)
        for b, w, m in configs:
            if best[(b, w, m)] is None:
                continue
            n_over = drops[(b, w, m)]
            print(f'  B={b:4d} W={w:4d} M={m}  {best[(b, w, m)]:7.3f} ms   '
                  f'dropped={n_over}'
                  f' ({n_over / max(n_valid, 1) * 100:.4f}%)')


if __name__ == '__main__':
    main()
