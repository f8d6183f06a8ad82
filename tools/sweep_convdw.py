#!/usr/bin/env python3
"""Backward-pass conv attribution + (block_b, window_w) sweep for the weight
gradient kernel per U-Net level: the forward, the feats gradient (flipped-
weights conv on the same rulebook) and the weight gradient each get a
windowed Pallas kernel — this measures which one dominates the train step's
backbone cost and what dw tiling is best."""

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
                                           windowed_conv_dw)
from softgroup_tpu.ops.rulebook import build_downsample_np, build_subm_rules_np
from softgroup_tpu.ops.voxelize import voxelize_np


def timed(f, iters=15):
    out = f()
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    jax.tree.map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    rng = np.random.RandomState(0)
    scenes = [make_scene(rng, n_points=250000, n_instances=12)]
    data = collate_scenes(scenes, scale=50.0)
    vox_coords, _, _ = voxelize_np(data['coords'])
    level_coords = [vox_coords]
    for _ in range(3):
        oc, _, _, _ = build_downsample_np(level_coords[-1])
        level_coords.append(oc)

    caps = {0: 196608, 1: 98304, 2: 32768}
    for lvl, c in [(0, 32), (1, 64), (2, 96)]:
        vc = level_coords[lvl]
        d = vc[:, 1:].max(0) + 1
        rules_np = build_subm_rules_np(vc, d)
        cap = caps[lvl]
        rules = np.full((27, cap), -1, np.int32)
        rules[:, :len(vc)] = rules_np[:, :cap]
        feats = jnp.asarray(rng.randn(cap, c), jnp.bfloat16)
        weight = jnp.asarray(rng.randn(27, c, c) * 0.05, jnp.float32)
        g_out = jnp.asarray(rng.randn(cap, c), jnp.bfloat16)
        rules_j = jnp.asarray(rules)
        w_t = jnp.flip(jnp.swapaxes(weight, 1, 2), axis=0)

        fb, fw = (256, 384) if cap >= 65536 else (128, 256)
        named = [
            (f'fwd B{fb} W{fw}',
             lambda fb=fb, fw=fw: subm_conv_windowed(feats, weight, rules_j,
                                                     fb, fw)),
            (f'dfeats B{fb} W{fw}',
             lambda fb=fb, fw=fw: subm_conv_windowed(g_out, w_t, rules_j,
                                                     fb, fw)),
        ]
        for b, w in [(128, 384), (128, 512), (256, 384), (256, 512),
                     (384, 512)]:
            if cap % b:
                continue
            named.append(
                (f'dw B{b} W{w}',
                 lambda b=b, w=w: windowed_conv_dw(
                     feats, g_out, rules_j, _SUBM_GROUPS, 3, b, w)))

        best = {k: np.inf for k, _ in named}
        for _ in range(3):
            for k, f in named:
                try:
                    best[k] = min(best[k], timed(f))
                except Exception as e:  # noqa: BLE001
                    best[k] = None
                    print(f'  {k} FAILED {type(e).__name__}')
        print(f'level {lvl}: cap={cap} C={c}')
        for k, v in best.items():
            if v is not None:
                print(f'  {k:18s} {v:7.3f} ms')


if __name__ == '__main__':
    main()
