#!/usr/bin/env python3
"""Marginal stage costs via cumulative ablation of ONE jitted program.

Per-stage jits mis-attribute time on the tunnelled chip (dispatch latency +
lost cross-stage fusion).  Here every measurement is the same end-to-end
methodology as bench.py — jit a prefix of test_forward, stream 10 iterations,
sync once — so differences between rows are true marginal device costs.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import __graft_entry__ as ge
    from softgroup_tpu.model.softgroup import (Capacities,
                                               clusters_voxelization,
                                               forward_grouping)

    caps = Capacities(
        points=262144,
        voxels=(196608, 98304, 32768, 8192, 2048, 1024, 512),
        grouping_points=393216, proposals=256, proposal_entries=262144,
        instances=128, inst_voxels=(65536, 16384), grouping_cells=16384)
    net, variables, cfg, caps, batch = ge._build(
        channels=32, num_blocks=7, n_points=250000, caps=caps)

    def prefix(upto):
        def f(v, b):
            sem, off, outf = net.apply(
                v, net.apply(v, b, cfg, method=net._input_voxels),
                b.pyramid, False, method=net.backbone)
            if upto == 'backbone':
                return sem, off, outf
            props = forward_grouping(sem, off, b.batch_idxs, b.coords_float,
                                     b.pyramid.point_valid, cfg, caps)
            if upto == 'grouping':
                return props
            vf, levels, ep2v = clusters_voxelization(
                props, outf, b.coords_float,
                float(cfg.instance_voxel_cfg.scale),
                int(cfg.instance_voxel_cfg.spatial_shape), caps)
            if upto == 'clusters_vox':
                return vf, ep2v
            return net.apply(v, vf, levels, ep2v, props.entry_seg,
                             props.entry_valid, caps.proposals, False,
                             method=net.instance_head)
        return jax.jit(f)

    prev = 0.0
    for stage in ['backbone', 'grouping', 'clusters_vox', 'instance_head']:
        t = timed(prefix(stage), variables, batch)
        print(f'+{stage:14s} {t:7.1f} ms  (marginal {t - prev:+7.1f})')
        prev = t


if __name__ == '__main__':
    main()
