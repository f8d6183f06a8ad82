#!/usr/bin/env python3
"""Stage-level latency breakdown of the inference pipeline at bench scale."""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(f, *args, iters=10, sync=None):
    out = f(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / iters * 1000.0, out


def main():
    import __graft_entry__ as ge
    from softgroup_tpu.model.softgroup import (Capacities, forward_grouping,
                                               clusters_voxelization)

    caps = Capacities(
        points=262144,
        voxels=(196608, 98304, 32768, 8192, 2048, 1024, 512),
        grouping_points=393216, proposals=256, proposal_entries=262144,
        instances=128, inst_voxels=(65536, 16384), grouping_cells=16384)
    net, variables, cfg, caps, batch = ge._build(
        channels=32, num_blocks=7, n_points=250000, caps=caps, scene='room')

    bb = jax.jit(lambda v, b: net.apply(
        v, net.apply(v, b, cfg, method=net._input_voxels),
        b.pyramid, False, method=net.backbone))
    t_bb, (sem, off, outf) = timed(bb, variables, batch)
    print(f'backbone      {t_bb:7.1f} ms')

    grp = jax.jit(lambda s, o, b: forward_grouping(
        s, o, b.batch_idxs, b.coords_float, b.pyramid.point_valid, cfg, caps))
    t_g, props = timed(grp, sem, off, batch)
    print(f'grouping      {t_g:7.1f} ms')

    cv = jax.jit(lambda p, f, b: clusters_voxelization(
        p, f, b.coords_float, float(cfg.instance_voxel_cfg.scale),
        int(cfg.instance_voxel_cfg.spatial_shape), caps))
    t_cv, (vox_feats, levels, entry_p2v) = timed(cv, props, outf, batch)
    print(f'clusters_vox  {t_cv:7.1f} ms')

    ih = jax.jit(lambda v, vf, ep, es, ev: net.apply(
        v, vf, levels, ep, es, ev, caps.proposals, False,
        method=net.instance_head))
    t_ih, _ = timed(ih, variables, vox_feats, entry_p2v, props.entry_seg,
                    props.entry_valid)
    print(f'instance_head {t_ih:7.1f} ms')
    print(f'total         {t_bb + t_g + t_cv + t_ih:7.1f} ms')


if __name__ == '__main__':
    main()
