#!/usr/bin/env python3
"""Report actual occupancy vs static capacity at bench scale.

Every capacity in `Capacities` pads a padded-entry computation; the gap
between occupancy and cap is pure wasted latency.  Run this to find which
caps can shrink (and which are close to overflowing).
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
        channels=32, num_blocks=7, n_points=250000, caps=caps)

    n_pts = int(np.asarray(batch.pyramid.point_valid).sum())
    print(f'points            {n_pts:>9d} / {caps.points:>9d}'
          f'  ({n_pts / caps.points:5.1%})')
    for i, lvl in enumerate(batch.pyramid.levels):
        n = int(np.asarray(lvl.vox_valid).sum())
        c = caps.voxels[i]
        print(f'voxels[{i}]         {n:>9d} / {c:>9d}  ({n / c:5.1%})')

    bb = jax.jit(lambda v, b: net.apply(
        v, net.apply(v, b, cfg, method=net._input_voxels),
        b.pyramid, False, method=net.backbone))
    sem, off, outf = bb(variables, batch)

    grp = jax.jit(lambda s, o, b: forward_grouping(
        s, o, b.batch_idxs, b.coords_float, b.pyramid.point_valid, cfg, caps))
    props = grp(sem, off, batch)
    n_ent = int(np.asarray(props.entry_valid).sum())
    n_prop = int(np.asarray(props.n_proposals))
    print(f'proposal_entries  {n_ent:>9d} / {caps.proposal_entries:>9d}'
          f'  ({n_ent / caps.proposal_entries:5.1%})')
    print(f'proposals         {n_prop:>9d} / {caps.proposals:>9d}'
          f'  ({n_prop / caps.proposals:5.1%})')

    cv = jax.jit(lambda p, f, b: clusters_voxelization(
        p, f, b.coords_float, float(cfg.instance_voxel_cfg.scale),
        int(cfg.instance_voxel_cfg.spatial_shape), caps))
    vox_feats, levels, entry_p2v = cv(props, outf, batch)
    if hasattr(levels, 'levels'):
        levels = levels.levels
    for i, lvl in enumerate(levels):
        n = int(np.asarray(lvl.vox_valid).sum())
        c = caps.inst_voxels[i]
        print(f'inst_voxels[{i}]    {n:>9d} / {c:>9d}  ({n / c:5.1%})')


if __name__ == '__main__':
    main()
