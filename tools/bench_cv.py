#!/usr/bin/env python3
"""Decompose train-time clusters_voxelization cost at bench scale: the
gather+boxes+grid front half, voxelize_linear, segment_mean, and the two
geometry variants (explicit rulebook pyramid vs keyed levels)."""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(f, iters=10):
    out = f()
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    jax.tree.map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters * 1000.0


def interleaved(named, reps=3, iters=10):
    best = {k: np.inf for k, _ in named}
    for _ in range(reps):
        for k, f in named:
            best[k] = min(best[k], timed(f, iters))
    return best


def main():
    import __graft_entry__ as ge
    from softgroup_tpu.model.softgroup import (
        Capacities, build_keyed_levels, build_pyramid_from_voxels,
        clusters_voxelization, forward_grouping)
    from softgroup_tpu.ops.segment import segment_mean_fused
    from softgroup_tpu.ops.voxelize import voxelize_linear

    caps = Capacities(
        points=262144,
        voxels=(196608, 98304, 32768, 8192, 2048, 1024, 512),
        grouping_points=393216, proposals=256, proposal_entries=262144,
        instances=128, inst_voxels=(65536, 16384), grouping_cells=16384)
    net, variables, cfg, caps, batch = ge._build(
        channels=32, num_blocks=7, n_points=250000, caps=caps)
    rng = jax.random.PRNGKey(0)

    bb = jax.jit(lambda v, b: net.apply(
        v, net.apply(v, b, cfg, method=net._input_voxels),
        b.pyramid, False, method=net.backbone))
    sem, off, outf = bb(variables, batch)
    grp = jax.jit(lambda s, o: forward_grouping(
        s, o, batch.batch_idxs, batch.coords_float,
        batch.pyramid.point_valid, cfg, caps))
    props = grp(sem, off)
    spatial = int(cfg.instance_voxel_cfg.spatial_shape)
    scale = float(cfg.instance_voxel_cfg.scale)

    cv_train = jax.jit(lambda f: clusters_voxelization(
        props, f, batch.coords_float, scale, spatial, caps,
        rand_quantize=True, rng=rng))
    cv_infer = jax.jit(lambda f: clusters_voxelization(
        props, f, batch.coords_float, scale, spatial, caps))

    # front half: everything before geometry
    @jax.jit
    def front(f):
        p_max = props.prop_valid.shape[0]
        ci = jnp.clip(props.entry_pt, 0, batch.coords_float.shape[0] - 1)
        comb = jnp.concatenate(
            [batch.coords_float, f.astype(jnp.float32)], axis=1)[ci]
        coords, fe = comb[:, :3], comb[:, 3:]
        seg = jnp.where(props.entry_valid, props.entry_seg, p_max)
        from softgroup_tpu.ops.segment import sorted_segment_minmax
        cmin, cmax = sorted_segment_minmax(coords, seg, p_max)
        extent = jnp.max(cmax - cmin, axis=1)
        cs = jnp.minimum(1.0 / jnp.maximum(extent / spatial, 1e-12) - 0.01,
                         scale)
        par = jnp.concatenate([cs[:, None], cmin * cs[:, None]], axis=1)
        pe = par[jnp.clip(seg, 0, p_max - 1)]
        grid = jnp.clip(jnp.floor(coords * pe[:, :1] - pe[:, 1:]), 0,
                        spatial - 1).astype(jnp.int32)
        c4 = jnp.concatenate([seg[:, None].astype(jnp.int32), grid], axis=1)
        return c4, fe

    c4, fe = front(outf)
    dims = jnp.full((3,), spatial, jnp.int32)
    vox = jax.jit(lambda c: voxelize_linear(c, props.entry_valid, dims,
                                            caps.inst_voxels[0]))
    vx, ckey = vox(c4)
    sm = jax.jit(lambda f: segment_mean_fused(f, vx.p2v,
                                              caps.inst_voxels[0]))
    pyr = jax.jit(lambda: build_pyramid_from_voxels(vx, ckey, dims,
                                                    caps.inst_voxels))
    keyed = jax.jit(lambda: build_keyed_levels(vx, ckey, dims, spatial,
                                               caps.inst_voxels))

    best = interleaved([
        ('cv train (full)', lambda: cv_train(outf)),
        ('cv infer (full)', lambda: cv_infer(outf)),
        ('front (gather+boxes+grid)', lambda: front(outf)),
        ('voxelize_linear', lambda: vox(c4)),
        ('segment_mean_fused', lambda: sm(fe)),
        ('build_pyramid (rulebooks)', pyr),
        ('build_keyed_levels', keyed),
    ])
    for k, v in best.items():
        print(f'{k:28s} {v:7.1f} ms')


if __name__ == '__main__':
    main()
