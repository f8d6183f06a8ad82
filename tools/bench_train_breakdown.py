#!/usr/bin/env python3
"""Train-step latency decomposition at ScanNet bench scale (one chip).

Uses only production code paths: the full train step, a semantic_only train
step (backbone + point losses, forward+backward), and forward-only grouping /
proposal-voxelization pieces.  The residual (full - semantic_only - grouping
- clusters_vox) approximates the instance head + losses forward+backward.
Interleaved passes because the tunnelled chip's clock drifts between runs.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(f, iters=6):
    out = f()
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    jax.tree.map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters * 1000.0, out


def interleaved(named_fns, reps=3, iters=6):
    best = {k: np.inf for k, _ in named_fns}
    for r in range(reps):
        for k, f in named_fns:
            t, _ = timed(f, iters=iters)
            best[k] = min(best[k], t)
            print(f'  pass {r} {k}: {t:.1f} ms', flush=True)
    return best


def main():
    import optax

    import __graft_entry__ as ge
    from softgroup_tpu.model.softgroup import (
        Capacities, SoftGroupNet, clusters_voxelization, forward_grouping)
    from softgroup_tpu.parallel.mesh import TrainState, make_train_step

    caps = Capacities(
        points=262144,
        voxels=(196608, 98304, 32768, 8192, 2048, 1024, 512),
        grouping_points=393216, proposals=256, proposal_entries=262144,
        instances=128, inst_voxels=(65536, 16384), grouping_cells=16384)
    net, variables, cfg, caps, batch = ge._build(
        channels=32, num_blocks=7, n_points=250000, caps=caps)
    rng = jax.random.PRNGKey(0)
    tx = optax.adam(1e-3)

    def make_runner(a_net, a_vars):
        step = make_train_step(a_net, cfg, caps, tx, mesh=None)
        # the step donates its state; copy so a_vars stays usable for the
        # forward-only pieces below
        p = jax.tree.map(jnp.copy, a_vars['params'])
        st = TrainState(params=p,
                        batch_stats=jax.tree.map(
                            jnp.copy, a_vars.get('batch_stats', {})),
                        opt_state=tx.init(p),
                        step=jnp.zeros((), jnp.int32))
        holder = {'s': step(st, batch, rng)[0]}

        def run():
            holder['s'], logs = step(holder['s'], batch, rng)
            return logs
        return run

    run_full = make_runner(net, variables)

    sem_net = SoftGroupNet(channels=net.channels, num_blocks=net.num_blocks,
                           semantic_classes=net.semantic_classes,
                           instance_classes=net.instance_classes,
                           semantic_only=True)
    sem_vars = jax.jit(lambda k, b: sem_net.init(
        k, b, cfg, caps, rng, method=sem_net.loss_forward))(
            jax.random.PRNGKey(0), batch)
    run_sem = make_runner(sem_net, sem_vars)

    # forward pieces for the non-differentiated middle stages
    fwd = jax.jit(lambda v, b: net.apply(v, b, cfg, caps,
                                         method=net.test_forward))
    out = fwd(variables, batch)
    sem_scores = out['semantic_scores'] if 'semantic_scores' in out else None
    bb = jax.jit(lambda v, b: net.apply(
        v, net.apply(v, b, cfg, method=net._input_voxels),
        b.pyramid, False, method=net.backbone))
    sem_s, off_s, outf = bb(variables, batch)
    del sem_scores

    grp = jax.jit(lambda s, o: forward_grouping(
        s, o, batch.batch_idxs, batch.coords_float,
        batch.pyramid.point_valid, cfg, caps))
    props = grp(sem_s, off_s)

    cv = jax.jit(lambda f: clusters_voxelization(
        props, f, batch.coords_float, float(cfg.instance_voxel_cfg.scale),
        int(cfg.instance_voxel_cfg.spatial_shape), caps,
        rand_quantize=True, rng=rng))
    cv(outf)

    best = interleaved([
        ('FULL train step', run_full),
        ('semantic_only step (f+b)', run_sem),
        ('grouping (fwd)', lambda: grp(sem_s, off_s)),
        ('clusters_vox (fwd)', lambda: cv(outf)),
    ])
    print()
    for k, v in best.items():
        print(f'{k:28s} {v:7.1f} ms')
    resid = best['FULL train step'] - best['semantic_only step (f+b)'] \
        - best['grouping (fwd)'] - best['clusters_vox (fwd)']
    print(f'{"instance head+loss (resid)":28s} {resid:7.1f} ms')


if __name__ == '__main__':
    main()
