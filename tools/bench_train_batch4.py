#!/usr/bin/env python3
"""Flagship-config training throughput: one step = 4 collated ~250k-point
scenes at the softgroup_scannet caps (1M points), matching the reference's
per-GPU batch_size=4 (`configs/softgroup/softgroup_scannet.yaml`).

The reference trains ScanNet (~1200 scans x 4 repeat / epoch) in ~10 h for
128 epochs on 4 GPUs — ~17 scenes/s for the rig, ~4.3 scenes/s per GPU.
Prints scenes/s and the implied epoch time on ONE chip for comparison.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import optax

    from softgroup_tpu.data.padding import build_scene_batch
    from softgroup_tpu.data.synthetic import collate_scenes, make_room_scene
    from softgroup_tpu.model.softgroup import Capacities, SoftGroupNet
    from softgroup_tpu.parallel.mesh import TrainState, make_train_step
    from softgroup_tpu.util.config import load_config

    cfg = load_config('configs/softgroup/softgroup_scannet.yaml')
    c = cfg.tpu.caps
    # surface-sampled room scenes (the realistic occupancy) run ~188k
    # live voxels per 250k-point scan; caps sized for the 4-scene batch,
    # everything else matches the flagship config
    caps = Capacities(points=c.points,
                      voxels=(851968, 425984, 131072, 65536, 16384, 8192,
                              4096),
                      grouping_points=c.grouping_points,
                      proposals=c.proposals,
                      proposal_entries=c.proposal_entries,
                      instances=c.instances,
                      inst_voxels=tuple(c.inst_voxels),
                      grouping_cells=c.grouping_cells)
    rng_np = np.random.RandomState(0)
    scenes = [make_room_scene(rng_np, n_points=250000, n_instances=12)
              for _ in range(4)]
    data = collate_scenes(scenes, scale=50.0)
    batch = build_scene_batch(
        data['coords'], data['coords_float'], data['feats'],
        data['semantic_labels'], data['instance_labels'],
        data['pt_offset_labels'], data['instance_pointnum'],
        data['instance_cls'], data['spatial_shape'], caps,
        cfg.tpu.num_levels)

    net = SoftGroupNet(channels=cfg.model.channels,
                       num_blocks=cfg.model.num_blocks,
                       semantic_classes=cfg.model.semantic_classes,
                       instance_classes=cfg.model.instance_classes)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k, b: net.init(
        k, b, cfg.model, caps, rng, method=net.loss_forward))(
            jax.random.PRNGKey(0), batch)

    tx = optax.adam(1e-3)
    frozen = tuple(cfg.model.get('fixed_modules', []))
    for label, fr in (('all params', ()), ('frozen backbone', frozen)):
        step = make_train_step(net, cfg.model, caps, tx, mesh=None,
                               frozen_modules=fr)
        p = jax.tree.map(jnp.copy, variables['params'])
        state = TrainState(params=p,
                           batch_stats=jax.tree.map(
                               jnp.copy, variables['batch_stats']),
                           opt_state=tx.init(p),
                           step=jnp.zeros((), jnp.int32))
        state, logs = step(state, batch, rng)
        np.asarray(logs['loss'])
        import os
        if os.environ.get('SOFTGROUP_B4_TRACE'):
            jax.profiler.start_trace(os.environ['SOFTGROUP_B4_TRACE'])
            state, logs = step(state, batch, rng)
            np.asarray(logs['loss'])
            jax.profiler.stop_trace()
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            state, logs = step(state, batch, rng)
        np.asarray(logs['loss'])
        dt = (time.perf_counter() - t0) / iters
        sps = 4.0 / dt
        epoch_s = 1201 * 4 / sps  # ScanNet train scans x repeat 4
        print(f'batch4 step ({label}): {dt * 1000:.1f} ms '
              f'= {sps:.1f} scenes/s; ScanNet epoch ~{epoch_s / 60:.1f} min '
              f'-> 128 epochs ~{epoch_s * 128 / 3600:.1f} h on ONE chip')


if __name__ == '__main__':
    main()
