#!/usr/bin/env python3
"""Train-step latency at ScanNet bench scale on one TPU chip.

The reference trains ScanNet in ~10 h / 128 epochs on 4 GPUs
(`README.md:21`; 4804 samples/epoch, batch 4/GPU) — ~937 ms per 4-scene
step per GPU, i.e. ~234 ms/scene/GPU throughput.  This measures our full
jitted train step (forward + losses + backward + optimizer) on one chip.
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

    import __graft_entry__ as ge
    from softgroup_tpu.model.softgroup import Capacities
    from softgroup_tpu.parallel.mesh import TrainState, make_train_step

    caps = Capacities(
        points=262144,
        voxels=(196608, 98304, 32768, 8192, 2048, 1024, 512),
        grouping_points=393216, proposals=256, proposal_entries=262144,
        instances=128, inst_voxels=(65536, 16384), grouping_cells=16384)
    net, variables, cfg, caps, batch = ge._build(
        channels=32, num_blocks=7, n_points=250000, caps=caps, scene='room')

    tx = optax.adam(1e-3)
    step = make_train_step(net, cfg, caps, tx, mesh=None)
    params = variables['params']
    state = TrainState(params=params,
                       batch_stats=variables.get('batch_stats', {}),
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    rng = jax.random.PRNGKey(0)

    state, logs = step(state, batch, rng)
    np.asarray(logs['loss'])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = step(state, batch, rng)
    np.asarray(logs['loss'])
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f'train step: {dt:.1f} ms/scene  '
          f'(reference throughput ~234 ms/scene/GPU)')

    # flagship ScanNet recipe: backbone frozen (fixed_modules), only the
    # refinement stage trains — frozen modules are excluded from
    # differentiation so their backward is DCE'd.  The net itself carries
    # fixed_modules so the frozen BNs run in eval mode (no batch-stat
    # updates), matching tools/train.py's production construction.
    from softgroup_tpu.model.softgroup import SoftGroupNet
    frozen = ('input_conv', 'unet', 'output_norm', 'semantic_linear',
              'offset_linear')
    net = SoftGroupNet(channels=net.channels, num_blocks=net.num_blocks,
                       semantic_classes=net.semantic_classes,
                       instance_classes=net.instance_classes,
                       fixed_modules=frozen)
    step_f = make_train_step(net, cfg, caps, tx, mesh=None,
                             frozen_modules=frozen)
    params = state.params
    state_f = TrainState(params=params,
                         batch_stats=state.batch_stats,
                         opt_state=tx.init(params),
                         step=jnp.zeros((), jnp.int32))
    state_f, logs = step_f(state_f, batch, rng)
    np.asarray(logs['loss'])
    t0 = time.perf_counter()
    for _ in range(iters):
        state_f, logs = step_f(state_f, batch, rng)
    np.asarray(logs['loss'])
    dt_f = (time.perf_counter() - t0) / iters * 1000.0
    print(f'train step (frozen backbone): {dt_f:.1f} ms/scene')


if __name__ == '__main__':
    main()
