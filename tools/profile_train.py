#!/usr/bin/env python3
"""Capture a jax.profiler trace of the train step (3 steps) to /tmp/jaxtrace
and print the top device ops by self time (parsed from the xplane proto)."""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture():
    import jax
    import jax.numpy as jnp
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
        channels=32, num_blocks=7, n_points=250000, caps=caps)
    tx = optax.adam(1e-3)
    step = make_train_step(net, cfg, caps, tx, mesh=None)
    state = TrainState(params=variables['params'],
                       batch_stats=variables.get('batch_stats', {}),
                       opt_state=tx.init(variables['params']),
                       step=jnp.zeros((), jnp.int32))
    rng = jax.random.PRNGKey(0)
    state, logs = step(state, batch, rng)
    np.asarray(logs['loss'])
    print('warmed up; tracing...', flush=True)
    jax.profiler.start_trace('/tmp/jaxtrace')
    for _ in range(3):
        state, logs = step(state, batch, rng)
    np.asarray(logs['loss'])
    jax.profiler.stop_trace()
    print('trace done', flush=True)


def report(top=25, trace_dir='/tmp/jaxtrace'):
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True))
    if not paths:
        print('no xplane.pb found')
        return
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], 'rb') as f:
        xspace.ParseFromString(f.read())
    for plane in xspace.planes:
        if 'TPU' not in plane.name and 'tpu' not in plane.name.lower():
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            tot = defaultdict(float)
            span = 0.0
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                tot[name] += ev.duration_ps / 1e9  # ms
                span += ev.duration_ps / 1e9
            if span < 50:
                continue
            print(f'--- plane "{plane.name}" line "{line.name}" '
                  f'total {span:.1f} ms ---')
            items = sorted(tot.items(), key=lambda kv: -kv[1])
            for name, ms in items[:top]:
                print(f'  {ms:9.2f} ms  {name[:105]}')


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'report':
        report()
    else:
        capture()
        report()
