#!/usr/bin/env python3
"""Capture a jax.profiler trace of the inference pipeline (3 runs at bench
scale) and print the top exclusive-time device ops."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture():
    import jax

    import __graft_entry__ as ge
    from softgroup_tpu.model.softgroup import Capacities

    caps = Capacities(
        points=262144,
        voxels=(196608, 98304, 32768, 8192, 2048, 1024, 512),
        grouping_points=393216, proposals=256, proposal_entries=262144,
        instances=128, inst_voxels=(65536, 16384), grouping_cells=16384)
    net, variables, cfg, caps, batch = ge._build(
        channels=32, num_blocks=7, n_points=250000, caps=caps, scene='room')
    fn = jax.jit(lambda v, b: net.apply(v, b, cfg, caps,
                                        method=net.test_forward))
    out = fn(variables, batch)
    np.asarray(out['n_proposals'])
    print('warmed up; tracing...', flush=True)
    jax.profiler.start_trace('/tmp/jaxtrace_infer')
    for _ in range(3):
        out = fn(variables, batch)
    np.asarray(out['n_proposals'])
    jax.profiler.stop_trace()
    print('trace done', flush=True)


if __name__ == '__main__':
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_train import report
    if not (len(sys.argv) > 1 and sys.argv[1] == 'report'):
        capture()
    report(trace_dir='/tmp/jaxtrace_infer')
