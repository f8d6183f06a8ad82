#!/usr/bin/env python3
"""Quantify the grouping approximation: exact point-level ball query + CC
(reference vanilla SoftGroup, `bfs_cluster.cu/.cpp`) vs the cell-contraction
fast path (SoftGroup++-style centroid granularity), at matched inputs.

Simulates a trained pointwise head on synthetic ROOM scenes (surface-sampled
— the honest occupancy distribution; offsets point at the instance centroid
with noise; semantic scores peak at the gt class), runs `forward_grouping`
with `exact_ball_query` on/off and cell_scale in {1.0, 0.5}, and scores every
proposal set against the gt instances with the real ScanNetEval protocol
(AP / AP_50 / AP_25, proposal conf = 1).  Also reports device wall-clock per
variant.

Output: one table row per variant, printed AS EACH VARIANT FINISHES (the
round-2 version batched all output to the end and looked hung for the whole
multi-minute compile).  Capacities scale with --n-points.  The exact
variant times ONE iteration (its XLA compile grows superlinearly with the
entry cap — the cell variants compile in ~40 s and run in ~100 ms, see the
committed table); pass --json to write the rows as a machine-readable
artifact.

Committed evidence: docs/grouping_fidelity.md + GROUPING_r04.json (run on
the v5e chip).
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def simulated_head(data, n_points, rng, offset_noise=0.03, score_noise=1.0):
    """Gt-derived semantic logits + centroid offsets with realistic noise."""
    sem = data['semantic_labels']
    n_cls = 20
    logits = rng.randn(n_points, n_cls).astype(np.float32) * score_noise
    ok = sem >= 0
    logits[np.arange(len(sem))[ok], sem[ok]] += 6.0
    offsets = data['pt_offset_labels'].astype(np.float32).copy()
    # stuff points (offset label -100-ish sentinel rows) get zero offsets,
    # like an untrained-on-stuff offset head
    offsets[data['instance_labels'] < 0] = 0.0
    offsets += rng.randn(*offsets.shape).astype(np.float32) * offset_noise
    return logits, offsets


def proposals_to_instances(props, n, scan_id):
    from softgroup_tpu.util.rle import rle_encode
    ev = np.asarray(props.entry_valid)
    seg = np.asarray(props.entry_seg)
    pt = np.asarray(props.entry_pt)
    # drop entries that refer to padded points (cell contraction can emit
    # cap-padded point ids with entry_valid set)
    keep = ev & (pt < n)
    seg, pt = seg[keep], pt[keep]
    insts = []
    for s in np.unique(seg):
        mask = np.zeros(n, np.uint8)
        mask[pt[seg == s]] = 1
        insts.append(dict(scan_id=scan_id, label_id=1, conf=1.0,
                          pred_mask=rle_encode(mask)))
    return insts


def scaled_caps(n_points):
    """Capacities proportional to the scene size (the round-2 version
    hardcoded 262k-scale caps for every --n-points, making small presets
    as slow as the big one)."""
    from softgroup_tpu.data.padding import round_capacity
    from softgroup_tpu.model.softgroup import Capacities
    p = round_capacity(n_points)
    return Capacities(
        points=p,
        voxels=(round_capacity(n_points * 3 // 4),),
        grouping_points=round_capacity(n_points * 3 // 2, minimum=8192),
        proposals=256,
        proposal_entries=p,
        instances=128,
        inst_voxels=(65536,),
        grouping_cells=max(16384, round_capacity(n_points // 4)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n-points', type=int, default=120000)
    p.add_argument('--seeds', type=int, default=2)
    p.add_argument('--offset-noise', type=float, default=0.03)
    p.add_argument('--timing-iters', type=int, default=5)
    p.add_argument('--skip-exact', action='store_true')
    p.add_argument('--json', default=None,
                   help='write rows to this path as JSON')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from softgroup_tpu.data.synthetic import collate_scenes, make_room_scene
    from softgroup_tpu.evaluation.instance_eval import ScanNetEval
    from softgroup_tpu.model.softgroup import forward_grouping
    from softgroup_tpu.util.config import Config

    caps = scaled_caps(args.n_points)
    print(f'# n_points={args.n_points} seeds={args.seeds} '
          f'caps: P={caps.points} E={caps.grouping_points} '
          f'cells={caps.grouping_cells} S={caps.proposal_entries}',
          flush=True)

    def cfg_for(exact, cell_scale):
        return Config(dict(grouping_cfg=dict(
            score_thr=0.2, radius=0.04, mean_active=300,
            class_numpoint_mean=[-1.0] * 20, npoint_thr=50,
            ignore_classes=[0, 1], pair_keys=False,
            exact_ball_query=exact, cell_scale=cell_scale),
            test_cfg=dict(min_npoint=100)))

    # (name, cfg, timing iters): the exact variant times one iteration —
    # it runs in seconds/scene where contraction runs in ~0.1 s
    variants = [('exact_ball_query', cfg_for(True, 1.0), 1),
                ('cell_scale_0.5', cfg_for(False, 0.5), args.timing_iters),
                ('cell_scale_1.0', cfg_for(False, 1.0), args.timing_iters)]
    if args.skip_exact:
        variants = variants[1:]

    # ---- build inputs once (shared across variants) -----------------------
    scenes = []
    gts = []
    for seed in range(args.seeds):
        rng = np.random.RandomState(seed)
        scene = make_room_scene(rng, n_points=args.n_points, n_instances=12)
        data = collate_scenes([scene], scale=50.0)
        n = len(data['coords'])
        logits, offsets = simulated_head(data, n, rng,
                                         offset_noise=args.offset_noise)
        pc = caps.points

        def pad(a, fill=0.0):
            out = np.full((pc,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return out

        inputs = (jnp.asarray(pad(logits)), jnp.asarray(pad(offsets)),
                  jnp.zeros((pc,), jnp.int32),
                  jnp.asarray(pad(data['coords_float'].astype(np.float32))),
                  jnp.asarray(np.arange(pc) < n))
        scenes.append((n, inputs))

        sem = data['semantic_labels']
        inst = data['instance_labels']
        gt = np.where((sem >= 2) & (inst >= 0),
                      (sem + 1) * 1000 + inst + 1, 0).astype(np.int64)
        gts.append(gt)
    print(f'# inputs built ({len(scenes)} room scenes)', flush=True)

    ev = ScanNetEval([f'c{i}' for i in range(20)], use_label=False)
    print(f'{"variant":>18} {"AP":>7} {"AP_50":>7} {"AP_25":>7} '
          f'{"n_prop":>7} {"ms":>8} {"compile_s":>9}', flush=True)

    rows = []
    for name, cfg, iters in variants:
        fn = jax.jit(lambda s, o, b, c, v, cfg=cfg: forward_grouping(
            s, o, b, c, v, cfg, caps))
        preds, times = [], []
        t_c0 = time.perf_counter()
        compile_s = None
        for si, (n, inputs) in enumerate(scenes):
            props = fn(*inputs)
            # host fetch: block_until_ready does not drain the tunnelled
            # TPU queue (same caveat as bench.py)
            np.asarray(props.n_proposals)
            if compile_s is None:
                compile_s = time.perf_counter() - t_c0
            t0 = time.perf_counter()
            for _ in range(iters):
                props = fn(*inputs)
                np.asarray(props.n_proposals)
            times.append((time.perf_counter() - t0) / iters * 1000)
            # class-agnostic scoring: proposal quality is what differs
            preds.append(proposals_to_instances(props, n, f'scan{si}'))
        res = ev.evaluate(preds, gts, nproc=1)
        npr = np.mean([len(pp) for pp in preds])
        row = (name, res['all_ap'], res['all_ap_50%'], res['all_ap_25%'],
               npr, float(np.mean(times)), compile_s)
        rows.append(row)
        print(f'{name:>18} {row[1]:7.3f} {row[2]:7.3f} {row[3]:7.3f} '
              f'{npr:7.1f} {row[5]:8.2f} {compile_s:9.1f}', flush=True)
    if args.json:
        import json
        with open(args.json, 'w') as f:
            json.dump(dict(
                n_points=args.n_points, seeds=args.seeds,
                offset_noise=args.offset_noise,
                caps=dict(points=caps.points, entries=caps.grouping_points,
                          cells=caps.grouping_cells),
                rows=[dict(variant=r[0], AP=round(r[1], 4),
                           AP_50=round(r[2], 4), AP_25=round(r[3], 4),
                           n_prop=r[4], ms=round(r[5], 2),
                           compile_s=round(r[6], 1)) for r in rows]), f,
                indent=1)
        print(f'# wrote {args.json}', flush=True)


if __name__ == '__main__':
    main()
