#!/usr/bin/env python3
"""Quantify the grouping approximation: exact point-level ball query + CC
(reference vanilla SoftGroup, `bfs_cluster.cu/.cpp`) vs the cell-contraction
fast path (SoftGroup++-style centroid granularity), at matched inputs.

Simulates a trained pointwise head on synthetic scenes (offsets point at the
instance centroid with noise; semantic scores peak at the gt class), runs
`forward_grouping` with `exact_ball_query` on/off and cell_scale in
{1.0, 0.5}, and scores every proposal set against the gt instances with the
real ScanNetEval protocol (AP / AP_50 / AP_25, proposal conf = 1).  Also
reports device wall-clock per variant at bench scale.

Output: one table row per variant — the committed evidence for the config
family defaults (VERDICT round-1 item 3).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def simulated_head(data, n_points, rng, offset_noise=0.03, score_noise=1.0):
    """Gt-derived semantic logits + centroid offsets with realistic noise."""
    sem = data['semantic_labels']
    n_cls = 20
    logits = rng.randn(n_points, n_cls).astype(np.float32) * score_noise
    ok = sem >= 0
    logits[np.arange(len(sem))[ok], sem[ok]] += 6.0
    offsets = data['pt_offset_labels'].astype(np.float32).copy()
    offsets += rng.randn(*offsets.shape).astype(np.float32) * offset_noise
    return logits, offsets


def proposals_to_instances(props, n, scan_id):
    from softgroup_tpu.util.rle import rle_encode
    ev = np.asarray(props.entry_valid)
    seg = np.asarray(props.entry_seg)[ev]
    pt = np.asarray(props.entry_pt)[ev]
    insts = []
    for s in np.unique(seg):
        mask = np.zeros(n, np.uint8)
        mask[pt[seg == s]] = 1
        insts.append(dict(scan_id=scan_id, label_id=1, conf=1.0,
                          pred_mask=rle_encode(mask)))
    return insts


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n-points', type=int, default=250000)
    p.add_argument('--seeds', type=int, default=3)
    p.add_argument('--offset-noise', type=float, default=0.03)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from softgroup_tpu.data.synthetic import collate_scenes, make_scene
    from softgroup_tpu.evaluation.instance_eval import ScanNetEval
    from softgroup_tpu.model.softgroup import Capacities, forward_grouping
    from softgroup_tpu.util.config import Config

    caps = Capacities(
        points=262144, voxels=(196608,), grouping_points=393216,
        proposals=256, proposal_entries=262144, instances=128,
        inst_voxels=(65536,), grouping_cells=16384)

    def cfg_for(exact, cell_scale):
        return Config(dict(grouping_cfg=dict(
            score_thr=0.2, radius=0.04, mean_active=300,
            class_numpoint_mean=[-1.0] * 20, npoint_thr=50,
            ignore_classes=[0, 1], pair_keys=False,
            exact_ball_query=exact, cell_scale=cell_scale),
            test_cfg=dict(min_npoint=100)))

    variants = [('exact_ball_query', cfg_for(True, 1.0)),
                ('cell_scale_0.5', cfg_for(False, 0.5)),
                ('cell_scale_1.0', cfg_for(False, 1.0))]

    fns = {}
    for name, cfg in variants:
        fns[name] = jax.jit(
            lambda s, o, b, c, v, cfg=cfg: forward_grouping(
                s, o, b, c, v, cfg, caps))

    preds = {name: [] for name, _ in variants}
    gts = []
    times = {name: [] for name, _ in variants}
    for seed in range(args.seeds):
        rng = np.random.RandomState(seed)
        scene = make_scene(rng, n_points=args.n_points, n_instances=12)
        data = collate_scenes([scene], scale=50.0)
        n = len(data['coords'])
        logits, offsets = simulated_head(data, n, rng,
                                         offset_noise=args.offset_noise)
        pc = caps.points

        def pad(a, fill=0.0):
            out = np.full((pc,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return out

        s_j = jnp.asarray(pad(logits))
        o_j = jnp.asarray(pad(offsets))
        b_j = jnp.zeros((pc,), jnp.int32)
        c_j = jnp.asarray(pad(data['coords_float'].astype(np.float32)))
        v_j = jnp.asarray(np.arange(pc) < n)

        sem = data['semantic_labels']
        inst = data['instance_labels']
        gt = np.where((sem >= 2) & (inst >= 0),
                      (sem + 1) * 1000 + inst + 1, 0).astype(np.int64)
        gts.append(gt)

        for name, _ in variants:
            props = fns[name](s_j, o_j, b_j, c_j, v_j)
            jax.block_until_ready(props.entry_seg)
            t0 = time.perf_counter()
            for _ in range(5):
                props = fns[name](s_j, o_j, b_j, c_j, v_j)
            np.asarray(props.n_proposals)
            times[name].append((time.perf_counter() - t0) / 5 * 1000)
            # class-agnostic scoring: proposal quality is what differs
            preds[name].append(proposals_to_instances(props, n,
                                                      f'scan{seed}'))

    ev = ScanNetEval([f'c{i}' for i in range(20)], use_label=False)
    print(f'{"variant":>18} {"AP":>7} {"AP_50":>7} {"AP_25":>7} '
          f'{"n_prop":>7} {"ms":>7}')
    for name, _ in variants:
        res = ev.evaluate(preds[name], gts, nproc=1)
        npr = np.mean([len(p) for p in preds[name]])
        print(f'{name:>18} {res["all_ap"]:7.3f} {res["all_ap_50%"]:7.3f} '
              f'{res["all_ap_25%"]:7.3f} {npr:7.1f} '
              f'{np.mean(times[name]):7.2f}')


if __name__ == '__main__':
    main()
