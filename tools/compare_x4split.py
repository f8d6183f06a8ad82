#!/usr/bin/env python3
"""S3DIS x4_split fidelity: proposals through the 4-part split + merged
grouping vs the unsplit forward (VERDICT r04 next-round item 4).

The reference splits huge S3DIS rooms into 4 interleaved point subsets,
forwards them as separate batch items and merges features back point-wise
(`softgroup/model/softgroup.py:380-409`, `data/s3dis.py:46-115`).  Our
pipeline forwards the parts natively as 4 voxel-batch items (part id =
voxel batch coordinate, per-part min subtraction) while grouping sees one
merged scene (grouping_batch_idxs = 0) — `data/s3dis.py:transform_test`,
`data/padding.py:build_scene_batch(batch_idxs=...)`.

This harness pushes a large synthetic room through BOTH batch layouts with
a simulated trained head (gt-derived logits/offsets, the
compare_grouping.py protocol) and scores proposal parity in ORIGINAL point
space: per-proposal best-IoU split<->unsplit both directions, plus
ScanNetEval AP of each variant against gt.  The split batch has a genuinely
different point order (sorted by the 4-part voxelization's p2v) and a
different pyramid, so this exercises the part-id -> voxel-batch-coordinate
plumbing, the point_perm bookkeeping and merged grouping end to end; a
regression anywhere in that chain breaks the parity.

CPU-scale version: tests/test_model.py::test_x4split_grouping_parity.
Committed chip-scale evidence: docs/grouping_fidelity.md §x4_split.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def make_inputs(n_points, seed, scale=50.0):
    """One big room + simulated head, in original point order."""
    from softgroup_tpu.data.synthetic import collate_scenes, make_room_scene
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from tools.compare_grouping import simulated_head
    rng = np.random.RandomState(seed)
    scene = make_room_scene(rng, n_points=n_points, n_instances=12)
    data = collate_scenes([scene], scale=scale)
    n = len(data['coords'])
    logits, offsets = simulated_head(data, n, rng)
    return data, logits, offsets


def split_coords(data, scale=50.0):
    """Rebuild the voxel coords the S3DIS x4_split collate produces
    (`data/s3dis.py:transform_test,collate_fn`): part id i%4 in the batch
    coordinate, per-part min subtraction, merged grouping batch 0."""
    xyz = data['coords_float']
    n = len(xyz)
    part = (np.arange(n) % 4).astype(np.int32)
    xyz_scaled = xyz * scale
    for k in range(4):
        m = part == k
        xyz_scaled[m] -= xyz_scaled[m].min(0)
    coords = np.concatenate(
        [part[:, None].astype(np.int64),
         xyz_scaled.astype(np.int64)], axis=1).astype(np.int32)
    spatial = np.clip(coords[:, 1:].max(0) + 1, 128, None)
    return coords, spatial, np.zeros(n, np.int32)


def probe_voxels(data, num_levels):
    """Max per-level voxel counts over BOTH batch layouts (the split
    voxelization dedupes less at coarse levels — parts stay separate)."""
    from softgroup_tpu.ops.voxelize import voxelize_np
    counts = np.zeros(num_levels, np.int64)
    for split in (False, True):
        cur = split_coords(data)[0] if split else data['coords']
        cur, _, _ = voxelize_np(cur)
        for lvl in range(num_levels):
            counts[lvl] = max(counts[lvl], len(cur))
            if lvl + 1 < num_levels:
                nxt = cur.copy()
                nxt[:, 1:] //= 2
                cur, _, _ = voxelize_np(nxt)
    return counts


def build_batch(data, caps, num_levels, split):
    from softgroup_tpu.data.padding import build_scene_batch
    if split:
        coords, spatial, gbi = split_coords(data)
    else:
        coords, spatial, gbi = (data['coords'], data['spatial_shape'], None)
    return build_scene_batch(
        coords, data['coords_float'], data['feats'],
        data['semantic_labels'], data['instance_labels'],
        data['pt_offset_labels'], data['instance_pointnum'],
        data['instance_cls'], spatial, caps, num_levels,
        batch_idxs=gbi)


def grouping_proposals(batch, logits, offsets, n, cfg, caps):
    """Run forward_grouping on the batch's (voxel-sorted) layout; return
    proposals as sets of ORIGINAL point indices."""
    import jax
    import jax.numpy as jnp

    from softgroup_tpu.model.softgroup import forward_grouping

    order = np.asarray(batch.point_perm)[:n]   # sorted row -> original idx
    pc = caps.points

    def pad_sorted(a, fill=0.0):
        out = np.full((pc,) + a.shape[1:], fill, a.dtype)
        out[:n] = a[order]
        return out

    fn = jax.jit(lambda s, o, b, c, v: forward_grouping(
        s, o, b, c, v, cfg, caps))
    props = fn(jnp.asarray(pad_sorted(logits)),
               jnp.asarray(pad_sorted(offsets)),
               batch.batch_idxs, batch.coords_float,
               batch.pyramid.point_valid)
    ev = np.asarray(props.entry_valid)
    pt = np.asarray(props.entry_pt)
    seg = np.asarray(props.entry_seg)
    keep = ev & (pt < n)
    seg, pt = seg[keep], pt[keep]
    pt = order[pt]                             # back to original indices
    out = []
    for s in np.unique(seg):
        out.append(np.sort(pt[seg == s]))
    return out


def iou_parity(props_a, props_b, n):
    """For each proposal in a, best IoU against b (point-set IoU)."""
    masks_b = np.zeros((len(props_b), n), bool)
    for j, p in enumerate(props_b):
        masks_b[j, p] = True
    sizes_b = masks_b.sum(1)
    best = []
    for p in props_a:
        inter = masks_b[:, p].sum(1)
        union = sizes_b + len(p) - inter
        best.append(float((inter / np.maximum(union, 1)).max())
                    if len(props_b) else 0.0)
    return np.asarray(best)


def ap_vs_gt(props_list, datas, scan_ids):
    from softgroup_tpu.evaluation.instance_eval import ScanNetEval
    from softgroup_tpu.util.rle import rle_encode
    ev = ScanNetEval([f'c{i}' for i in range(20)], use_label=False)
    preds, gts = [], []
    for props, data, sid in zip(props_list, datas, scan_ids):
        n = len(data['coords'])
        insts = []
        for p in props:
            mask = np.zeros(n, np.uint8)
            mask[p] = 1
            insts.append(dict(scan_id=sid, label_id=1, conf=1.0,
                              pred_mask=rle_encode(mask)))
        preds.append(insts)
        sem = data['semantic_labels']
        inst = data['instance_labels']
        gts.append(np.where((sem >= 2) & (inst >= 0),
                            (sem + 1) * 1000 + inst + 1, 0).astype(np.int64))
    return ev.evaluate(preds, gts, nproc=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-points', type=int, default=500000)
    ap.add_argument('--seeds', type=int, default=2)
    ap.add_argument('--json', default=None)
    args = ap.parse_args()

    from softgroup_tpu.data.padding import round_capacity
    from softgroup_tpu.model.softgroup import Capacities
    from softgroup_tpu.util.config import Config

    n_pts = args.n_points
    p = round_capacity(n_pts)
    caps = None  # derived from the first scene's probed voxel counts
    cfg = Config(dict(grouping_cfg=dict(
        score_thr=0.2, radius=0.04, mean_active=300,
        class_numpoint_mean=[-1.0] * 20, npoint_thr=50,
        ignore_classes=[0, 1], pair_keys=False,
        exact_ball_query=False, cell_scale=1.0),
        test_cfg=dict(min_npoint=100)))

    rows = []
    datas, props_split_all, props_whole_all = [], [], []
    for seed in range(args.seeds):
        data, logits, offsets = make_inputs(n_pts, seed)
        n = len(data['coords'])
        datas.append(data)
        if caps is None:
            vox = probe_voxels(data, 3)
            caps = Capacities(
                points=p,
                voxels=tuple(round_capacity(int(v * 1.15), minimum=256)
                             for v in vox),
                grouping_points=round_capacity(n_pts * 3 // 2, minimum=8192),
                proposals=256, proposal_entries=p, instances=128,
                inst_voxels=(65536, 16384),
                grouping_cells=max(16384, round_capacity(n_pts // 4)))
            print(f'# caps: P={caps.points} V={caps.voxels} '
                  f'E={caps.grouping_points}', flush=True)
        t0 = time.perf_counter()
        b_whole = build_batch(data, caps, 3, split=False)
        pw = grouping_proposals(b_whole, logits, offsets, n, cfg, caps)
        t_whole = time.perf_counter() - t0
        t0 = time.perf_counter()
        b_split = build_batch(data, caps, 3, split=True)
        ps = grouping_proposals(b_split, logits, offsets, n, cfg, caps)
        t_split = time.perf_counter() - t0
        props_whole_all.append(pw)
        props_split_all.append(ps)
        iou_ws = iou_parity(pw, ps, n)
        iou_sw = iou_parity(ps, pw, n)
        rows.append(dict(
            seed=seed, n_points=n,
            n_prop_whole=len(pw), n_prop_split=len(ps),
            mean_best_iou=round(float(np.concatenate(
                [iou_ws, iou_sw]).mean()), 4),
            min_best_iou=round(float(np.concatenate(
                [iou_ws, iou_sw]).min()), 4),
            frac_matched_95=round(float((np.concatenate(
                [iou_ws, iou_sw]) >= 0.95).mean()), 4),
            t_whole_s=round(t_whole, 1), t_split_s=round(t_split, 1)))
        print(f'# seed {seed}: whole={len(pw)} split={len(ps)} proposals  '
              f'mean_best_iou={rows[-1]["mean_best_iou"]:.4f}  '
              f'min={rows[-1]["min_best_iou"]:.4f}', flush=True)

    sids = [f'scan{i}' for i in range(args.seeds)]
    res_w = ap_vs_gt(props_whole_all, datas, sids)
    res_s = ap_vs_gt(props_split_all, datas, sids)
    print(f'whole  AP {res_w["all_ap"]:.3f}  AP_50 {res_w["all_ap_50%"]:.3f}'
          f'  AP_25 {res_w["all_ap_25%"]:.3f}', flush=True)
    print(f'split  AP {res_s["all_ap"]:.3f}  AP_50 {res_s["all_ap_50%"]:.3f}'
          f'  AP_25 {res_s["all_ap_25%"]:.3f}', flush=True)
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(dict(
                n_points=args.n_points, seeds=args.seeds, rows=rows,
                ap_whole=dict(AP=round(res_w['all_ap'], 4),
                              AP_50=round(res_w['all_ap_50%'], 4),
                              AP_25=round(res_w['all_ap_25%'], 4)),
                ap_split=dict(AP=round(res_s['all_ap'], 4),
                              AP_50=round(res_s['all_ap_50%'], 4),
                              AP_25=round(res_s['all_ap_25%'], 4))), f,
                indent=1)
        print(f'# wrote {args.json}', flush=True)


if __name__ == '__main__':
    main()
