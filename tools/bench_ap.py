#!/usr/bin/env python3
"""First end-to-end AP harness: overfit the net on a few synthetic room
scenes, then run the FULL inference + evaluation protocol (test_forward ->
get_instances -> ScanNetEval) and report AP / AP_50 / AP_25 plus the
point-wise metrics.

This is the pipeline-level guard the fidelity harness (compare_grouping.py)
cannot give: it exercises trained heads, soft grouping at production
settings, clusters_voxelization, the tiny U-Net refinement, host
postprocessing (RLE, score gating) and the ScanNet AP protocol end to end —
an AP-destroying bug anywhere in that chain drags the overfit AP_50 far
below 1.  Reference chain being validated: `forward_test` ->
`get_instances` -> `ScanNetEval` (softgroup/model/softgroup.py:299-361,
:537-604; softgroup/evaluation/instance_eval.py:39-309).

Scale notes: the default preset (3 scenes x 15k pts, 400 steps, C=16 d=5
net) runs in ~6 minutes on the v5e chip, most of it the two jit compiles.
The committed evidence lives in docs/grouping_fidelity.md §end-to-end.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def build_cfg(n_cls=20, k_inst=18, radius=0.04, cell_scale=1.0,
              exact=False):
    from softgroup_tpu.util.config import Config
    return Config(dict(
        channels=0,  # filled by caller where needed
        semantic_classes=n_cls, instance_classes=k_inst,
        semantic_only=False, ignore_label=-100, with_coords=True,
        sem2ins_classes=[],
        grouping_cfg=dict(score_thr=0.2, radius=radius, mean_active=300,
                          class_numpoint_mean=[-1.0] * n_cls, npoint_thr=50,
                          ignore_classes=[0, 1], pair_keys=False,
                          cell_scale=cell_scale, exact_ball_query=exact),
        instance_voxel_cfg=dict(scale=50, spatial_shape=20),
        train_cfg=dict(max_proposal_num=128, pos_iou_thr=0.5),
        test_cfg=dict(x4_split=False, cls_score_thr=0.001,
                      mask_score_thr=-0.5, min_npoint=100,
                      panoptic_skip_iou=0.5,
                      eval_tasks=['semantic', 'instance']),
    ))


def build_batches(n_points, n_scenes, num_levels, cfg, caps=None):
    """Per-scene SceneBatches with one shared capacity set (one compile)."""
    from softgroup_tpu.data.padding import build_scene_batch, round_capacity
    from softgroup_tpu.data.synthetic import collate_scenes, make_room_scene
    from softgroup_tpu.model.softgroup import Capacities
    from softgroup_tpu.ops.voxelize import voxelize_np
    shift = 20 - 18  # semantic -> instance class ids (scannetv2 label shift)
    datas = []
    vox_counts = np.zeros(num_levels, np.int64)
    for seed in range(n_scenes):
        rng = np.random.RandomState(seed)
        scene = make_room_scene(rng, n_points=n_points, n_instances=12)
        data = collate_scenes([scene], scale=50.0)
        data['instance_cls'] = np.maximum(
            data['instance_cls'].astype(np.int32) - shift, -100)
        datas.append(data)
        cur, _, _ = voxelize_np(data['coords'])
        for lvl in range(num_levels):
            vox_counts[lvl] = max(vox_counts[lvl], len(cur))
            if lvl + 1 < num_levels:
                nxt = cur.copy()
                nxt[:, 1:] //= 2
                cur, _, _ = voxelize_np(nxt)
    if caps is None:
        p = round_capacity(n_points)
        caps = Capacities(
            points=p,
            voxels=tuple(round_capacity(int(v), minimum=256)
                         for v in vox_counts),
            grouping_points=round_capacity(2 * n_points, minimum=8192),
            proposals=256,
            proposal_entries=round_capacity(2 * n_points, minimum=8192),
            instances=64,
            inst_voxels=(round_capacity(8 * n_points, minimum=16384),
                         round_capacity(2 * n_points, minimum=4096)),
            grouping_cells=round_capacity(n_points, minimum=8192))
    batches, metas = [], []
    for data in datas:
        batch = build_scene_batch(
            data['coords'], data['coords_float'], data['feats'],
            data['semantic_labels'], data['instance_labels'],
            data['pt_offset_labels'], data['instance_pointnum'],
            data['instance_cls'], data['spatial_shape'], caps,
            num_levels=num_levels)
        batches.append(batch)
        metas.append(dict(n=len(data['coords'])))
    return batches, metas, caps


def evaluate_weights(net, cfg, caps, final_vars, batches, metas,
                     lvl_fusion=False, panoptic=False, test_fn=None,
                     collect=None):
    """Full inference + eval on the given weights.  lvl_fusion=True runs
    `test_forward_plus` (grouping/refinement on the level-0 voxel set,
    reference softgroup.py:309-312) and expands masks through p2v on the
    host; vanilla runs `test_forward`.  Returns (metrics dict, test_fn).
    ``collect``: optional dict that receives preds / gts / sem_gt lists
    (for post-hoc diagnosis)."""
    import jax
    import numpy as np

    from softgroup_tpu.evaluation.instance_eval import ScanNetEval
    from softgroup_tpu.evaluation.point_wise_eval import (
        evaluate_offset_mae, evaluate_semantic_acc, evaluate_semantic_miou)
    from softgroup_tpu.evaluation.postprocess import (get_gt_instances,
                                                      get_instances,
                                                      panoptic_fusion)

    method = net.test_forward_plus if lvl_fusion else net.test_forward
    if test_fn is None:
        test_fn = jax.jit(lambda v, b: net.apply(
            v, b, cfg, caps, method=method))

    preds, gts = [], []
    sem_pred_all, sem_gt_all, off_pred_all, off_gt_all, inst_gt_all = (
        [], [], [], [], [])
    pan_preds = []
    for si, (batch, meta) in enumerate(zip(batches, metas)):
        out = {k: np.asarray(v)
               for k, v in test_fn(final_vars, batch).items()}
        n = meta['n']
        # everything stays in voxel-sorted space: entry_pt indexes the
        # sorted batch rows, so gt comes from the (sorted) batch labels
        sem_gt = np.asarray(batch.semantic_labels)[:n]
        inst_gt = np.asarray(batch.instance_labels)[:n]
        if lvl_fusion:
            # proposal entries index level-0 voxels; expand via p2v
            p2v = np.asarray(batch.pyramid.p2v)[:n]
            n_vox = int(np.asarray(
                batch.pyramid.levels[0].vox_valid).sum())
            inst_pred = get_instances(f'scene{si}', out, n_vox, cfg,
                                      v2p_map=p2v)
        else:
            inst_pred = get_instances(f'scene{si}', out, n, cfg)
        preds.append(inst_pred)
        gts.append(get_gt_instances(sem_gt, inst_gt, 20, 18))
        sem_pred_all.append(out['semantic_preds'][:n])
        sem_gt_all.append(sem_gt)
        off_pred_all.append(out['pt_offsets'][:n])
        off_gt_all.append(np.asarray(batch.pt_offset_labels)[:n])
        inst_gt_all.append(inst_gt)
        if panoptic:
            pan_preds.append(panoptic_fusion(
                out['semantic_preds'][:n], inst_pred, cfg, 20, 18))

    if collect is not None:
        collect.update(preds=preds, gts=gts, sem_gt=sem_gt_all)
    ev = ScanNetEval([f'class_{i}' for i in range(18)],
                     min_npoint=cfg.test_cfg.min_npoint)
    res = ev.evaluate(preds, gts, nproc=1)
    metrics = dict(
        AP=round(res['all_ap'], 3), AP_50=round(res['all_ap_50%'], 3),
        AP_25=round(res['all_ap_25%'], 3),
        mIoU=round(float(evaluate_semantic_miou(
            np.concatenate(sem_pred_all), np.concatenate(sem_gt_all),
            -100, None)), 3),
        Acc=round(float(evaluate_semantic_acc(
            np.concatenate(sem_pred_all), np.concatenate(sem_gt_all),
            -100, None)), 3),
        offset_mae=round(float(evaluate_offset_mae(
            np.concatenate(off_pred_all), np.concatenate(off_gt_all),
            np.concatenate(inst_gt_all), -100, None)), 3),
        n_pred_per_scene=round(float(np.mean([len(p) for p in preds])), 1))
    if panoptic:
        from softgroup_tpu.evaluation.panoptic_eval import PanopticEval
        pev = PanopticEval(
            thing_classes=[f'class_{i}' for i in range(2, 20)],
            stuff_classes=['floor', 'wall'],
            min_points=cfg.test_cfg.min_npoint)
        pq = pev.evaluate(pan_preds, sem_gt_all, inst_gt_all, nproc=1,
                          verbose=False)
        # the protocol averages over ALL classes (absent ones score 0);
        # the synthetic scenes cover only a subset, so also report PQ over
        # classes present in gt — that is the number a pipeline bug moves
        present = np.zeros(20, bool)
        for s in sem_gt_all:
            v = s[s >= 0]
            present[np.unique(v)] = True
        pq_cls = np.asarray(pq['per_class']['pq'])
        metrics.update(
            PQ=round(float(pq['PQ']), 3),
            PQ_present=round(float(pq_cls[present].mean()), 3),
            SQ=round(float(pq['SQ']), 3), RQ=round(float(pq['RQ']), 3))
    return metrics, test_fn


def diagnose_ap(preds_per_scene, gts_per_scene, min_npoint):
    """Separate the two AP failure modes (VERDICT r05: the 10k curve showed
    AP plateaus at ~0.75-0.81 while train loss keeps falling):

    - **mask-set quality**: per-gt best achievable IoU over ALL predictions
      — if this is ~1.0, the proposal/mask chain can represent every
      instance and the AP gap is elsewhere;
    - **score ranking**: re-run the AP protocol with each prediction's conf
      replaced by its true best-IoU against gt (oracle ranking).  AP_oracle
      >> AP_model means the cls/iou scoring mis-ranks duplicates above true
      positives; AP_oracle ~ AP_model means the mask set itself is the gap.
    """
    from softgroup_tpu.evaluation.instance_eval import ScanNetEval
    from softgroup_tpu.util.rle import rle_decode

    best_ious = []
    oracle_preds = []
    for preds, gt in zip(preds_per_scene, gts_per_scene):
        gt_ids = np.unique(gt[gt >= 1000])
        masks = [rle_decode(p['pred_mask']).astype(bool) for p in preds]
        opreds = []
        for p, m in zip(preds, masks):
            # oracle conf must be CLASS-AWARE: ranking by best-IoU against
            # any class's gt promotes cross-class duplicates to top-ranked
            # FPs in their own class and *understates* AP_oracle (the first
            # r05 diagnose run hit exactly this)
            sem_want = (p['label_id'] - 1) + 2   # inst class -> sem label
            ious = [
                float((m & (gt == g)).sum()) /
                max(float((m | (gt == g)).sum()), 1.0)
                for g in gt_ids if g // 1000 == sem_want]
            opreds.append(dict(p, conf=max(ious) if ious else 0.0))
        oracle_preds.append(opreds)
        for g in gt_ids:
            gm = gt == g
            if gm.sum() < min_npoint:
                continue
            best = 0.0
            for m in masks:
                inter = float((m & gm).sum())
                union = float((m | gm).sum())
                best = max(best, inter / max(union, 1.0))
            best_ious.append(best)
    ev = ScanNetEval([f'class_{i}' for i in range(18)],
                     min_npoint=min_npoint)
    res = ev.evaluate(oracle_preds, gts_per_scene, nproc=1)
    bi = np.asarray(best_ious) if best_ious else np.zeros((1,))
    return dict(
        AP_oracle_rank=round(res['all_ap'], 3),
        AP_50_oracle_rank=round(res['all_ap_50%'], 3),
        gt_best_iou_mean=round(float(bi.mean()), 3),
        gt_best_iou_min=round(float(bi.min()), 3),
        gt_best_iou_p25=round(float(np.percentile(bi, 25)), 3),
        n_gt=len(best_ious))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-points', type=int, default=15000)
    ap.add_argument('--scenes', type=int, default=3)
    ap.add_argument('--steps', type=int, default=400)
    ap.add_argument('--channels', type=int, default=16)
    ap.add_argument('--num-blocks', type=int, default=5)
    ap.add_argument('--lr', type=float, default=2e-3)
    ap.add_argument('--lvl-fusion', action='store_true',
                    help='also evaluate test_forward_plus (SoftGroup++ '
                         'lvl_fusion) on the same trained weights')
    ap.add_argument('--panoptic', action='store_true',
                    help='also compute PQ via panoptic_fusion + PanopticEval')
    ap.add_argument('--eval-at', type=str, default='',
                    help='comma-separated intermediate step counts to eval '
                         'at (AP curve, e.g. 3000,6000)')
    ap.add_argument('--diagnose', action='store_true',
                    help='at the final eval, report per-gt best achievable '
                         'IoU + AP under oracle (best-IoU) ranking')
    ap.add_argument('--save-weights', default='',
                    help='pickle final trained variables to this path')
    ap.add_argument('--load-weights', default='',
                    help='skip training; evaluate pickled variables')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from softgroup_tpu.model.softgroup import SoftGroupNet
    from softgroup_tpu.parallel.mesh import TrainState, make_train_step

    cfg = build_cfg()
    batches, metas, caps = build_batches(args.n_points, args.scenes,
                                         args.num_blocks, cfg)
    print(f'# scenes={args.scenes} x {args.n_points} pts  caps: '
          f'P={caps.points} V0={caps.voxels[0]} E={caps.grouping_points}',
          flush=True)

    net = SoftGroupNet(channels=args.channels, num_blocks=args.num_blocks,
                       semantic_classes=20, instance_classes=18)
    if args.load_weights:
        import pickle
        with open(args.load_weights, 'rb') as f:
            final_vars = jax.device_put(pickle.load(f))
        state = None
        args.steps = 0
        variables = final_vars
    else:
        variables = jax.jit(lambda key, b: net.init(
            key, b, cfg, caps, method=net.test_forward))(
                jax.random.PRNGKey(0), batches[0])

    state = None
    if args.steps:
        tx = optax.adam(args.lr)
        step = make_train_step(net, cfg, caps, tx, mesh=None)
        state = TrainState(params=variables['params'],
                           batch_stats=variables['batch_stats'],
                           opt_state=tx.init(variables['params']),
                           step=jnp.zeros((), jnp.int32))
    base_rng = jax.random.PRNGKey(42)

    eval_at = sorted(int(s) for s in args.eval_at.split(',') if s)
    curve = {}
    test_fn = None

    t0 = time.perf_counter()
    train_s = 0.0
    for i in range(args.steps):
        state, logs = step(state, batches[i % len(batches)],
                           jax.random.fold_in(base_rng, i))
        if i == 0:
            jax.block_until_ready(logs)
            print(f'# train compile+step0 {time.perf_counter() - t0:.1f}s',
                  flush=True)
        if (i + 1) % 100 == 0:
            logs = {k: float(v) for k, v in logs.items()}
            print(f'# step {i + 1}: ' + ' '.join(
                f'{k}={v:.3f}' for k, v in sorted(logs.items())), flush=True)
        if (i + 1) in eval_at and (i + 1) < args.steps:
            train_s += time.perf_counter() - t0
            mid_vars = {'params': state.params,
                        'batch_stats': state.batch_stats}
            m, test_fn = evaluate_weights(net, cfg, caps, mid_vars,
                                          batches, metas, test_fn=test_fn)
            curve[i + 1] = m
            print(f'# eval@{i + 1}: AP {m["AP"]:.3f}  AP_50 {m["AP_50"]:.3f}'
                  f'  AP_25 {m["AP_25"]:.3f}', flush=True)
            t0 = time.perf_counter()
    train_s += time.perf_counter() - t0

    if state is not None:
        final_vars = {'params': state.params,
                      'batch_stats': state.batch_stats}
    elif not args.load_weights:
        final_vars = variables  # random init (smoke runs)
    if args.save_weights:
        import pickle
        with open(args.save_weights, 'wb') as f:
            pickle.dump(jax.tree.map(np.asarray, final_vars), f, protocol=4)
        print(f'# weights saved to {args.save_weights}', flush=True)

    collect = {} if args.diagnose else None
    t0 = time.perf_counter()
    m, test_fn = evaluate_weights(net, cfg, caps, final_vars, batches,
                                  metas, panoptic=args.panoptic,
                                  test_fn=test_fn, collect=collect)
    infer_s = time.perf_counter() - t0
    curve[args.steps] = m

    print(f'# train {train_s:.0f}s  infer+eval {infer_s:.0f}s  '
          f'n_pred/scene={m["n_pred_per_scene"]:.1f}', flush=True)
    print(f'AP {m["AP"]:.3f}  AP_50 {m["AP_50"]:.3f}  '
          f'AP_25 {m["AP_25"]:.3f}  mIoU {m["mIoU"]:.3f}  '
          f'Acc {m["Acc"]:.3f}  Offset_MAE {m["offset_mae"]:.3f}',
          flush=True)
    if args.panoptic:
        print(f'PQ {m["PQ"]:.1f}  PQ_present {m["PQ_present"]:.1f}  '
              f'SQ {m["SQ"]:.1f}  RQ {m["RQ"]:.1f}', flush=True)

    detail = dict(m, scenes=args.scenes, n_points=args.n_points,
                  steps=args.steps)
    if args.diagnose:
        d = diagnose_ap(collect['preds'], collect['gts'],
                        cfg.test_cfg.min_npoint)
        print(f'# diagnose: AP_oracle_rank {d["AP_oracle_rank"]:.3f} '
              f'(model {m["AP"]:.3f})  gt best-IoU mean '
              f'{d["gt_best_iou_mean"]:.3f} min {d["gt_best_iou_min"]:.3f}',
              flush=True)
        detail['diagnose'] = d
    if args.lvl_fusion:
        t0 = time.perf_counter()
        m_pp, _ = evaluate_weights(net, cfg, caps, final_vars, batches,
                                   metas, lvl_fusion=True)
        print(f'# lvl_fusion eval {time.perf_counter() - t0:.0f}s',
              flush=True)
        print(f'[lvl_fusion] AP {m_pp["AP"]:.3f}  AP_50 {m_pp["AP_50"]:.3f}'
              f'  AP_25 {m_pp["AP_25"]:.3f}  (vanilla AP {m["AP"]:.3f})',
              flush=True)
        detail['lvl_fusion'] = m_pp
    if eval_at:
        detail['curve'] = {str(k): dict(AP=v['AP'], AP_50=v['AP_50'],
                                        AP_25=v['AP_25'])
                           for k, v in sorted(curve.items())}
    print(json.dumps(dict(
        metric='synthetic_overfit_AP_50', value=m['AP_50'],
        unit='AP_50', detail=detail)))


if __name__ == '__main__':
    main()
