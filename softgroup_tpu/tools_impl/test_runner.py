"""Shared inference/eval driver used by tools/test.py and train-time
validation — the equivalent of the reference `tools/test.py:122-204` loop
(per-scan forward, result accumulation, eval dispatch per eval_tasks).

Device work is jitted per capacity bucket (scenes of similar size share one
compiled program); host post-processing (instance extraction, RLE, metric
protocols) runs in numpy while the device processes the next scan.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from ..data import build_dataloader, build_dataset, build_scene_batch
from ..data.padding import round_capacity
from ..evaluation.instance_eval import ScanNetEval
from ..evaluation.point_wise_eval import (evaluate_offset_mae,
                                          evaluate_semantic_acc,
                                          evaluate_semantic_miou)
from ..evaluation.postprocess import (get_gt_instances, get_instances,
                                      panoptic_fusion)
from ..model.softgroup import Capacities


def bucketed_caps(n_points: int, voxel_counts, base: Capacities,
                  lvl_fusion: bool = False) -> Capacities:
    """Bucketed per-scene capacities: static per bucket, few buckets total.

    lvl_fusion: grouping/refinement run on the level-0 VOXEL set
    (`test_forward_plus`), so the entry-scale caps follow the voxel count —
    surface scans dedupe to ~75% of their points, and leaving the caps at
    point scale erases the ++ path's row advantage (the entry pipeline's
    sorts/gathers cost by CAP, not live rows)."""
    rows = voxel_counts[0] if lvl_fusion else n_points
    return Capacities(
        points=round_capacity(n_points),
        voxels=tuple(round_capacity(v, minimum=256) for v in voxel_counts),
        grouping_points=round_capacity(2 * rows, minimum=8192),
        proposals=base.proposals,
        proposal_entries=min(round_capacity(6 * rows, minimum=8192),
                             base.proposal_entries),
        instances=base.instances,
        inst_voxels=base.inst_voxels,
    )


class InferenceRunner:

    def __init__(self, net, variables, model_cfg, base_caps: Capacities,
                 num_levels: int, logger=None):
        self.net = net
        self.variables = variables
        self.cfg = model_cfg
        self.base_caps = base_caps
        self.num_levels = num_levels
        self.logger = logger
        self._jitted = {}

    def _fn(self, caps: Capacities):
        lvl = bool(self.cfg.test_cfg.get('lvl_fusion', False))
        key = (caps, lvl)
        if key not in self._jitted:
            net, cfg = self.net, self.cfg
            method = net.test_forward_plus if lvl else net.test_forward

            @jax.jit
            def fn(variables, batch):
                return net.apply(variables, batch, cfg, caps, method=method)

            self._jitted[key] = fn
        return self._jitted[key]

    def build_batch(self, data: dict):
        """Host: voxelize + pyramid + pad for one collated test scene."""
        from ..ops.voxelize import voxelize_np
        # probe voxel counts per level for bucketing
        coords = data['coords']
        counts = []
        cur, _, _ = voxelize_np(coords)
        for lvl in range(self.num_levels):
            counts.append(len(cur))
            if lvl + 1 < self.num_levels:
                nxt = cur.copy()
                nxt[:, 1:] //= 2
                cur, _, _ = voxelize_np(nxt)
        caps = bucketed_caps(len(coords), counts, self.base_caps,
                             lvl_fusion=bool(
                                 self.cfg.test_cfg.get('lvl_fusion', False)))
        batch = build_scene_batch(
            data['coords'], data['coords_float'], data['feats'],
            data['semantic_labels'], data['instance_labels'],
            data['pt_offset_labels'], data['instance_pointnum'],
            data['instance_cls'], data['spatial_shape'], caps,
            self.num_levels, self.cfg.ignore_label,
            batch_idxs=data.get('grouping_batch_idxs'),
            with_coords=getattr(self.cfg, 'with_coords', True))
        return batch, caps

    def run_scene(self, data: dict) -> dict:
        scan_id = data['scan_ids'][0]
        n = len(data['coords'])
        batch, caps = self.build_batch(data)
        out = self._fn(caps)(self.variables, batch)
        out = {k: np.asarray(v) for k, v in out.items()}

        # the device batch is in voxel-sorted point order (data/padding.py
        # sorts so p2v gathers are monotone); translate every per-point
        # output back to the ORIGINAL scan order here so evaluators,
        # writers and visualization never see the permutation
        perm = (np.asarray(batch.point_perm)[:n]
                if batch.point_perm is not None else None)

        def unperm(a):
            if perm is None:
                return a
            o = np.empty_like(a)
            o[perm] = a
            return o

        sem_preds = unperm(out['semantic_preds'][:n])
        if perm is not None:
            # get_instances reads point-level fields straight from `out`
            out['semantic_preds'] = np.concatenate(
                [sem_preds, out['semantic_preds'][n:]])
            if 'entry_pt' in out and not \
                    self.cfg.test_cfg.get('lvl_fusion', False):
                # proposal entries carry point indices in sorted space
                # (lvl_fusion entries index voxels — untouched)
                ev = out.get('entry_valid')
                pts = perm[np.clip(out['entry_pt'], 0, n - 1)]
                out['entry_pt'] = np.where(ev, pts, out['entry_pt']) \
                    if ev is not None else pts

        ret = dict(scan_id=scan_id)
        tasks = self.cfg.test_cfg.eval_tasks
        if 'semantic' in tasks or 'panoptic' in tasks:
            ret['semantic_labels'] = data['semantic_labels']
            ret['instance_labels'] = data['instance_labels']
        if 'semantic' in tasks:
            ret.update(
                coords_float=data['coords_float'],
                color_feats=data['feats'],
                semantic_preds=sem_preds,
                offset_preds=unperm(out['pt_offsets'][:n]),
                offset_labels=data['pt_offset_labels'])
        if not self.net.semantic_only and (
                'instance' in tasks or 'panoptic' in tasks):
            if self.cfg.test_cfg.get('lvl_fusion', False):
                # masks live on voxels; expand through p2v on the host
                # (unperm'd so the expansion lands in original order)
                p2v = unperm(np.asarray(batch.pyramid.p2v)[:n])
                n_vox = int(np.asarray(
                    batch.pyramid.levels[0].vox_valid).sum())
                pred_instances = get_instances(scan_id, out, n_vox, self.cfg,
                                               v2p_map=p2v)
            else:
                pred_instances = get_instances(scan_id, out, n, self.cfg)
            if 'instance' in tasks:
                ret['pred_instances'] = pred_instances
                ret['gt_instances'] = get_gt_instances(
                    data['semantic_labels'], data['instance_labels'],
                    self.cfg.semantic_classes, self.cfg.instance_classes)
            if 'panoptic' in tasks:
                ret['panoptic_preds'] = panoptic_fusion(
                    sem_preds, pred_instances, self.cfg,
                    self.cfg.semantic_classes, self.cfg.instance_classes)
        return ret


def run_eval(net, variables, cfg, base_caps, num_levels, logger=None,
             class_labels=None, max_scenes: int | None = None) -> dict:
    """Full eval over cfg.data.test — returns a flat metric dict."""
    dataset = build_dataset(cfg.data.test, logger)
    loader = build_dataloader(dataset, batch_size=1,
                              num_workers=cfg.dataloader.test.num_workers,
                              training=False)
    runner = InferenceRunner(net, variables, cfg.model, base_caps,
                             num_levels, logger)
    results = []
    for i, data in enumerate(loader):
        if max_scenes and i >= max_scenes:
            break
        results.append(runner.run_scene(data))
    return summarize(results, cfg, dataset, logger)


def summarize(results: list, cfg, dataset, logger=None) -> dict:
    out = {}
    tasks = cfg.model.test_cfg.eval_tasks
    # eval-side gt size gate: top-level cfg.eval_min_npoint (kitti 50,
    # stpls3d 10, absent elsewhere -> protocol default), NOT
    # test_cfg.min_npoint which gates instance EXTRACTION
    # (reference tools/test.py:172-178)
    from ..util.config import getattr_or
    eval_min_npoint = getattr_or(cfg, 'eval_min_npoint', None)
    if 'instance' in tasks and results and 'pred_instances' in results[0]:
        ev = ScanNetEval(dataset.CLASSES, min_npoint=eval_min_npoint)
        avgs = ev.evaluate([r['pred_instances'] for r in results],
                           [r['gt_instances'] for r in results])
        if logger:
            ev.print_results(avgs)
        out.update(AP=avgs['all_ap'], AP_50=avgs['all_ap_50%'],
                   AP_25=avgs['all_ap_25%'])
    if 'semantic' in tasks and results and 'semantic_preds' in results[0]:
        sem_pred = np.concatenate([r['semantic_preds'] for r in results])
        sem_gt = np.concatenate([r['semantic_labels'] for r in results])
        out['mIoU'] = evaluate_semantic_miou(sem_pred, sem_gt,
                                             cfg.model.ignore_label, logger)
        out['Acc'] = evaluate_semantic_acc(sem_pred, sem_gt,
                                           cfg.model.ignore_label, logger)
        off_pred = np.concatenate([r['offset_preds'] for r in results])
        off_gt = np.concatenate([r['offset_labels'] for r in results])
        inst_gt = np.concatenate([r['instance_labels'] for r in results])
        out['Offset_MAE'] = evaluate_offset_mae(
            off_pred, off_gt, inst_gt, cfg.model.ignore_label, logger)
    if 'panoptic' in tasks and results and 'panoptic_preds' in results[0]:
        from ..evaluation.panoptic_eval import PanopticEval
        thing = getattr(dataset, 'THING', None)
        stuff = getattr(dataset, 'STUFF', None)
        ev = PanopticEval(
            thing, stuff,
            min_points=50 if eval_min_npoint is None else eval_min_npoint)
        pq = ev.evaluate(
            [r['panoptic_preds'] for r in results],
            [r['semantic_labels'] for r in results],
            [r['instance_labels'] for r in results])
        if logger:
            logger.info(f'PQ: {pq["PQ"]:.1f}')
        out.update(PQ=pq['PQ'])
    return out
