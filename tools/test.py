#!/usr/bin/env python3
"""Inference / evaluation CLI — equivalent of the reference `tools/test.py`
(per-scan forward, metric evaluation per eval_tasks, optional result
writers).

Usage:
    python tools/test.py configs/softgroup/softgroup_scannet.yaml \
        --checkpoint work_dirs/softgroup_scannet/ckpt/epoch_128 \
        --out results/
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
from concurrent.futures import ProcessPoolExecutor
from functools import partial

import jax
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from softgroup_tpu.data import build_dataloader, build_dataset
from softgroup_tpu.tools_impl.test_runner import InferenceRunner, summarize
from softgroup_tpu.util.checkpoint import (CheckpointManager,
                                           import_reference_weights,
                                           load_reference_state_dict)
from softgroup_tpu.util.config import load_config
from softgroup_tpu.util.logger import get_root_logger
from softgroup_tpu.util.rle import rle_decode


def parse_args():
    p = argparse.ArgumentParser(description='softgroup_tpu test')
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None,
                   help='orbax dir or reference .pth')
    p.add_argument('--out', default=None, help='directory for result files')
    p.add_argument('--max-scenes', type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    cfg = load_config(args.config)
    logger = get_root_logger()
    from tools.train import build_net, caps_from_cfg  # shared builders
    net = build_net(cfg)
    caps = caps_from_cfg(cfg)
    num_levels = cfg.tpu.num_levels

    dataset = build_dataset(cfg.data.test, logger)
    loader = build_dataloader(dataset, batch_size=1,
                              num_workers=cfg.dataloader.test.num_workers,
                              training=False)

    # variables: init once, then load checkpoint
    first = next(iter(loader))
    runner0 = InferenceRunner(net, None, cfg.model, caps, num_levels, logger)
    batch0, _ = runner0.build_batch(first)
    variables = net.init(jax.random.PRNGKey(0), batch0, cfg.model,
                         caps_from_cfg(cfg), method=net.test_forward)
    if args.checkpoint:
        if args.checkpoint.endswith('.pth'):
            variables = import_reference_weights(
                dict(variables), load_reference_state_dict(args.checkpoint),
                logger)
        else:
            import orbax.checkpoint as ocp
            restored = ocp.StandardCheckpointer().restore(
                osp.abspath(args.checkpoint))
            variables = {'params': restored['params'],
                         'batch_stats': restored['batch_stats']}
    runner = InferenceRunner(net, variables, cfg.model, caps, num_levels,
                             logger)

    results = []
    for i, data in enumerate(loader):
        if args.max_scenes and i >= args.max_scenes:
            break
        results.append(runner.run_scene(data))
        if i % 10 == 0:
            logger.info(f'scan {i}: {results[-1]["scan_id"]}')
    metrics = summarize(results, cfg, dataset, logger)
    for k, v in metrics.items():
        logger.info(f'{k}: {v}')
    if args.out:
        save_results(results, args.out, cfg, dataset)
    return metrics


# ---- result writers (reference tools/test.py:30-119) ----

def save_npy(root, name, scan_ids, arrs):
    os.makedirs(osp.join(root, name), exist_ok=True)
    for sid, arr in zip(scan_ids, arrs):
        np.save(osp.join(root, name, f'{sid}.npy'), arr)


def save_single_instance(root, scan_id, insts, nyu_id=None):
    f = open(osp.join(root, f'{scan_id}.txt'), 'w')
    os.makedirs(osp.join(root, 'predicted_masks'), exist_ok=True)
    for i, inst in enumerate(insts):
        assert scan_id == inst['scan_id']
        label_id = inst['label_id']
        if nyu_id is not None:
            label_id = nyu_id[label_id - 1]
        mask_path = osp.join(root, 'predicted_masks',
                             f'{scan_id}_{i:03d}.txt')
        f.write(f'predicted_masks/{scan_id}_{i:03d}.txt {label_id} '
                f'{inst["conf"]:.4f}\n')
        mask = rle_decode(inst['pred_mask'])
        np.savetxt(mask_path, mask, fmt='%d')
    f.close()


def save_pred_instances(root, name, scan_ids, pred_insts, nyu_id=None):
    root = osp.join(root, name)
    os.makedirs(root, exist_ok=True)
    with ProcessPoolExecutor() as pool:
        list(pool.map(partial(save_single_instance, root, nyu_id=nyu_id),
                      scan_ids, pred_insts))


def save_gt_instance(path, gt_inst, nyu_id=None):
    if nyu_id is not None:
        sem = gt_inst // 1000
        ignore = sem == 0
        ins = gt_inst % 1000
        mapped = np.where(ignore, 0, np.asarray([0] + list(nyu_id))[sem])
        gt_inst = mapped * 1000 + ins
    np.savetxt(path, gt_inst, fmt='%d')


def save_gt_instances(root, name, scan_ids, gt_insts, nyu_id=None):
    root = osp.join(root, name)
    os.makedirs(root, exist_ok=True)
    paths = [osp.join(root, f'{sid}.txt') for sid in scan_ids]
    with ProcessPoolExecutor() as pool:
        list(pool.map(partial(save_gt_instance, nyu_id=nyu_id), paths,
                      gt_insts))


def save_panoptic_single(path, panoptic, learning_map_inv, num_classes):
    """Write kitti-format .label: remap semantics back to raw kitti ids,
    keep instance ids in the high 16 bits (reference tools/test.py:91-113).

    `learning_map_inv` is the YAML-space inverse (keys 1..19: things 1..8,
    stuff 9..19); our learned space has stuff 0..10, things 11..18
    (data/kitti.py:38-44 shift), with cls == num_classes packed for ignored
    points by panoptic_fusion — those write raw id 0 (unlabeled)."""
    cls = panoptic & 0xFFFF
    inst = panoptic >> 16
    table = np.zeros(num_classes + 1, np.uint32)
    for yaml_k, raw in learning_map_inv.items():
        if yaml_k == 0:
            continue
        ours = yaml_k + 10 if yaml_k < 9 else yaml_k - 9
        table[ours] = raw
    table[num_classes] = 0
    sem = table[np.minimum(cls, num_classes)]
    out = (inst << np.uint32(16)) | sem
    out.astype(np.uint32).tofile(path)


def save_panoptic(root, name, scan_ids, panoptics, learning_map_inv,
                  num_classes):
    root = osp.join(root, name)
    for sid, pan in zip(scan_ids, panoptics):
        path = osp.join(root, sid.replace('velodyne', 'predictions') +
                        '.label')
        os.makedirs(osp.dirname(path), exist_ok=True)
        save_panoptic_single(path, pan, learning_map_inv, num_classes)


def save_results(results, out, cfg, dataset=None):
    scan_ids = [r['scan_id'] for r in results]
    tasks = cfg.model.test_cfg.eval_tasks
    if 'semantic' in tasks:
        save_npy(out, 'semantic_pred',
                 scan_ids, [r['semantic_preds'] for r in results])
        save_npy(out, 'semantic_label',
                 scan_ids, [r['semantic_labels'] for r in results])
        save_npy(out, 'coords', scan_ids,
                 [r['coords_float'] for r in results])
        save_npy(out, 'offset_pred', scan_ids,
                 [r['offset_preds'] for r in results])
        save_npy(out, 'offset_label', scan_ids,
                 [r['offset_labels'] for r in results])
    if 'instance' in tasks and 'pred_instances' in results[0]:
        from softgroup_tpu.data import DATASETS
        nyu_id = DATASETS[cfg.data.test.type].NYU_ID \
            if hasattr(DATASETS[cfg.data.test.type], 'NYU_ID') else None
        save_pred_instances(out, 'pred_instance', scan_ids,
                            [r['pred_instances'] for r in results], nyu_id)
        save_gt_instances(out, 'gt_instance', scan_ids,
                          [r['gt_instances'] for r in results], nyu_id)
    if 'panoptic' in tasks and results and 'panoptic_preds' in results[0]:
        # reference writes kitti .label files whenever panoptic is evaluated
        # (tools/test.py:199-204); learning_map_inv comes from the dataset's
        # semantic-kitti.yaml
        lmi = getattr(dataset, 'learning_map_inv', None)
        assert lmi is not None, \
            'panoptic writer needs a dataset with learning_map_inv (kitti)'
        save_panoptic(out, 'panoptic', scan_ids,
                      [r['panoptic_preds'] for r in results], lmi,
                      cfg.model.semantic_classes)


if __name__ == '__main__':
    main()
