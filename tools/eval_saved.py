#!/usr/bin/env python3
"""Re-score SAVED instance-segmentation results from disk.

Standalone equivalent of the reference's offline evaluation path
(`softgroup/evaluation/instance_eval_util.py:116-154` reads pred txt +
mask files + gt txt back and feeds ScanNetEval) — closes the loop for
results produced by `tools/test.py --out`:

    results/
      pred_instance/<scan_id>.txt        "predicted_masks/<scan>_000.txt <label> <conf>"
      pred_instance/predicted_masks/*.txt 0/1 per point
      gt_instance/<scan_id>.txt          sem*1000 + inst + 1 encoding

Usage:
    python tools/eval_saved.py configs/softgroup/softgroup_scannet.yaml \
        results/
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
from glob import glob

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from softgroup_tpu.data import DATASETS
from softgroup_tpu.evaluation.instance_eval import ScanNetEval
from softgroup_tpu.util.config import load_config
from softgroup_tpu.util.logger import get_root_logger
from softgroup_tpu.util.rle import rle_encode


def load_gt(path: str, nyu_inv: dict | None) -> np.ndarray:
    """Per-point sem*1000+inst ids; NYU semantic ids mapped back to the
    internal 1-based class ids when the dataset writes NYU (ScanNet)."""
    gt = np.loadtxt(path, dtype=np.int64)
    if nyu_inv is not None:
        sem = gt // 1000
        inst = gt % 1000
        mapped = np.asarray([nyu_inv.get(int(s), 0) for s in
                             np.arange(sem.max() + 1)]) \
            if len(gt) else np.zeros(1, np.int64)
        gt = np.where(sem > 0, mapped[sem] * 1000 + inst, gt)
    return gt


def load_pred(root: str, scan_id: str, nyu_inv: dict | None) -> list:
    """Rebuild the pred_instances dict list from <scan>.txt + mask files."""
    insts = []
    index = osp.join(root, f'{scan_id}.txt')
    if not osp.isfile(index):
        return insts
    with open(index) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) != 3:
                continue
            rel, label_id, conf = parts[0], int(parts[1]), float(parts[2])
            if nyu_inv is not None:
                label_id = nyu_inv.get(label_id, 0)
            mask = np.loadtxt(osp.join(root, rel), dtype=np.int64) \
                .astype(np.uint8)
            insts.append(dict(scan_id=scan_id, label_id=label_id,
                              conf=conf, pred_mask=rle_encode(mask)))
    return insts


def main():
    p = argparse.ArgumentParser(description='re-score saved results')
    p.add_argument('config')
    p.add_argument('result_root',
                   help='dir containing pred_instance/ and gt_instance/')
    p.add_argument('--nproc', type=int, default=None)
    args = p.parse_args()
    cfg = load_config(args.config)
    logger = get_root_logger()

    ds_cls = DATASETS[cfg.data.test.type]
    nyu_id = getattr(ds_cls, 'NYU_ID', None)
    nyu_inv = ({int(n): i + 1 for i, n in enumerate(nyu_id)}
               if nyu_id is not None else None)

    pred_root = osp.join(args.result_root, 'pred_instance')
    gt_root = osp.join(args.result_root, 'gt_instance')
    scan_ids = sorted(osp.splitext(osp.basename(f))[0]
                      for f in glob(osp.join(gt_root, '*.txt')))
    if not scan_ids:
        raise SystemExit(f'no gt txt files under {gt_root}')
    logger.info(f're-scoring {len(scan_ids)} scans from {args.result_root}')

    preds = [load_pred(pred_root, sid, nyu_inv) for sid in scan_ids]
    gts = [load_gt(osp.join(gt_root, f'{sid}.txt'), nyu_inv)
           for sid in scan_ids]

    ev = ScanNetEval(ds_cls.CLASSES,
                     min_npoint=cfg.model.test_cfg.get('min_npoint'))
    res = ev.evaluate(preds, gts, nproc=args.nproc)
    ev.print_results(res)


if __name__ == '__main__':
    main()
