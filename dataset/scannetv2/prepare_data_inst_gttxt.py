#!/usr/bin/env python3
"""Generate per-scan gt txt fixtures for instance evaluation: one line per
point, encoded `sem_class_id * 1000 + instance_id + 1` (0 for ignore) — the
reference's offline gt format (`dataset/scannetv2/prepare_data_inst_gttxt.py`).
"""

from __future__ import annotations

import glob
import os
import os.path as osp

import numpy as np
import torch

SPLIT = 'val'


def main():
    os.makedirs(f'{SPLIT}_gt', exist_ok=True)
    for fn in sorted(glob.glob(osp.join(SPLIT, '*_inst_nostuff.pth'))):
        xyz, rgb, sem, inst = torch.load(fn, weights_only=False)
        sem = np.asarray(sem).astype(np.int64)
        inst = np.asarray(inst).astype(np.int64)
        # instance classes start at semantic 2 -> eval ids 1..18
        sem_ins = sem - 2 + 1
        sem_ins[sem_ins < 0] = 0
        enc = sem_ins * 1000 + inst + 1
        enc[inst < 0] = 0
        scan = osp.basename(fn).replace('_inst_nostuff.pth', '')
        np.savetxt(osp.join(f'{SPLIT}_gt', f'{scan}.txt'), enc, fmt='%d')
        print(scan)


if __name__ == '__main__':
    main()
