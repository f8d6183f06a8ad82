#!/usr/bin/env python3
"""Move prepared .pth scans into train/ val/ test/ folders following the
official ScanNet v2 split files (scannetv2_train.txt etc.) — reference:
`dataset/scannetv2/split_data.py`."""

from __future__ import annotations

import os
import os.path as osp
import shutil

for split in ('train', 'val', 'test'):
    os.makedirs(split, exist_ok=True)
    list_file = f'scannetv2_{split}.txt'
    if not osp.exists(list_file):
        print(f'missing {list_file}, skipping {split}')
        continue
    with open(list_file) as f:
        scans = [line.strip() for line in f if line.strip()]
    moved = 0
    for scan in scans:
        src = osp.join('scans' if split != 'test' else 'scans_test', scan,
                       f'{scan}_inst_nostuff.pth')
        if osp.exists(src):
            shutil.move(src, osp.join(split, osp.basename(src)))
            moved += 1
    print(f'{split}: moved {moved}/{len(scans)}')
