#!/usr/bin/env python3
"""Per-room gt txt fixtures for S3DIS instance eval (encoded
sem*1000+inst+1, 0=ignore; instance classes start at semantic 0 with
offset +1 since S3DIS has no stuff shift beyond sem2ins) — reference:
`dataset/s3dis/prepare_data_inst_gttxt.py`."""
import glob
import os
import os.path as osp
import numpy as np
import torch

AREA = 'Area_5'
os.makedirs(f'{AREA}_gt', exist_ok=True)
for fn in sorted(glob.glob(osp.join('preprocess', f'{AREA}*_inst_nostuff.pth'))):
    xyz, rgb, sem, inst, *_ = torch.load(fn, weights_only=False)
    sem = np.asarray(sem).astype(np.int64)
    inst = np.asarray(inst).astype(np.int64)
    sem_ins = sem + 1
    sem_ins[sem < 0] = 0
    enc = sem_ins * 1000 + inst + 1
    enc[inst < 0] = 0
    scan = osp.basename(fn).replace('_inst_nostuff.pth', '')
    np.savetxt(osp.join(f'{AREA}_gt', f'{scan}.txt'), enc, fmt='%d')
    print(scan)
