#!/usr/bin/env python3
"""Randomly subsample the preprocessed S3DIS rooms by 1/4 (reference
`dataset/s3dis/downsample.py`) — used by non-x4_split training configs."""

from __future__ import annotations

import glob
import os
import os.path as osp

import numpy as np
import torch

os.makedirs('preprocess_sample', exist_ok=True)
for fn in sorted(glob.glob(osp.join('preprocess', '*.pth'))):
    xyz, rgb, sem, inst, *rest = torch.load(fn, weights_only=False)
    n = len(xyz)
    inds = np.random.choice(n, n // 4, replace=False)
    torch.save((xyz[inds], rgb[inds], sem[inds], inst[inds], *rest),
               osp.join('preprocess_sample', osp.basename(fn)))
    print(osp.basename(fn), n, '->', n // 4)
