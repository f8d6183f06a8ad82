#!/usr/bin/env python3
"""Prepare STPLS3D aerial scenes into .pth tuples — semantics of the
reference prep (`dataset/stpls3d/prepare_data_inst_instance_stpls3d.py`):
50 m train crops (x6 random-rotation augmentation) / 250 m val crops,
z-range padded to >= 6 m, semantic remap to 15 classes, instances disabled
on non-instance semantics and remapped dense from 0, degenerate train crops
skipped.
"""

from __future__ import annotations

import glob
import math
import os
import os.path as osp
import random

import numpy as np
import torch

# raw semantic id -> 0..14 (-100 ignore); instance-carrying classes 1..14
SEM_KEEP = {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7, 8: 8, 9: 9,
            10: 10, 11: 11, 12: 12, 13: 13, 14: 14}
Z_THRESHOLD = 6.0


def split_blocks(cloud, size=50.0, stride=50.0):
    hi = cloud[:, :3].max(0)
    nx = int(np.ceil((hi[0] - size) / stride)) + 1
    ny = int(np.ceil((hi[1] - size) / stride)) + 1
    for gx in range(nx):
        for gy in range(ny):
            x0, y0 = gx * stride, gy * stride
            m = ((cloud[:, 0] >= x0) & (cloud[:, 0] <= x0 + size)
                 & (cloud[:, 1] >= y0) & (cloud[:, 1] <= y0 + size))
            if m.any():
                yield cloud[m]


def rotate_z(points, angle_deg):
    a = math.radians(angle_deg)
    rot = np.array([[math.cos(a), -math.sin(a), 0],
                    [math.sin(a), math.cos(a), 0], [0, 0, 1]])
    out = points.copy()
    out[:, :3] = points[:, :3] @ rot
    return out


def save_block(block, out_path, with_label, train):
    # pad tiny z-ranges so the 3D grid keeps enough extent
    zr = block[:, 2].max() - block[:, 2].min()
    if zr < Z_THRESHOLD:
        pad = block[:1].copy()
        pad[:, 2] = block[:, 2].min() + Z_THRESHOLD
        pad[:, 6:] = -100 if block.shape[1] > 6 else 0
        block = np.concatenate([block, pad])
    coords = (block[:, :3] - block[:, :3].mean(0)).astype(np.float32)
    colors = (block[:, 3:6] / 127.5 - 1).astype(np.float32)
    if not with_label:
        torch.save((coords, colors), out_path)
        return True
    sem = block[:, 6].astype(np.int64)
    sem = np.where((sem >= 0) & (sem <= 14), sem, -100)
    inst = block[:, 7].astype(np.int64)
    inst = np.where(sem >= 1, inst, -100)  # class 0 carries no instances
    uniq = np.unique(inst[inst >= 0])
    remap = np.full(int(uniq.max()) + 1 if len(uniq) else 1, -100, np.int64)
    for i, j in enumerate(uniq):
        remap[j] = i
    inst = np.where(inst >= 0, remap[np.maximum(inst, 0)], -100)
    if train and (len(uniq) < 10
                  or len(np.unique(sem[sem >= 0])) >= len(uniq) - 2):
        return False  # degenerate crop
    torch.save((coords, colors, sem.astype(np.float64),
                inst.astype(np.float64)), out_path)
    return True


def prepare(files, out_dir, crop_size, aug_times=0, train=True,
            with_label=True):
    os.makedirs(out_dir, exist_ok=True)
    kept = skipped = 0
    for fn in files:
        name = osp.splitext(osp.basename(fn))[0]
        base = np.loadtxt(fn, delimiter=',')
        variants = [base] + [rotate_z(base, random.randint(1, 359))
                             for _ in range(aug_times)]
        for v, cloud in enumerate(variants):
            cloud = cloud.copy()
            cloud[:, :3] -= cloud[:, :3].min(0)
            for b, block in enumerate(split_blocks(cloud, crop_size,
                                                   crop_size)):
                out = osp.join(out_dir,
                               f'{name}_aug{v}_{b}_inst_nostuff.pth')
                if save_block(block, out, with_label, train):
                    kept += 1
                else:
                    skipped += 1
    print(f'{out_dir}: kept {kept}, skipped {skipped}')


def main():
    files = sorted(glob.glob('Synthetic_v3_InstanceSegmentation/*.txt'))

    def by_split(split_nums):
        out = []
        for f in files:
            name = osp.basename(f)
            num = name[:2] if name[:2].isdigit() else name[:1]
            if int(num) in split_nums:
                out.append(f)
        return out

    train_files = by_split([1, 2, 3, 4, 6, 7, 8, 9, 11, 12, 13, 14, 16, 17,
                            18, 19, 21, 22, 23, 24])
    val_files = by_split([5, 10, 15, 20, 25])
    prepare(train_files, 'train', 50.0, aug_times=6, train=True)
    prepare(val_files, 'val_250m', 250.0, aug_times=0, train=False)


if __name__ == '__main__':
    main()
