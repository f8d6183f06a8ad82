#!/usr/bin/env python3
"""Prepare S3DIS rooms into .pth tuples (xyz, rgb in [-1,1], semantic,
instance, room_label, 0) — reference `dataset/s3dis/prepare_data_inst.py`:
room txt + per-object Annotations/*.txt; object points matched back to room
points by nearest neighbour to assign labels.
"""

from __future__ import annotations

import argparse
import glob
import multiprocessing as mp
import os
import os.path as osp

import numpy as np
import torch

CLASSES = ('ceiling', 'floor', 'wall', 'beam', 'column', 'window', 'door',
           'chair', 'table', 'bookcase', 'sofa', 'board', 'clutter')
CLS_TO_ID = {c: i for i, c in enumerate(CLASSES)}


def nearest_assign(room_xyz, obj_xyz, chunk=4096):
    """Index of the nearest room point for every object point."""
    try:
        from sklearn.neighbors import NearestNeighbors
        nn = NearestNeighbors(n_neighbors=1).fit(room_xyz)
        return nn.kneighbors(obj_xyz, return_distance=False)[:, 0]
    except ImportError:
        out = np.empty(len(obj_xyz), np.int64)
        for i in range(0, len(obj_xyz), chunk):
            d = ((obj_xyz[i:i + chunk, None, :] -
                  room_xyz[None, :, :]) ** 2).sum(-1)
            out[i:i + chunk] = d.argmin(1)
        return out


def process_room(room_dir):
    room = osp.basename(room_dir)
    area = osp.basename(osp.dirname(room_dir))
    room_file = osp.join(room_dir, f'{room}.txt')
    data = np.loadtxt(room_file)
    xyz = data[:, :3].astype(np.float32)
    rgb = data[:, 3:6].astype(np.float32) / 127.5 - 1.0
    sem = np.full(len(xyz), -100, np.float64)
    inst = np.full(len(xyz), -100, np.float64)

    inst_id = 0
    for ann in sorted(glob.glob(osp.join(room_dir, 'Annotations', '*.txt'))):
        cls_name = osp.basename(ann).split('_')[0]
        if cls_name not in CLS_TO_ID:
            cls_name = 'clutter'
        obj = np.loadtxt(ann)
        idx = nearest_assign(xyz, obj[:, :3].astype(np.float32))
        sem[idx] = CLS_TO_ID[cls_name]
        inst[idx] = inst_id
        inst_id += 1

    xyz = xyz - xyz.mean(0)
    out = osp.join('preprocess', f'{area}_{room}_inst_nostuff.pth')
    torch.save((xyz, rgb, sem, inst, 0, 0), out)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_dir', default='Stanford3dDataset_v1.2')
    args = p.parse_args()
    os.makedirs('preprocess', exist_ok=True)
    rooms = sorted(glob.glob(osp.join(args.data_dir, 'Area_*', '*')))
    rooms = [r for r in rooms if osp.isdir(r)]
    with mp.Pool() as pool:
        outs = pool.map(process_room, rooms)
    print(f'prepared {len(outs)} rooms')


if __name__ == '__main__':
    main()
