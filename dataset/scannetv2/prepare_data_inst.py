#!/usr/bin/env python3
"""Prepare ScanNet v2 scans into per-scan .pth tuples
(xyz float32 centered, rgb in [-1, 1], semantic label, instance label) —
output format of the reference prep (`dataset/scannetv2/prepare_data_inst.py`:
mesh ply + .segs.json + .aggregation.json -> tuples; labels remapped to the
20-class NYU subset, instances only over classes >= 2).

Usage:
    python prepare_data_inst.py --data_split train  (expects raw scans under
    ./scans/<scan_id>/ as released by ScanNet)
"""

from __future__ import annotations

import argparse
import glob
import json
import multiprocessing as mp
import os.path as osp

import numpy as np
import torch

try:
    import plyfile
except ImportError:
    plyfile = None

# NYU40 ids used by the benchmark; index = our semantic label
REMAPPER_IDS = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33,
                34, 36, 39)
# raw-label (NYU40) -> 0..19, others -> -100
REMAPPER = np.full(150, -100, np.int64)
for i, nyu in enumerate(REMAPPER_IDS):
    REMAPPER[nyu] = i


def read_mesh(fn):
    assert plyfile is not None, 'plyfile needed for ScanNet preparation'
    ply = plyfile.PlyData.read(fn)
    v = ply['vertex']
    xyz = np.stack([v['x'], v['y'], v['z']], 1).astype(np.float32)
    rgb = np.stack([v['red'], v['green'], v['blue']], 1).astype(np.float32)
    return xyz, rgb / 127.5 - 1.0


def process_scan(paths):
    fn_mesh, with_label = paths
    scan_dir = osp.dirname(fn_mesh)
    scan_id = osp.basename(scan_dir)
    xyz, rgb = read_mesh(fn_mesh)
    xyz = xyz - xyz.mean(0)
    out = osp.join(scan_dir, f'{scan_id}_inst_nostuff.pth')
    if not with_label:
        torch.save((xyz, rgb), out)
        return out

    fn_label = fn_mesh.replace('_vh_clean_2.ply',
                               '_vh_clean_2.labels.ply')
    lbl_ply = plyfile.PlyData.read(fn_label)
    raw = np.asarray(lbl_ply['vertex']['label']).astype(np.int64)
    sem = REMAPPER[np.clip(raw, 0, len(REMAPPER) - 1)]

    with open(fn_mesh.replace('_vh_clean_2.ply',
                              '_vh_clean_2.0.010000.segs.json')) as f:
        seg_of_vert = np.asarray(json.load(f)['segIndices'])
    with open(fn_mesh.replace('_vh_clean_2.ply', '.aggregation.json')) as f:
        agg = json.load(f)['segGroups']

    seg_to_verts = {}
    for i, s in enumerate(seg_of_vert):
        seg_to_verts.setdefault(s, []).append(i)

    inst = np.full(len(xyz), -100, np.int64)
    next_id = 0
    for group in agg:
        verts = []
        for s in group['segments']:
            verts.extend(seg_to_verts.get(s, []))
        verts = np.asarray(verts, np.int64)
        # instances exist only for thing classes (semantic >= 2)
        if len(verts) and sem[verts[0]] >= 2:
            inst[verts] = next_id
            next_id += 1
    torch.save((xyz, rgb, sem.astype(np.float64),
                inst.astype(np.float64)), out)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_split', default='train',
                   choices=['train', 'val', 'test'])
    p.add_argument('--scans_dir', default='scans')
    args = p.parse_args()
    files = sorted(glob.glob(
        osp.join(args.scans_dir, '*', '*_vh_clean_2.ply')))
    with_label = args.data_split != 'test'
    with mp.Pool() as pool:
        outs = pool.map(process_scan, [(f, with_label) for f in files])
    print(f'prepared {len(outs)} scans')


if __name__ == '__main__':
    main()
