#!/usr/bin/env python3
"""Visualize predictions saved by tools/test.py — equivalent of the
reference `tools/visualization.py` (colorize semantic / instance / offset
results, write .ply or view with open3d when available).

Usage:
    python tools/visualization.py --prediction_path results/ \
        --room_name scene0011_00 --task instance_pred --out scene.ply
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

# ScanNet benchmark color map (public palette)
COLOR20 = np.array(
    [[230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
     [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
     [210, 245, 60], [250, 190, 190], [0, 128, 128], [230, 190, 255],
     [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
     [128, 128, 0], [255, 215, 180], [0, 0, 128], [128, 128, 128]])

SEMANTIC_NAMES = np.array([
    'wall', 'floor', 'cabinet', 'bed', 'chair', 'sofa', 'table', 'door',
    'window', 'bookshelf', 'picture', 'counter', 'desk', 'curtain',
    'refrigerator', 'shower curtain', 'toilet', 'sink', 'bathtub',
    'otherfurniture'])


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--prediction_path', required=True)
    p.add_argument('--room_name', required=True)
    p.add_argument('--task', default='instance_pred',
                   choices=['input', 'semantic_gt', 'semantic_pred',
                            'offset_semantic_pred', 'instance_gt',
                            'instance_pred'])
    p.add_argument('--out', default='')
    return p.parse_args()


def load(root, sub, room):
    return np.load(osp.join(root, sub, f'{room}.npy'))


def get_coords_color(root, room, task):
    xyz = load(root, 'coords', room)
    if task == 'input':
        color = np.full((len(xyz), 3), 180, np.float32)
    elif task in ('semantic_gt', 'semantic_pred'):
        sub = 'semantic_label' if task == 'semantic_gt' else 'semantic_pred'
        lbl = load(root, sub, room).astype(np.int64)
        color = np.full((len(xyz), 3), 100, np.float32)
        ok = lbl >= 0
        color[ok] = COLOR20[lbl[ok] % 20]
    elif task == 'offset_semantic_pred':
        lbl = load(root, 'semantic_pred', room).astype(np.int64)
        off = load(root, 'offset_pred', room)
        xyz = xyz + off
        color = COLOR20[np.clip(lbl, 0, 19) % 20].astype(np.float32)
    elif task == 'instance_gt':
        inst = load(root, 'gt_instance', room) if osp.exists(
            osp.join(root, 'gt_instance', f'{room}.npy')) else None
        if inst is None:
            inst = np.loadtxt(
                osp.join(root, 'gt_instance', f'{room}.txt')).astype(np.int64)
            inst = inst % 1000
        color = np.full((len(xyz), 3), 100, np.float32)
        ok = inst > 0
        color[ok] = COLOR20[inst[ok] % 20]
    else:  # instance_pred
        from softgroup_tpu.util.rle import rle_decode
        pred_file = osp.join(root, 'pred_instance', f'{room}.txt')
        color = np.full((len(xyz), 3), 100, np.float32)
        masks = []
        with open(pred_file) as f:
            for line in f:
                rel, label_id, conf = line.split()
                if float(conf) < 0.09:
                    continue
                m = np.loadtxt(osp.join(root, 'pred_instance', rel)) \
                    .astype(bool)
                masks.append(m)
        for i, m in enumerate(masks):
            color[m] = COLOR20[i % 20]
    return xyz, color


def write_ply(path, xyz, color):
    with open(path, 'w') as f:
        f.write('ply\nformat ascii 1.0\n')
        f.write(f'element vertex {len(xyz)}\n')
        f.write('property float x\nproperty float y\nproperty float z\n')
        f.write('property uchar red\nproperty uchar green\n'
                'property uchar blue\nend_header\n')
        for p, c in zip(xyz, color.astype(np.uint8)):
            f.write(f'{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} '
                    f'{c[0]} {c[1]} {c[2]}\n')


def main():
    args = parse_args()
    xyz, color = get_coords_color(args.prediction_path, args.room_name,
                                  args.task)
    if args.out:
        assert args.out.endswith('.ply'), 'output must be .ply'
        write_ply(args.out, xyz, color)
        print(f'wrote {args.out}')
        return
    try:
        import open3d as o3d
        pc = o3d.geometry.PointCloud()
        pc.points = o3d.utility.Vector3dVector(xyz)
        pc.colors = o3d.utility.Vector3dVector(color / 255.0)
        o3d.visualization.draw_geometries([pc])
    except ImportError:
        out = f'{args.room_name}_{args.task}.ply'
        write_ply(out, xyz, color)
        print(f'open3d unavailable; wrote {out}')


if __name__ == '__main__':
    main()
