"""SemanticKITTI panoptic dataset — `softgroup/data/kitti.py`.

Raw `.bin`/`.label` pairs read at train time; semantic ids remapped via the
dataset's learning_map so stuff occupies 0..10, things 11..18 (ignore=-100);
instance-class shift -11; elastic runs at 1/5 scale for speed.
"""

from __future__ import annotations

import os.path as osp
from glob import glob
from pathlib import Path

import numpy as np
import yaml

from .custom import CustomDataset
from .transforms import augment_xyz, crop_to_size, elastic_distort
from .synthetic import instance_info


class KITTIDataset(CustomDataset):

    STUFF = ('road', 'parking', 'sidewalk', 'otherground', 'building',
             'fence', 'vegetation', 'trunk', 'terrain', 'pole',
             'traffic-sign')
    THING = ('car', 'bicycle', 'motorcycle', 'truck', 'other-vehicle',
             'person', 'bicyclist', 'motorcyclist')
    CLASSES = THING

    def __init__(self, data_root, prefix, suffix, voxel_cfg=None,
                 training=True, with_label=True, repeat=1, logger=None,
                 seed=None):
        with open(osp.join(data_root, 'semantic-kitti.yaml')) as f:
            meta = yaml.safe_load(f)
        split_key = {'train': 'train', 'val': 'valid', 'test': 'test'}[prefix]
        self.split = meta['split'][split_key]
        # remap: 0 -> ignore, stuff (orig 9..19) -> 0..10, things (1..8) -> 11..18
        raw_map = meta['learning_map']
        max_key = max(raw_map)
        self.learning_map = np.full(max_key + 1, -100, np.int64)
        for k, v in raw_map.items():
            self.learning_map[k] = -100 if v == 0 else (v + 10 if v < 9
                                                        else v - 9)
        # yaml-space inverse (keys 1..19: things 1..8, stuff 9..19) — used
        # by the panoptic result writer (tools/test.py save_panoptic,
        # reference tools/test.py:91-113,199-204)
        self.learning_map_inv = meta['learning_map_inv']
        super().__init__(data_root, prefix, suffix, voxel_cfg, training,
                         with_label, repeat, logger, seed)

    def get_filenames(self):
        filenames = []
        for p in self.split:
            fns = glob(osp.join(self.data_root, 'sequences', f'{p:02d}',
                                'velodyne', '*' + self.suffix))
            assert len(fns) > 0, f'Empty {p}'
            filenames.extend(fns)
        return sorted(filenames * self.repeat)

    def load(self, filename):
        data = np.fromfile(filename, dtype=np.float32).reshape(-1, 4)
        xyz, remission = data[:, :3], data[:, 3:]
        if self.with_label:
            raw = np.fromfile(
                filename.replace('velodyne', 'labels').replace('bin', 'label'),
                dtype=np.int32)
            sem = self.learning_map[raw & 0xFFFF]
            inst = raw.copy()
            inst[sem <= 10] = -100  # stuff carries no instances
        else:
            sem = np.zeros(len(xyz), np.int64)
            inst = np.zeros(len(xyz), np.int64)
        return xyz, remission, sem, inst

    def label_shift(self, instance_cls):
        return np.where(instance_cls != -100, instance_cls - 11, instance_cls)

    def transform_train(self, xyz, rgb, semantic_label, instance_label,
                        aug_prob=1.0):
        rng = self.rng
        xyz_middle = augment_xyz(xyz, rng, jitter=True, flip=True, rot=True,
                                 scale=True, prob=aug_prob)
        # elastic at 1/5 resolution (kitti.py:92-101)
        down = 5
        xyz_scaled = xyz_middle * self.voxel_cfg.scale / down
        if rng.rand() < aug_prob:
            xyz_scaled = elastic_distort(xyz_scaled, 6, 40.0 / down, rng)
            xyz_scaled = elastic_distort(xyz_scaled, 20, 160.0 / down, rng)
        xyz_scaled = xyz_scaled * down
        xyz_scaled = xyz_scaled - xyz_scaled.min(0)
        valid = None
        for _ in range(5):
            xyz_offset, valid = crop_to_size(
                xyz_scaled, self.voxel_cfg.max_npoint,
                self.voxel_cfg.spatial_shape[1], rng)
            if valid.sum() >= self.voxel_cfg.min_npoint:
                xyz_scaled = xyz_offset
                break
        if valid is None or valid.sum() < self.voxel_cfg.min_npoint:
            return None
        inst = self._relabel_sparse_ids(instance_label[valid])
        return (xyz_scaled[valid], xyz_middle[valid], rgb[valid],
                semantic_label[valid], inst)

    def transform_test(self, xyz, rgb, semantic_label, instance_label):
        xyz_middle = augment_xyz(xyz, self.rng)
        xyz_scaled = xyz_middle * self.voxel_cfg.scale
        xyz_scaled = xyz_scaled - xyz_scaled.min(0)
        inst = self._relabel_sparse_ids(instance_label)
        return xyz_scaled, xyz_middle, rgb, semantic_label, inst

    @staticmethod
    def _relabel_sparse_ids(instance_label):
        """Raw kitti instance ids are sparse 32-bit values; compact to
        0..K-1 keeping -100 (kitti.py:78-90)."""
        ids = np.unique(instance_label)
        ids = ids[ids != -100]
        out = np.full_like(instance_label, -100)
        for new, old in enumerate(ids):
            out[instance_label == old] = new
        return out

    def __getitem__(self, index):
        item = super().__getitem__(index)
        if item is None:
            return None
        parts = Path(self.filenames[index]).parts[-4:]
        item['scan_id'] = osp.join(*parts).replace(self.suffix, '')
        return item
