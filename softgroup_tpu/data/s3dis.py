"""S3DIS dataset (13 classes, multi-Area prefixes, x4_split big-scene
protocol) — `softgroup/data/s3dis.py`.

x4_split: huge rooms are split into 4 interleaved point subsets that are
forwarded as 4 batch items through the backbone and merged back point-wise
(`softgroup.py:380-409`); training subsamples 1/4 of the points.
"""

from __future__ import annotations

import os.path as osp
from glob import glob

import numpy as np

from .custom import CustomDataset
from .transforms import augment_xyz, relabel_instances


class S3DISDataset(CustomDataset):

    CLASSES = ('ceiling', 'floor', 'wall', 'beam', 'column', 'window', 'door',
               'chair', 'table', 'bookcase', 'sofa', 'board', 'clutter')

    def __init__(self, x4_split=False, **kwargs):
        self.x4_split = x4_split
        super().__init__(**kwargs)

    def get_filenames(self):
        prefixes = ([self.prefix] if isinstance(self.prefix, str)
                    else list(self.prefix))
        filenames = []
        for p in prefixes:
            fns = glob(osp.join(self.data_root, p + '*' + self.suffix))
            assert len(fns) > 0, f'Empty {p}'
            filenames.extend(fns)
        return sorted(filenames * self.repeat)

    def load(self, filename):
        import torch
        xyz, rgb, semantic_label, instance_label, *_ = torch.load(
            filename, weights_only=False)
        if self.training and self.x4_split:
            n = len(xyz)
            inds = self.rng.choice(n, int(n * 0.25), replace=False)
            xyz, rgb = xyz[inds], rgb[inds]
            semantic_label = semantic_label[inds]
            mask = np.zeros(n, bool)
            mask[inds] = True
            instance_label = relabel_instances(instance_label, inds)
        return xyz, rgb, semantic_label, instance_label

    def transform_test(self, xyz, rgb, semantic_label, instance_label):
        if not self.x4_split:
            return super().transform_test(xyz, rgb, semantic_label,
                                          instance_label)
        # interleave-split into 4 pseudo-batch-items; merged back after the
        # backbone by merge_4_parts
        inds = np.arange(len(xyz))
        pieces = [inds[i::4] for i in range(4)]
        xyz_aug = augment_xyz(xyz, self.rng)
        coords, middles, rgbs, sems, insts = [], [], [], [], []
        for b, piece in enumerate(pieces):
            mid = xyz_aug[piece]
            sc = mid * self.voxel_cfg.scale
            sc = sc - sc.min(0)
            coords.append(
                np.concatenate([np.full((len(sc), 1), b), sc], axis=1))
            middles.append(mid)
            rgbs.append(rgb[piece])
            sems.append(semantic_label[piece])
            insts.append(instance_label[piece])
        coords = np.concatenate(coords)
        instance_label = relabel_instances(
            np.concatenate(insts), np.ones(len(coords), bool))
        return (coords, np.concatenate(middles), np.concatenate(rgbs),
                np.concatenate(sems), instance_label)

    def __getitem__(self, index):
        if self.training or not self.x4_split:
            return super().__getitem__(index)
        # x4_split test: transform already returns batched coords
        import os.path as osp2
        filename = self.filenames[index]
        scan_id = osp2.basename(filename).replace(self.suffix, '')
        data = self.load(filename)
        coords, middles, rgbs, sems, inst = self.transform_test(*data)
        from .synthetic import instance_info
        inst = inst.astype(np.int32)
        n_inst, pointnum, inst_cls, offsets = instance_info(
            middles, inst, sems)
        return dict(
            scan_id=scan_id,
            coord=np.floor(coords[:, 1:]).astype(np.int64),
            coord4=np.floor(coords).astype(np.int64),
            coord_float=middles.astype(np.float32),
            feat=rgbs.astype(np.float32),
            semantic_label=sems.astype(np.int64),
            instance_label=inst,
            inst_num=n_inst,
            inst_pointnum=pointnum,
            inst_cls=inst_cls,
            pt_offset_label=offsets.astype(np.float32),
        )

    def collate_fn(self, samples):
        if self.training or not self.x4_split:
            return super().collate_fn(samples)
        # single scan, 4 pseudo batch items; batch_idxs stay 0 (grouping runs
        # on merged points, `s3dis.py:80-115`)
        s = samples[0]
        coords = s['coord4'].astype(np.int32)
        spatial_shape = np.clip(coords[:, 1:].max(0) + 1,
                                self.voxel_cfg.spatial_shape[0], None)
        return dict(
            scan_ids=[s['scan_id']],
            coords=coords,
            coords_float=s['coord_float'],
            feats=s['feat'],
            semantic_labels=s['semantic_label'],
            instance_labels=s['instance_label'],
            pt_offset_labels=s['pt_offset_label'],
            instance_pointnum=s['inst_pointnum'],
            instance_cls=s['inst_cls'],
            spatial_shape=spatial_shape,
            batch_size=4,
            x4_split=True,
        )
