"""Dataset factories — equivalents of `softgroup/data/__init__.py:12-54`."""

from .custom import CustomDataset
from .kitti import KITTIDataset
from .loader import DataLoader, EpochSampler
from .padding import build_scene_batch, default_capacities, round_capacity
from .s3dis import S3DISDataset
from .scannetv2 import ScanNetDataset
from .stpls3d import STPLS3DDataset

DATASETS = {
    'scannetv2': ScanNetDataset,
    's3dis': S3DISDataset,
    'stpls3d': STPLS3DDataset,
    'kitti': KITTIDataset,
}


def build_dataset(cfg, logger=None):
    cfg = dict(cfg)
    dtype = cfg.pop('type')
    if dtype not in DATASETS:
        raise ValueError(f'unknown dataset type {dtype}')
    return DATASETS[dtype](logger=logger, **cfg)


def build_dataloader(dataset, batch_size=1, num_workers=0, training=True,
                     rank=0, world=1, post=None):
    if not training:
        assert batch_size == 1, 'test mode requires batch_size 1'
    return DataLoader(dataset, batch_size=batch_size,
                      num_workers=num_workers, rank=rank, world=world,
                      shuffle=training, drop_last=training, post=post)


__all__ = [
    'CustomDataset', 'ScanNetDataset', 'S3DISDataset', 'STPLS3DDataset',
    'KITTIDataset', 'DataLoader', 'EpochSampler', 'build_dataset',
    'build_dataloader', 'build_scene_batch', 'default_capacities',
    'round_capacity', 'DATASETS',
]
