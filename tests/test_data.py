"""Data-pipeline tests: transforms, dataset adapters, collate.

The reference has no tests (SURVEY.md §4); these pin the transform semantics
that matter for metric parity with `softgroup/data/custom.py` — the fixed
0.35*pi test-time rotation, crop invariants, instance relabeling, per-dataset
label shifts (-2 scannet / -1 stpls3d / -11 kitti), and the collate layout
(batch idx in coords[:, 0], cross-scan instance id offsetting).
"""

from __future__ import annotations

import numpy as np
import pytest

from softgroup_tpu.data.custom import CustomDataset
from softgroup_tpu.data.kitti import KITTIDataset
from softgroup_tpu.data.scannetv2 import ScanNetDataset
from softgroup_tpu.data.stpls3d import STPLS3DDataset
from softgroup_tpu.data.synthetic import instance_info, make_scene
from softgroup_tpu.data.transforms import (augment_xyz, crop_to_size,
                                           elastic_distort,
                                           relabel_instances)
from softgroup_tpu.util.config import Config


class TestTransforms:

    def test_elastic_zero_magnitude_is_identity(self, rng):
        x = rng.rand(500, 3).astype(np.float32) * 100
        out = elastic_distort(x.copy(), 6, 0.0, rng)
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_elastic_displacement_bounded_and_seeded(self):
        x = (np.random.RandomState(1).rand(2000, 3) * 200).astype(np.float32)
        a = elastic_distort(x.copy(), 6, 40.0, np.random.RandomState(7))
        b = elastic_distort(x.copy(), 6, 40.0, np.random.RandomState(7))
        np.testing.assert_array_equal(a, b)
        # triple box-blur of unit gaussians keeps |field| well under ~1
        assert np.abs(a - x).max() < 40.0
        assert np.abs(a - x).max() > 0.0

    def test_augment_fixed_rotation_when_rot_off(self, rng):
        """rot=False applies the deterministic 0.35*pi z-rotation that the
        released checkpoints expect (custom.py:103-107)."""
        xyz = rng.rand(100, 3)
        out = augment_xyz(xyz.copy(), rng)
        c, s = np.cos(0.35 * np.pi), np.sin(0.35 * np.pi)
        m = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])
        np.testing.assert_allclose(out, xyz @ m, atol=1e-12)
        # pure rotation: norms preserved
        np.testing.assert_allclose(np.linalg.norm(out, axis=1),
                                   np.linalg.norm(xyz, axis=1), atol=1e-9)

    def test_augment_flip_only_negates_x(self):
        xyz = np.random.RandomState(3).rand(50, 3)
        # flip draws randint(0,2)*2-1 in {-1, 1}; find a seed for each sign
        seen = set()
        for seed in range(20):
            out = augment_xyz(xyz.copy(), np.random.RandomState(seed),
                              flip=True)
            base = augment_xyz(xyz.copy(), np.random.RandomState(seed))
            ratio = out[:, 0] / base[:, 0]
            # after the same fixed rotation, flip shows up as x negation
            # applied before rotation; just check result is one of the two
            flipped = augment_xyz((xyz * [-1, 1, 1]).copy(),
                                  np.random.RandomState(seed))
            if np.allclose(out, base):
                seen.add(1)
            elif np.allclose(out, flipped):
                seen.add(-1)
            del ratio
        assert seen == {1, -1}

    def test_crop_respects_capacity_and_bounds(self, rng):
        xyz = rng.rand(20000, 3) * 700.0
        out, valid = crop_to_size(xyz, 5000, 512, rng)
        assert valid.sum() <= 5000
        kept = out[valid]
        assert (kept.min(1) >= 0).all()
        assert (kept < 512).all(axis=1).all()

    def test_crop_noop_when_under_capacity(self, rng):
        xyz = rng.rand(100, 3) * 50.0
        out, valid = crop_to_size(xyz, 1000, 512, rng)
        assert valid.all()
        np.testing.assert_array_equal(out, xyz)

    def test_relabel_instances_dense_ids(self):
        inst = np.array([5, 5, -100, 9, 2, 9, -100], np.int32)
        valid = np.array([1, 1, 1, 1, 0, 1, 1], bool)
        out = relabel_instances(inst, valid)
        assert out.tolist() == [0, 0, -100, 1, 1, -100]
        assert out.dtype == inst.dtype


class TestDatasetAdapters:

    def test_label_shifts(self):
        cls = np.array([-100, 2, 5, 19], np.int32)
        np.testing.assert_array_equal(
            ScanNetDataset.label_shift(None, cls), [-100, 0, 3, 17])
        np.testing.assert_array_equal(
            STPLS3DDataset.label_shift(None, cls), [-100, 1, 4, 18])
        np.testing.assert_array_equal(
            KITTIDataset.label_shift(None, np.array([-100, 11, 18])),
            [-100, 0, 7])

    def test_scannet_class_count(self):
        assert len(ScanNetDataset.CLASSES) == 18
        assert len(ScanNetDataset.NYU_ID) == 18
        assert len(STPLS3DDataset.CLASSES) == 14

    def test_instance_info_offsets(self, rng):
        xyz = rng.rand(200, 3).astype(np.float32)
        inst = np.repeat(np.arange(4), 50).astype(np.int32)
        inst[:10] = -100
        sem = np.full(200, 7, np.int32)
        n, pointnum, icls, offs = instance_info(xyz, inst, sem)
        assert n == 4
        assert pointnum[0] == 40 and all(p == 50 for p in pointnum[1:])
        # offset label = instance centroid - point; points with no instance
        # keep the -100 centroid sentinel (reference getInstanceInfo,
        # custom.py:76-90 — the loss masks them by instance label)
        m1 = inst == 1
        np.testing.assert_allclose(offs[m1], xyz[m1].mean(0) - xyz[m1],
                                   atol=1e-6)
        np.testing.assert_allclose(offs[inst < 0], -100.0 - xyz[inst < 0],
                                   atol=1e-5)


def _mini_dataset(tmp_path, n_scans=2, n_points=3000):
    import torch
    rng = np.random.RandomState(0)
    d = tmp_path / 'train'
    d.mkdir(exist_ok=True)
    for i in range(n_scans):
        xyz, rgb, sem, inst = make_scene(rng, n_points=n_points,
                                         n_instances=5)
        torch.save((xyz, rgb, sem.astype(np.float64),
                    inst.astype(np.float64)),
                   d / f'scene{i:04d}_00_inst_nostuff.pth')
    voxel_cfg = Config(dict(scale=50, spatial_shape=[128, 512],
                            max_npoint=2500, min_npoint=500))
    return str(tmp_path), voxel_cfg


class TestDatasetEndToEnd:

    def test_getitem_and_collate_train(self, tmp_path):
        root, voxel_cfg = _mini_dataset(tmp_path)
        ds = CustomDataset(root, 'train', '_inst_nostuff.pth',
                           voxel_cfg=voxel_cfg, training=True, seed=0)
        assert len(ds) == 2
        samples = [ds[i] for i in range(2)]
        for s in samples:
            assert s is not None
            p = len(s['coord'])
            assert p <= voxel_cfg.max_npoint
            assert s['coord'].min() >= 0
            assert s['pt_offset_label'].shape == (p, 3)
            assert len(s['inst_pointnum']) == s['inst_num']
        batch = ds.collate_fn(samples)
        n0 = len(samples[0]['coord'])
        # batch idx in coords[:, 0]
        assert (batch['coords'][:n0, 0] == 0).all()
        assert (batch['coords'][n0:, 0] == 1).all()
        # instance ids offset across scans: scan 1's ids start after scan 0's
        i1 = batch['instance_labels'][n0:]
        pos = i1[i1 >= 0]
        if len(pos):
            assert pos.min() >= samples[0]['inst_num']
        assert batch['spatial_shape'].min() >= voxel_cfg.spatial_shape[0]
        assert batch['batch_size'] == 2

    def test_getitem_test_mode_keeps_all_points(self, tmp_path):
        root, voxel_cfg = _mini_dataset(tmp_path)
        ds = CustomDataset(root, 'train', '_inst_nostuff.pth',
                           voxel_cfg=voxel_cfg, training=False, seed=0)
        s = ds[0]
        assert len(s['coord']) == 3000  # no crop at test time
        assert s['coord'].min() >= 0

    def test_repeat(self, tmp_path):
        root, voxel_cfg = _mini_dataset(tmp_path)
        ds = CustomDataset(root, 'train', '_inst_nostuff.pth',
                           voxel_cfg=voxel_cfg, training=True, repeat=3,
                           seed=0)
        assert len(ds) == 6


class TestKITTI:

    def _dataset(self, tmp_path, training=False):
        import shutil
        rng = np.random.RandomState(0)
        root = tmp_path / 'kitti'
        # the shipped metadata is the dataset interface contract
        (root).mkdir(exist_ok=True)
        shutil.copy('dataset/kitti/semantic-kitti.yaml',
                    root / 'semantic-kitti.yaml')
        seq = root / 'sequences' / '08' / 'velodyne'  # 08 = val split
        seq.mkdir(parents=True)
        (root / 'sequences' / '08' / 'labels').mkdir()
        n = 3000
        xyz = (rng.rand(n, 3).astype(np.float32) * 40 - 20)
        rem = rng.rand(n, 1).astype(np.float32)
        np.concatenate([xyz, rem], 1).tofile(seq / '000000.bin')
        # labels: raw semantic id in low 16 bits, instance in high 16
        raw_sem = rng.choice([0, 10, 30, 40, 50, 70], size=n)  # car/person...
        inst_id = rng.randint(1, 4, size=n)
        raw = (raw_sem | (inst_id << 16)).astype(np.int32)
        raw.tofile(root / 'sequences' / '08' / 'labels' / '000000.label')
        voxel_cfg = Config(dict(scale=20, spatial_shape=[128, 512],
                                max_npoint=2800, min_npoint=100))
        return KITTIDataset(data_root=str(root), prefix='val', suffix='.bin',
                            voxel_cfg=voxel_cfg, training=training, seed=0)

    def test_load_remap_and_item(self, tmp_path):
        """.bin/.label IO, learning_map remap (stuff 0..10, things 11..18,
        ignore -100), instance compaction, and the sequence-scoped scan id
        (reference kitti.py:62-90)."""
        ds = self._dataset(tmp_path)
        xyz, rem, sem, inst = ds.load(ds.filenames[0])
        assert rem.shape == (3000, 1)
        assert set(np.unique(sem)) <= set([-100] + list(range(19)))
        # raw 10 = car -> thing class 11; raw 40 = road -> stuff 0
        # raw 0 = unlabeled -> -100
        assert (sem[sem > 10] >= 11).all()
        assert (inst[sem <= 10] == -100).all()
        item = ds[0]
        assert item is not None
        assert item['scan_id'].startswith('sequences')
        # instances compacted to dense 0..K-1
        pos = item['instance_label'][item['instance_label'] >= 0]
        if len(pos):
            assert set(np.unique(pos)) == set(range(int(pos.max()) + 1))
        # label_shift maps thing classes to 0-based instance-class range
        icls = item['inst_cls']
        assert ((icls == -100) | ((icls >= 0) & (icls < 8))).all()


class TestS3DISSplit:

    def _dataset(self, tmp_path, x4_split):
        import torch
        from softgroup_tpu.data.s3dis import S3DISDataset
        rng = np.random.RandomState(0)
        d = tmp_path / 'train'
        d.mkdir(exist_ok=True)
        xyz, rgb, sem, inst = make_scene(rng, n_points=4000, n_instances=5)
        torch.save((xyz, rgb, sem.astype(np.float64),
                    inst.astype(np.float64)),
                   d / 'Area_5_office_1_inst_nostuff.pth')
        voxel_cfg = Config(dict(scale=50, spatial_shape=[128, 512],
                                max_npoint=3500, min_npoint=500))
        return S3DISDataset(x4_split=x4_split, data_root=str(tmp_path),
                            prefix='train/Area_5', suffix='_inst_nostuff.pth',
                            voxel_cfg=voxel_cfg, training=False, seed=0)

    def test_x4_split_parts_and_batch_coords(self, tmp_path):
        """x4_split test scans carry a part id (i % 4, the reference's 4
        interleaved pseudo-batch items, `softgroup.py:380-409`); collate puts
        the part in the voxel batch coordinate but keeps grouping batch 0
        (one merged scene)."""
        ds = self._dataset(tmp_path, x4_split=True)
        item = ds[0]
        n = len(item['coord'])
        np.testing.assert_array_equal(item['part'], np.arange(n) % 4)
        batch = ds.collate_fn([item])
        assert batch['x4_split'] is True
        np.testing.assert_array_equal(batch['coords'][:, 0], item['part'])
        assert (batch['grouping_batch_idxs'] == 0).all()
        # per-part min subtraction: every part starts at coordinate 0
        for k in range(4):
            m = item['part'] == k
            assert (item['coord'][m].min(0) <= 1).all()

    def test_no_split_is_plain_batch(self, tmp_path):
        ds = self._dataset(tmp_path, x4_split=False)
        item = ds[0]
        assert 'part' not in item
        batch = ds.collate_fn([item])
        assert 'x4_split' not in batch
        assert (batch['coords'][:, 0] == 0).all()
