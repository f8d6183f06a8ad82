"""Postprocessing unit tests: instance extraction from the CSR device
outputs, gt sem*1000+inst encoding, and panoptic fusion — semantics of
`softgroup/model/softgroup.py:537-653` (get_instances / get_gt_instances /
panoptic_fusion)."""

from __future__ import annotations

import os.path as osp

import numpy as np

from softgroup_tpu.evaluation.postprocess import (get_gt_instances,
                                                  get_instances,
                                                  panoptic_fusion)
from softgroup_tpu.util.config import Config
from softgroup_tpu.util.rle import rle_decode


def _cfg(**test_overrides):
    test_cfg = dict(cls_score_thr=0.1, mask_score_thr=-0.5, min_npoint=2,
                    panoptic_skip_iou=0.5)
    test_cfg.update(test_overrides)
    return Config(dict(sem2ins_classes=[], test_cfg=test_cfg))


def _out(n_points, k, proposals):
    """Build a fake test_forward output: `proposals` is a list of
    (class_id, point_ids, cls_score, iou_score)."""
    p_max = max(len(proposals), 1)
    s_cap = 16 * p_max
    cls_scores = np.zeros((p_max, k + 1), np.float32)
    iou_scores = np.zeros((p_max, k + 1), np.float32)
    mask_scores = np.full((s_cap, k + 1), 10.0, np.float32)
    entry_pt = np.zeros((s_cap,), np.int32)
    entry_seg = np.full((s_cap,), p_max, np.int32)
    entry_valid = np.zeros((s_cap,), bool)
    cur = 0
    for pid, (ci, pts, cs, iou) in enumerate(proposals):
        cls_scores[pid, ci] = cs
        iou_scores[pid, ci] = iou
        for pt in pts:
            entry_pt[cur] = pt
            entry_seg[cur] = pid
            entry_valid[cur] = True
            cur += 1
    return dict(cls_scores=cls_scores, iou_scores=iou_scores,
                mask_scores=mask_scores, entry_pt=entry_pt,
                entry_seg=entry_seg, entry_valid=entry_valid,
                n_proposals=np.int32(len(proposals)),
                semantic_preds=np.zeros((n_points,), np.int32))


class TestGetInstances:

    def test_masks_scores_and_thresholds(self):
        out = _out(10, 3, [
            (0, [0, 1, 2], 0.9, 0.8),     # kept: conf = 0.9 * 0.8
            (1, [3, 4], 0.05, 1.0),       # dropped: cls score below thr
            (2, [5], 0.5, 0.5),           # dropped: under min_npoint
        ])
        inst = get_instances('scan0', out, 10, _cfg())
        assert len(inst) == 1
        i0 = inst[0]
        assert i0['label_id'] == 1 and i0['scan_id'] == 'scan0'
        assert abs(i0['conf'] - 0.72) < 1e-6
        mask = rle_decode(i0['pred_mask'])
        np.testing.assert_array_equal(np.nonzero(mask)[0], [0, 1, 2])

    def test_mask_score_gate(self):
        out = _out(10, 2, [(0, [0, 1, 2, 3], 0.9, 1.0)])
        # points 2,3 fail the mask gate for class 0
        out['mask_scores'][2:4, 0] = -10.0
        inst = get_instances('s', out, 10, _cfg())
        assert len(inst) == 1
        np.testing.assert_array_equal(
            np.nonzero(rle_decode(inst[0]['pred_mask']))[0], [0, 1])

    def test_iou_score_clipped(self):
        out = _out(10, 2, [(1, [0, 1, 2], 0.5, 1.7)])
        inst = get_instances('s', out, 10, _cfg())
        assert abs(inst[0]['conf'] - 0.5) < 1e-6  # iou clipped to 1

    def test_sem2ins_classes(self):
        """sem2ins classes (S3DIS floor/ceiling) emit one full-semantic-mask
        instance with conf 1 (softgroup.py:560-566)."""
        out = _out(10, 2, [])
        out['semantic_preds'][:] = np.array([0] * 6 + [1] * 4)
        cfg = _cfg()
        cfg.sem2ins_classes = [0]
        inst = get_instances('s', out, 10, cfg)
        assert len(inst) == 1
        assert inst[0]['label_id'] == 1 and inst[0]['conf'] == 1.0
        assert rle_decode(inst[0]['pred_mask']).sum() == 6


class TestGtEncoding:

    def test_sem1000_inst(self):
        sem = np.array([-100, 0, 1, 2, 5], np.int32)   # 20 sem / 18 inst
        inst = np.array([-100, -100, -100, 0, 3], np.int32)
        gt = get_gt_instances(sem, inst, 20, 18)
        # ignored points and non-instance classes (wall/floor) without an
        # instance id encode to 0
        assert gt[0] == 0
        assert gt[1] == 0 and gt[2] == 0
        # sem 2 is the first instance class -> encoded class 1, inst 0 -> +1
        assert gt[3] == 1 * 1000 + 1
        assert gt[4] == 4 * 1000 + 4


class TestPanopticFusion:

    def _inst(self, mask, label_id, conf):
        from softgroup_tpu.util.rle import rle_encode
        return dict(scan_id='s', label_id=label_id, conf=conf,
                    pred_mask=rle_encode(mask.astype(np.uint8)))

    def test_paste_order_and_packing(self):
        n = 8
        sem = np.zeros(n, np.int32)          # stuff class 0 everywhere
        m1 = np.zeros(n, np.uint8); m1[0:4] = 1
        m2 = np.zeros(n, np.uint8); m2[4:8] = 1
        preds = [self._inst(m1, 3, 0.9), self._inst(m2, 5, 0.8)]
        # kitti-shaped: 19 sem classes, 8 thing classes, things at 11..18
        cfg = _cfg(panoptic_skip_iou=0.5)
        pan = panoptic_fusion(sem, preds, cfg, 19, 8)
        cls = pan & 0xFFFF
        ids = pan >> 16
        # label_id L maps to semantic class L + (19 - 8 - 1) = L + 10
        assert (cls[0:4] == 13).all() and (ids[0:4] == 1).all()
        assert (cls[4:8] == 15).all() and (ids[4:8] == 2).all()

    def test_skip_overlapping(self):
        n = 8
        sem = np.zeros(n, np.int32)
        m1 = np.zeros(n, np.uint8); m1[0:6] = 1
        m2 = np.zeros(n, np.uint8); m2[0:5] = 1   # 5/5 overlap with m1
        preds = [self._inst(m1, 1, 0.9), self._inst(m2, 2, 0.5)]
        pan = panoptic_fusion(sem, preds, _cfg(panoptic_skip_iou=0.5),
                              19, 8)
        ids = pan >> 16
        assert set(np.unique(ids)) == {0, 1}  # second instance skipped

    def test_thing_without_instance_is_ignored(self):
        """Points semantically predicted as a thing class but covered by no
        instance get the ignore id (= semantic_classes)."""
        n = 4
        sem = np.full(n, 12, np.int32)  # a thing class (>= thing_start 11)
        pan = panoptic_fusion(sem, [], _cfg(), 19, 8)
        assert (pan == 19).all()


class TestPanopticWriter:
    """tools/test.py save_panoptic roundtrip: written .label files must
    decode back to the learned classes through the kitti learning_map
    (reference tools/test.py:91-113 + data/kitti.py remap)."""

    def test_label_file_roundtrip(self, tmp_path):
        import sys
        import yaml
        sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
        from tools.test import save_panoptic

        kitti_yaml = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                      'dataset', 'kitti', 'semantic-kitti.yaml')
        with open(kitti_yaml) as f:
            meta = yaml.safe_load(f)
        lmi = meta['learning_map_inv']
        raw_map = meta['learning_map']
        max_key = max(raw_map)
        learning_map = np.full(max_key + 1, -100, np.int64)
        for k, v in raw_map.items():
            learning_map[k] = -100 if v == 0 else (v + 10 if v < 9 else v - 9)

        num_classes = 19
        n = 64
        rng = np.random.RandomState(0)
        cls = rng.randint(0, num_classes, size=n).astype(np.uint32)
        ids = np.where(cls >= 11, rng.randint(1, 7, size=n), 0) \
            .astype(np.uint32)
        cls[5] = num_classes  # the panoptic_fusion ignore id
        ids[5] = 0
        pan = (cls & np.uint32(0xFFFF)) | (ids << np.uint32(16))

        scan_id = 'sequences/08/velodyne/000000'
        save_panoptic(str(tmp_path), 'panoptic', [scan_id], [pan], lmi,
                      num_classes)
        path = (tmp_path / 'panoptic' /
                'sequences/08/predictions/000000.label')
        assert path.exists()
        out = np.fromfile(path, dtype=np.uint32)
        assert len(out) == n
        # instance ids preserved in the high 16 bits
        assert (out >> 16 == ids).all()
        # raw semantics decode back to the learned classes
        decoded = learning_map[out & 0xFFFF]
        assert (decoded[cls < num_classes]
                == cls[cls < num_classes].astype(np.int64)).all()
        assert decoded[5] == -100  # ignore -> raw 0 -> unlabeled
