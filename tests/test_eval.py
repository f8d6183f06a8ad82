"""Evaluation protocol tests: RLE round-trip, instance AP sanity fixtures,
panoptic PQ fixtures, point-wise metrics."""

import numpy as np
import pytest

from softgroup_tpu.evaluation.instance_eval import ScanNetEval
from softgroup_tpu.evaluation.panoptic_eval import PanopticEval
from softgroup_tpu.evaluation.point_wise_eval import (evaluate_offset_mae,
                                                      evaluate_semantic_acc,
                                                      evaluate_semantic_miou)
from softgroup_tpu.evaluation.postprocess import get_gt_instances
from softgroup_tpu.util.rle import rle_decode, rle_encode


class TestRLE:

    @pytest.mark.parametrize('pattern', [
        np.zeros(50, np.uint8),
        np.ones(50, np.uint8),
        np.array([0, 1, 1, 0, 0, 1, 0, 1, 1, 1], np.uint8),
    ])
    def test_roundtrip(self, pattern):
        np.testing.assert_array_equal(rle_decode(rle_encode(pattern)),
                                      pattern)

    def test_roundtrip_random(self, rng):
        for _ in range(20):
            m = (rng.rand(rng.randint(1, 2000)) > 0.5).astype(np.uint8)
            np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)

    def test_wire_format_matches_reference_style(self):
        # 1-based (start, length) pairs of 1-runs
        rle = rle_encode(np.array([0, 1, 1, 0, 1], np.uint8))
        assert rle['counts'] == '2 2 5 1'
        assert rle['length'] == 5


def make_gt(n=1000, n_inst=4, n_cls=3):
    """Points assigned to n_inst instances (round robin over classes)."""
    gt = np.zeros(n, np.int64)
    size = n // (n_inst + 1)
    insts = []
    for i in range(n_inst):
        cls = i % n_cls + 1
        sl = slice(i * size, (i + 1) * size)
        gt[sl] = cls * 1000 + i + 1
        insts.append((sl, cls))
    return gt, insts


def mask_pred(scan, sl, n, label, conf):
    m = np.zeros(n, np.uint8)
    m[sl] = 1
    return dict(scan_id=scan, label_id=label, conf=conf, pred_mask=m)


class TestScanNetEval:

    def test_perfect_predictions(self):
        gt, insts = make_gt()
        preds = [mask_pred('s0', sl, len(gt), cls, 0.9) for sl, cls in insts]
        ev = ScanNetEval(['a', 'b', 'c'])
        avgs = ev.evaluate([preds], [gt], nproc=1)
        assert avgs['all_ap'] == pytest.approx(1.0)
        assert avgs['all_ap_50%'] == pytest.approx(1.0)
        assert avgs['all_ap_25%'] == pytest.approx(1.0)

    def test_missing_instance_halves_recall(self):
        gt, insts = make_gt(n_inst=2, n_cls=1)
        preds = [mask_pred('s0', insts[0][0], len(gt), 1, 0.9)]
        ev = ScanNetEval(['a'])
        avgs = ev.evaluate([preds], [gt], nproc=1)
        # one of two gts found with perfect mask: AP = 0.5 at all thresholds
        assert avgs['all_ap_50%'] == pytest.approx(0.5)

    def test_false_positive_lowers_ap(self):
        gt, insts = make_gt(n_inst=2, n_cls=1)
        n = len(gt)
        preds = [mask_pred('s0', sl, n, 1, 0.9) for sl, _ in insts]
        # an extra high-confidence FP on unlabeled (void=0? region id 0 ->
        # not void since class 0 not in valid ids -> ignored) — use a region
        # overlapping labeled space instead:
        fp = np.zeros(n, np.uint8)
        fp[insts[0][0]] = 1
        fp[:150] = 1
        preds.append(dict(scan_id='s0', label_id=1, conf=0.95, pred_mask=fp))
        ev = ScanNetEval(['a'])
        avgs = ev.evaluate([preds], [gt], nproc=1)
        assert avgs['all_ap_50%'] < 1.0

    def test_low_iou_is_counted_at_low_threshold_only(self):
        gt, insts = make_gt(n_inst=1, n_cls=1)
        sl = insts[0][0]
        half = slice(sl.start, sl.start + (sl.stop - sl.start) * 2 // 5)
        preds = [mask_pred('s0', half, len(gt), 1, 0.9)]  # IoU 0.4
        ev = ScanNetEval(['a'])
        avgs = ev.evaluate([preds], [gt], nproc=1)
        assert avgs['all_ap_25%'] == pytest.approx(1.0)
        assert avgs['all_ap_50%'] == pytest.approx(0.0)

    def test_rle_masks_accepted(self):
        gt, insts = make_gt()
        preds = []
        for sl, cls in insts:
            m = np.zeros(len(gt), np.uint8)
            m[sl] = 1
            preds.append(dict(scan_id='s0', label_id=cls, conf=0.9,
                              pred_mask=rle_encode(m)))
        ev = ScanNetEval(['a', 'b', 'c'])
        avgs = ev.evaluate([preds], [gt], nproc=1)
        assert avgs['all_ap'] == pytest.approx(1.0)


class TestPanopticEval:

    def test_perfect(self):
        n = 2000
        sem = np.zeros(n, np.int64)
        sem[:500] = 0          # stuff class 0
        sem[500:1000] = 1      # stuff class 1
        sem[1000:1500] = 2     # thing class (index 2)
        sem[1500:] = 2
        inst = np.full(n, -100, np.int64)
        inst[1000:1500] = 0
        inst[1500:] = 1
        # pred panoptic codes: cls | id<<16
        pan = sem.astype(np.uint32).copy()
        pan[1000:1500] |= np.uint32(1 << 16)
        pan[1500:] |= np.uint32(2 << 16)
        ev = PanopticEval(['thing'], ['stuff_a', 'stuff_b'], min_points=50)
        out = ev.evaluate([pan], [sem], [inst], nproc=1, verbose=False)
        assert out['PQ'] == pytest.approx(100.0)
        assert out['mIoU'] == pytest.approx(100.0)

    def test_split_instance_penalized(self):
        n = 1000
        sem = np.full(n, 2, np.int64)
        inst = np.zeros(n, np.int64)
        pan = sem.astype(np.uint32).copy()
        pan[:500] |= np.uint32(1 << 16)
        pan[500:] |= np.uint32(2 << 16)  # one gt split into two preds
        ev = PanopticEval(['thing'], ['s0', 's1'], min_points=50)
        out = ev.evaluate([pan], [sem], [inst], nproc=1, verbose=False)
        assert out['PQ_th'] == pytest.approx(0.0)  # both halves IoU 0.5, not > 0.5


class TestPointWise:

    def test_metrics(self):
        gt = np.array([0, 0, 1, 1, -100])
        pred = np.array([0, 1, 1, 1, 0])
        assert evaluate_semantic_acc(pred, gt) == pytest.approx(75.0)
        # class 0: inter 1 union 2 -> 50; class 1: inter 2 union 3 -> 66.67
        assert evaluate_semantic_miou(pred, gt) == pytest.approx(
            (50 + 200 / 3) / 2)
        off_gt = np.zeros((5, 3))
        off_pred = np.ones((5, 3))
        inst = np.array([0, 0, 1, -100, -100])
        assert evaluate_offset_mae(off_pred, off_gt, inst) == pytest.approx(3.0)


class TestGtEncoding:

    def test_get_gt_instances(self):
        sem = np.array([0, 1, 2, 3, 19, -100])
        inst = np.array([-100, -100, 0, 1, 2, -100])
        gt = get_gt_instances(sem, inst, semantic_classes=20,
                              instance_classes=18)
        # label_shift = 2: sem 2 -> class 1; encoded = cls*1000 + inst + 1
        assert gt[2] == 1 * 1000 + 1
        assert gt[3] == 2 * 1000 + 2
        assert gt[4] == 18 * 1000 + 3
        assert gt[0] == 0 and gt[1] == 0 and gt[5] == 0


class TestInstanceEvalUtil:
    """I/O helpers + Instance record (`instance_eval_util.py:1-154`)."""

    def test_transform_points(self):
        from softgroup_tpu.evaluation import transform_points
        pts = np.array([[1., 0, 0], [0, 2, 0]], np.float32)
        m = np.eye(4)
        m[:3, 3] = [1, 2, 3]
        out = transform_points(m, pts)
        np.testing.assert_allclose(out, pts + [1, 2, 3], atol=1e-6)

    def test_export_load_ids_roundtrip(self, tmp_path):
        from softgroup_tpu.evaluation import export_ids, load_ids
        ids = np.array([2001, 0, 3017, 2001], np.int64)
        p = tmp_path / 'ids.txt'
        export_ids(str(p), ids)
        np.testing.assert_array_equal(load_ids(str(p)), ids)

    def test_read_mesh_vertices_ascii_and_binary(self, tmp_path):
        import struct
        from softgroup_tpu.evaluation import read_mesh_vertices
        xyz = np.array([[0.5, 1.5, -2.0], [3.25, 0.0, 7.0]], np.float32)
        # ascii (the layout tools/visualization.py writes)
        pa = tmp_path / 'a.ply'
        with open(pa, 'w') as f:
            f.write('ply\nformat ascii 1.0\n'
                    f'element vertex {len(xyz)}\n'
                    'property float x\nproperty float y\nproperty float z\n'
                    'property uchar red\nproperty uchar green\n'
                    'property uchar blue\nend_header\n')
            for p in xyz:
                f.write(f'{p[0]} {p[1]} {p[2]} 10 20 30\n')
        np.testing.assert_allclose(read_mesh_vertices(str(pa)), xyz,
                                   atol=1e-6)
        # binary_little_endian with mixed property types
        pb = tmp_path / 'b.ply'
        with open(pb, 'wb') as f:
            f.write(b'ply\nformat binary_little_endian 1.0\n'
                    b'element vertex 2\n'
                    b'property float x\nproperty float y\n'
                    b'property float z\nproperty uchar red\nend_header\n')
            for p in xyz:
                f.write(struct.pack('<fffB', *p, 7))
        np.testing.assert_allclose(read_mesh_vertices(str(pb)), xyz,
                                   atol=1e-6)

    def test_instance_record_and_get_instances(self):
        from softgroup_tpu.evaluation.instance_eval_util import (
            Instance, get_instances)
        ids = np.array([2001, 2001, 2001, 3001, 0, 0], np.int64)
        inst = Instance(ids, 2001)
        assert inst.label_id == 2 and inst.vert_count == 3
        d = inst.to_dict()
        assert d['instance_id'] == 2001 and d['med_dist'] == -1
        out = get_instances(ids, [2, 3], ['chair', 'table'],
                            {2: 'chair', 3: 'table'})
        assert len(out['chair']) == 1 and out['chair'][0]['vert_count'] == 3
        assert len(out['table']) == 1 and out['table'][0]['vert_count'] == 1

    def test_export_and_read_prediction_files(self, tmp_path):
        from softgroup_tpu.evaluation import (
            export_instance_ids_for_eval, load_ids,
            read_instance_prediction_file)
        label_ids = np.array([3, 3, 5, 5, 0], np.int64)
        instance_ids = np.array([3001, 3001, 5002, 5002, 0], np.int64)
        master = tmp_path / 'scene0000_00.txt'
        export_instance_ids_for_eval(str(master), label_ids, instance_ids)
        info = read_instance_prediction_file(str(master), str(tmp_path))
        assert len(info) == 2
        for mask_file, meta in info.items():
            mask = load_ids(mask_file)
            assert mask.sum() == 2
            assert meta['conf'] == 1.0
        labels = sorted(m['label_id'] for m in info.values())
        assert labels == [3, 5]
