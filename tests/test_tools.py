"""Standalone-tool tests: detection mAP (VOC protocol) and visualization
colorizing — equivalents of the reference `tools/eval_det.py` /
`tools/visualization.py`."""

from __future__ import annotations

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from tools.eval_det import box_iou_aabb, eval_det, eval_det_cls, voc_ap  # noqa: E402
from tools.visualization import get_coords_color, write_ply  # noqa: E402


class TestEvalDet:

    def test_box_iou(self):
        a = np.array([0, 0, 0, 2, 2, 2], float)
        b = np.array([1, 1, 1, 3, 3, 3], float)
        assert abs(box_iou_aabb(a, b) - 1 / 15) < 1e-9
        assert box_iou_aabb(a, a) == 1.0
        assert box_iou_aabb(a, a + 10) == 0.0

    def test_voc_ap_perfect(self):
        assert voc_ap(np.array([1.0]), np.array([1.0])) == 1.0

    def test_eval_det_cls(self):
        gt = {'s0': [np.array([0, 0, 0, 1, 1, 1], float)],
              's1': [np.array([0, 0, 0, 1, 1, 1], float)]}
        pred = {
            's0': [(np.array([0, 0, 0, 1, 1, 1], float), 0.9)],   # hit
            's1': [(np.array([5, 5, 5, 6, 6, 6], float), 0.8)],   # miss
        }
        rec, prec, ap = eval_det_cls(pred, gt, ovthresh=0.25)
        assert rec[-1] == 0.5
        assert 0.4 < ap <= 0.5

    def test_eval_det_multiclass(self):
        box = np.array([0, 0, 0, 1, 1, 1], float)
        pred_all = {'s0': [('chair', box, 0.9), ('table', box + 5, 0.8)]}
        gt_all = {'s0': [('chair', box), ('table', box + 5)]}
        aps = eval_det(pred_all, gt_all, ovthresh=0.5)
        assert aps['chair'] == 1.0 and aps['table'] == 1.0

    def test_voc_ap_07_metric(self):
        """11-point interpolation (reference tools/eval_det.py:16-24):
        rec=[0.5], prec=[1.0] -> points 0.0..0.5 contribute 1.0 each."""
        ap07 = voc_ap(np.array([0.5]), np.array([1.0]), use_07_metric=True)
        assert abs(ap07 - 6 / 11) < 1e-9
        # perfect detector: both metrics agree at 1.0 (up to fp summation)
        assert abs(voc_ap(np.array([1.0]), np.array([1.0]),
                          use_07_metric=True) - 1.0) < 1e-9

    def test_eval_sphere_missing_class_and_07(self):
        from tools.eval_det import eval_sphere
        box = np.array([0, 0, 0, 1, 1, 1], float)
        pred_all = {'s0': [('chair', box, 0.9)]}
        gt_all = {'s0': [('chair', box), ('table', box + 5)]}
        rec, prec, ap = eval_sphere(pred_all, gt_all, ovthresh=0.5)
        assert ap['chair'] == 1.0
        assert ap['table'] == 0          # never predicted -> 0, no KeyError
        r7, p7, a7 = eval_sphere(pred_all, gt_all, ovthresh=0.5,
                                 use_07_metric=True)
        assert abs(a7['chair'] - 1.0) < 1e-9

    def test_custom_iou_func(self):
        """get_iou_func plumbs through (sphere-style IoU parity hook)."""
        calls = []

        def fake_iou(a, b):
            calls.append(1)
            return 1.0 if np.allclose(a, b) else 0.0

        box = np.array([0, 0, 0, 1, 1, 1], float)
        aps = eval_det({'s0': [('c', box, 0.9)]}, {'s0': [('c', box)]},
                       ovthresh=0.5, get_iou_func=fake_iou)
        assert aps['c'] == 1.0 and calls


class TestVisualization:

    def _results(self, tmp_path, n=50):
        rng = np.random.RandomState(0)
        for sub, arr in (
                ('coords', rng.rand(n, 3).astype(np.float32)),
                ('semantic_pred', rng.randint(0, 20, n)),
                ('semantic_label', rng.randint(-100, 20, n)),
                ('offset_pred', rng.randn(n, 3).astype(np.float32))):
            d = tmp_path / sub
            d.mkdir(exist_ok=True)
            np.save(d / 'room0.npy', arr)
        # pred_instance: reference txt format 'relpath label_id conf'
        pi = tmp_path / 'pred_instance'
        (pi / 'predicted_masks').mkdir(parents=True)
        mask = np.zeros(n, np.int64)
        mask[:10] = 1
        np.savetxt(pi / 'predicted_masks' / 'room0_000.txt', mask, fmt='%d')
        with open(pi / 'room0.txt', 'w') as f:
            f.write('predicted_masks/room0_000.txt 5 0.91\n')
        return str(tmp_path)

    def test_tasks_and_ply(self, tmp_path):
        root = self._results(tmp_path)
        for task in ('input', 'semantic_pred', 'semantic_gt',
                     'offset_semantic_pred', 'instance_pred'):
            xyz, color = get_coords_color(root, 'room0', task)
            assert xyz.shape == (50, 3) and color.shape == (50, 3)
            assert (color >= 0).all() and (color <= 255).all()
        # instance mask points get a palette color, background stays gray
        xyz, color = get_coords_color(root, 'room0', 'instance_pred')
        assert not (color[0] == 100).all()
        assert (color[-1] == 100).all()
        out = tmp_path / 'o.ply'
        write_ply(str(out), xyz, color)
        head = out.read_text().splitlines()
        assert head[0] == 'ply' and 'element vertex 50' in head[2]
        assert len(head) == 10 + 50
