"""Round-trip test for the standalone re-scoring tool (tools/eval_saved.py):
save synthetic instance results with the tools/test.py writers, re-read them
from disk, and check the offline ScanNetEval scores match the in-memory ones
exactly (reference parity: softgroup/evaluation/instance_eval_util.py:116-154
re-reads saved results for offline evaluation)."""

import importlib.util
import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, osp.join(REPO, 'tools', f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _scene(rng, n=400, n_inst=3, n_cls=4, scan_id='scene0'):
    """Synthetic per-point gt + noisy preds for one scan."""
    from softgroup_tpu.util.rle import rle_encode
    sem = rng.randint(1, n_cls + 1, n)
    inst = np.zeros(n, np.int64)
    preds = []
    for i in range(n_inst):
        sel = slice(i * (n // n_inst), (i + 1) * (n // n_inst))
        sem[sel] = (i % n_cls) + 1
        inst[sel] = i + 1
        mask = np.zeros(n, np.uint8)
        idx = np.arange(n)[sel]
        # predict ~90% of the instance
        keep = idx[rng.rand(len(idx)) < 0.9]
        mask[keep] = 1
        preds.append(dict(scan_id=scan_id, label_id=(i % n_cls) + 1,
                          conf=0.9 - 0.1 * i, pred_mask=rle_encode(mask)))
    gt = sem * 1000 + inst
    gt[inst == 0] = 0
    return preds, gt


@pytest.mark.parametrize('use_nyu', [False, True])
def test_eval_saved_roundtrip(tmp_path, use_nyu):
    from softgroup_tpu.evaluation.instance_eval import ScanNetEval
    test_tool = _load_tool('test')
    eval_saved = _load_tool('eval_saved')

    rng = np.random.RandomState(0)
    class_labels = ['a', 'b', 'c', 'd']
    nyu_id = (7, 9, 12, 33) if use_nyu else None
    nyu_inv = ({int(v): i + 1 for i, v in enumerate(nyu_id)}
               if nyu_id else None)

    scan_ids = ['scene0', 'scene1']
    all_preds, all_gts = [], []
    for sid in scan_ids:
        p, g = _scene(rng, scan_id=sid)
        all_preds.append(p)
        all_gts.append(g)

    ev = ScanNetEval(class_labels)
    direct = ev.evaluate(all_preds, all_gts, nproc=1)

    out = str(tmp_path)
    test_tool.save_pred_instances(out, 'pred_instance', scan_ids, all_preds,
                                  nyu_id)
    test_tool.save_gt_instances(out, 'gt_instance', scan_ids, all_gts,
                                nyu_id)

    re_preds = [eval_saved.load_pred(osp.join(out, 'pred_instance'), sid,
                                     nyu_inv) for sid in scan_ids]
    re_gts = [eval_saved.load_gt(
        osp.join(out, 'gt_instance', f'{sid}.txt'), nyu_inv)
        for sid in scan_ids]

    # the decoded preds/gts must be identical to the in-memory ones
    for sid, a, b in zip(scan_ids, all_gts, re_gts):
        np.testing.assert_array_equal(a, b)
    for scan_a, scan_b in zip(all_preds, re_preds):
        assert len(scan_a) == len(scan_b)
        for a, b in zip(scan_a, scan_b):
            assert a['label_id'] == b['label_id']
            assert abs(a['conf'] - b['conf']) < 1e-4

    redone = ev.evaluate(re_preds, re_gts, nproc=1)
    for cls in class_labels:
        for metric in ('ap', 'ap50%', 'ap25%'):
            va = direct['classes'][cls][metric]
            vb = redone['classes'][cls][metric]
            assert va == pytest.approx(vb, abs=1e-6, nan_ok=True), (
                cls, metric, va, vb)
    assert direct['all_ap'] == pytest.approx(redone['all_ap'], abs=1e-6)
