"""End-to-end CLI smoke tests: train one epoch on a tiny synthetic ScanNet
dataset via tools/train.py, then evaluate the saved checkpoint via
tools/test.py — the full user workflow (the reference's only "test", SURVEY
§4, is exactly this loop)."""

from __future__ import annotations

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = osp.abspath(osp.join(osp.dirname(__file__), '..'))


def _make_dataset(root, n_scans=2, n_points=1200):
    import torch
    from softgroup_tpu.data.synthetic import make_scene
    rng = np.random.RandomState(0)
    for split, count in (('train', n_scans), ('val', 1)):
        d = osp.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            xyz, rgb, sem, inst = make_scene(rng, n_points=n_points,
                                             n_instances=4,
                                             semantic_classes=20)
            torch.save((xyz, rgb, sem.astype(np.float64),
                        inst.astype(np.float64)),
                       osp.join(d, f'scene{i:04d}_00_inst_nostuff.pth'))


def _make_config(tmp_path, data_root):
    cfg = {
        'model': {
            'channels': 4, 'num_blocks': 3, 'semantic_classes': 20,
            'instance_classes': 18, 'sem2ins_classes': [],
            'semantic_only': False, 'ignore_label': -100,
            'with_coords': True,
            'grouping_cfg': {
                'pair_keys': False, 'score_thr': 0.2, 'radius': 0.04,
                'mean_active': 50,
                'class_numpoint_mean': [-1.0] * 20, 'npoint_thr': 10,
                'ignore_classes': [0, 1]},
            'instance_voxel_cfg': {'scale': 50, 'spatial_shape': 20},
            'train_cfg': {'max_proposal_num': 16, 'pos_iou_thr': 0.5},
            'test_cfg': {
                'x4_split': False, 'cls_score_thr': 0.001,
                'mask_score_thr': -0.5, 'min_npoint': 10,
                'eval_tasks': ['semantic', 'instance']},
        },
        'data': {
            'train': {'type': 'scannetv2', 'data_root': data_root,
                      'prefix': 'train', 'suffix': '_inst_nostuff.pth',
                      'training': True, 'repeat': 1,
                      'voxel_cfg': {'scale': 50,
                                    'spatial_shape': [128, 512],
                                    'max_npoint': 2000,
                                    'min_npoint': 100}},
            'test': {'type': 'scannetv2', 'data_root': data_root,
                     'prefix': 'val', 'suffix': '_inst_nostuff.pth',
                     'training': False, 'with_label': True,
                     'voxel_cfg': {'scale': 50, 'spatial_shape': [128, 512],
                                   'max_npoint': 2000, 'min_npoint': 100}},
        },
        'dataloader': {'train': {'batch_size': 2, 'num_workers': 0},
                       'test': {'batch_size': 1, 'num_workers': 0}},
        'optimizer': {'type': 'Adam', 'lr': 0.004},
        'tpu': {
            'num_levels': 3,
            'caps': {'points': 4096, 'voxels': [4096, 4096, 4096],
                     'grouping_points': 8192, 'proposals': 16,
                     'proposal_entries': 4096, 'instances': 32,
                     'inst_voxels': [2048, 512], 'grouping_cells': 4096},
            'bf16': False,
        },
        'epochs': 1, 'step_epoch': 1, 'save_freq': 4,
        'work_dir': str(tmp_path / 'work'),
    }
    path = tmp_path / 'tiny.yaml'
    with open(path, 'w') as f:
        yaml.safe_dump(cfg, f)
    return str(path)


def _run(cmd, cwd=REPO, timeout=540):
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               XLA_FLAGS='--xla_force_host_platform_device_count=1')
    # the session's TPU plugin registers via sitecustomize whenever this is
    # set, overriding JAX_PLATFORMS — drop it so CLI subprocesses stay on CPU
    env.pop('PALLAS_AXON_POOL_IPS', None)
    return subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                          text=True, timeout=timeout)


@pytest.mark.slow
def test_train_then_test_cli(tmp_path):
    data_root = str(tmp_path / 'data')
    _make_dataset(data_root)
    cfg_path = _make_config(tmp_path, data_root)

    r = _run([sys.executable, 'tools/train.py', cfg_path, '--skip-validate',
              '--num-devices', '1'])
    assert r.returncode == 0, r.stderr[-3000:]
    work = tmp_path / 'work'
    assert (work / 'ckpt' / 'latest').exists(), r.stderr[-2000:]
    log = (work / 'train.log').read_text()
    assert 'training done' in log

    r2 = _run([sys.executable, 'tools/test.py', cfg_path,
               '--checkpoint', str(work / 'ckpt' / 'epoch_1')])
    assert r2.returncode == 0, r2.stderr[-3000:]
    # metric lines reach stdout/log: semantic eval always runs
    blob = r2.stdout + r2.stderr
    assert 'mIoU' in blob or 'Acc' in blob, blob[-2000:]


@pytest.mark.slow
def test_train_soak_50_epochs(tmp_path):
    """Long-run training soak (VERDICT r04 missing #5): the reference recipe
    is 128 epochs with cosine-after-step LR, validation-in-training, pow-2 /
    save_freq checkpoint retention and crash-resume
    (`/root/reference/tools/train.py:34-82,198-202`,
    `softgroup/util/utils.py:55-108`).  The CLI smoke tests exercise each
    piece for 1-2 epochs; this runs the real train CLI for 50 epochs +
    resume to 52 and asserts the *interactions*:

    - retention after 50 epochs keeps exactly the pow-2 / save_freq-multiple
      epochs (plus the latest);
    - the logged per-epoch LR follows cosine-after-step (constant through
      step_epoch, non-increasing after, ~0 at the end);
    - validation-in-training ran and logged val metrics;
    - --resume restores the step counter (LR-schedule position), not just
      params: the epoch-52 checkpoint carries step == 52 * steps_per_epoch.
    """
    import json

    data_root = str(tmp_path / 'data')
    _make_dataset(data_root, n_scans=4)
    cfg_path = _make_config(tmp_path, data_root)
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg['epochs'] = 50
    cfg['step_epoch'] = 20
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(cfg, f)

    r = _run([sys.executable, 'tools/train.py', cfg_path,
              '--num-devices', '1'], timeout=1500)
    assert r.returncode == 0, r.stderr[-3000:]
    work = tmp_path / 'work'
    log = (work / 'train.log').read_text()
    assert 'training done' in log

    # ---- retention: pow-2 or save_freq multiples survive, plus latest ----
    kept = sorted(int(d.split('_')[1]) for d in os.listdir(work / 'ckpt')
                  if d.startswith('epoch_'))
    expect = sorted({e for e in range(1, 50)
                     if (e & (e - 1)) == 0 or e % 4 == 0} | {50})
    assert kept == expect, (kept, expect)
    assert (work / 'ckpt' / 'latest').read_text().strip() == 'epoch_50'

    # ---- LR curve: constant until step_epoch, cosine to ~0 at the end ----
    lrs = {}
    with open(work / 'scalars.jsonl') as f:
        for line in f:
            rec = json.loads(line)
            if rec['key'] == 'train/lr':
                lrs[rec['step']] = rec['value']
    assert set(lrs) == set(range(1, 51))
    base = cfg['optimizer']['lr']
    for e in range(1, 21):
        assert abs(lrs[e] - base) < 1e-9, (e, lrs[e])
    seq = [lrs[e] for e in range(20, 51)]
    assert all(a >= b - 1e-12 for a, b in zip(seq, seq[1:])), seq
    assert lrs[50] < 0.02 * base, lrs[50]

    # ---- validation-in-training ran (pow-2 / save_freq epochs) ----
    assert 'val mIoU' in log or 'val semantic_mIoU' in log or \
        'val Acc' in log, log[-2000:]
    with open(work / 'scalars.jsonl') as f:
        val_keys = {json.loads(line)['key'] for line in f}
    assert any(k.startswith('val/') for k in val_keys), val_keys

    # ---- resume: step counter (schedule position) survives ----
    r2 = _run([sys.executable, 'tools/train.py', cfg_path,
               '--num-devices', '1', '--resume', '--epochs', '52',
               '--skip-validate'], timeout=1500)
    assert r2.returncode == 0, r2.stderr[-3000:]
    log2 = (work / 'train.log').read_text()
    assert 'resumed at epoch 51' in log2
    import orbax.checkpoint as ocp
    raw = ocp.StandardCheckpointer().restore(str(work / 'ckpt' / 'epoch_52'))
    steps_per_epoch = 2  # 4 scans / batch_size 2
    assert int(raw['step']) == 52 * steps_per_epoch, int(raw['step'])


@pytest.mark.slow
def test_train_resume(tmp_path):
    """--resume restores the checkpoint and continues to the next epoch."""
    data_root = str(tmp_path / 'data')
    _make_dataset(data_root)
    cfg_path = _make_config(tmp_path, data_root)

    r = _run([sys.executable, 'tools/train.py', cfg_path, '--skip-validate',
              '--num-devices', '1'])
    assert r.returncode == 0, r.stderr[-3000:]
    r2 = _run([sys.executable, 'tools/train.py', cfg_path, '--skip-validate',
               '--num-devices', '1', '--resume', '--epochs', '2'])
    assert r2.returncode == 0, r2.stderr[-3000:]
    log = (tmp_path / 'work' / 'train.log').read_text()
    assert 'resumed at epoch 2' in log
    assert (tmp_path / 'work' / 'ckpt' / 'epoch_2').exists()
