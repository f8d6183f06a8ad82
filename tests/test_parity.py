"""Activation parity against an independent torch oracle of the reference
network semantics (VERDICT round-1 missing #1 / task 2).

No spconv or released checkpoint is available in this environment, so the
oracle exploits a mathematical identity instead: on a FULLY-DENSE voxel grid,
submanifold convolution == dense cross-correlation (all sites active; missing
neighbours at the boundary == zero padding), the k2s2 strided sparse conv ==
dense strided conv, and the inverse conv == dense transposed conv.  torch's
`F.conv3d` / `F.conv_transpose3d` are therefore exact oracles for the spconv
layers the reference stacks (`softgroup/model/blocks.py:44-143`), and a
dense-tensor re-implementation of the reference module tree (BN eps=1e-4,
pre-activation residual blocks, recursive UBlock, MLP heads) is an exact
oracle for the whole backbone.

The test builds a random state_dict in the REFERENCE checkpoint format
(spconv2 OKKKI kernels, torch Linear (out, in), BN running stats — the layout
`tools/convert_checkpoint.py:11-29` documents), imports it with
`util.checkpoint.import_reference_weights`, runs our production forward
(voxelize -> rulebooks -> sparse U-Net -> devoxelize -> heads) on a dense 8^3
scene, and asserts the point-wise semantic scores / offsets match the torch
oracle to f32 tolerance.  This grounds, in one shot: the importer's key
translation and layout conversion, tap enumeration order, missing-neighbour
zero semantics, masked-BN eval semantics, and head wiring.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from softgroup_tpu.data.padding import build_scene_batch
from softgroup_tpu.model.softgroup import Capacities, SoftGroupNet
from softgroup_tpu.util.checkpoint import import_reference_weights
from softgroup_tpu.util.config import Config

BN_EPS = 1e-4  # reference: functools.partial(nn.BatchNorm1d, eps=1e-4)


# ---------------------------------------------------------------------------
# Reference-format state_dict generator
# ---------------------------------------------------------------------------

def _bn(rng, sd, prefix, c):
    sd[f'{prefix}.weight'] = rng.randn(c).astype(np.float32) * 0.2 + 1.0
    sd[f'{prefix}.bias'] = rng.randn(c).astype(np.float32) * 0.1
    sd[f'{prefix}.running_mean'] = rng.randn(c).astype(np.float32) * 0.1
    sd[f'{prefix}.running_var'] = (rng.rand(c).astype(np.float32) * 0.5
                                   + 0.7)


def _spconv(rng, sd, key, cout, k, cin):
    sd[key] = (rng.randn(cout, k, k, k, cin)
               / np.sqrt(k ** 3 * cin)).astype(np.float32)


def _linear(rng, sd, prefix, cout, cin):
    sd[f'{prefix}.weight'] = (rng.randn(cout, cin)
                              / np.sqrt(cin)).astype(np.float32)
    sd[f'{prefix}.bias'] = rng.randn(cout).astype(np.float32) * 0.05


def _resblock(rng, sd, prefix, cin, cout):
    _bn(rng, sd, f'{prefix}conv_branch.0', cin)
    _spconv(rng, sd, f'{prefix}conv_branch.2.weight', cout, 3, cin)
    _bn(rng, sd, f'{prefix}conv_branch.3', cout)
    _spconv(rng, sd, f'{prefix}conv_branch.5.weight', cout, 3, cout)
    if cin != cout:
        _spconv(rng, sd, f'{prefix}i_branch.0.weight', cout, 1, cin)


def _ublock(rng, sd, prefix, planes, block_reps=2):
    p0 = planes[0]
    for i in range(block_reps):
        _resblock(rng, sd, f'{prefix}blocks.block{i}.', p0, p0)
    if len(planes) > 1:
        p1 = planes[1]
        _bn(rng, sd, f'{prefix}conv.0', p0)
        _spconv(rng, sd, f'{prefix}conv.2.weight', p1, 2, p0)
        _ublock(rng, sd, f'{prefix}u.', planes[1:], block_reps)
        _bn(rng, sd, f'{prefix}deconv.0', p1)
        _spconv(rng, sd, f'{prefix}deconv.2.weight', p0, 2, p1)
        for i in range(block_reps):
            _resblock(rng, sd, f'{prefix}blocks_tail.block{i}.',
                      2 * p0 if i == 0 else p0, p0)


def _mlp(rng, sd, prefix, cin, cout, normed=True):
    _linear(rng, sd, f'{prefix}.0', cin, cin)
    if normed:
        _bn(rng, sd, f'{prefix}.1', cin)
        _linear(rng, sd, f'{prefix}.3', cout, cin)
    else:
        _linear(rng, sd, f'{prefix}.2', cout, cin)


def make_ref_state_dict(rng, in_ch, channels, num_blocks, sem_classes,
                        inst_classes=None):
    """Random reference-format checkpoint (key names + tensor layouts as the
    released SoftGroup .pth files; `tools/convert_checkpoint.py:11-29`)."""
    sd = {}
    c = channels
    _spconv(rng, sd, 'input_conv.0.weight', c, 3, in_ch)
    _ublock(rng, sd, 'unet.', [c * (i + 1) for i in range(num_blocks)])
    _bn(rng, sd, 'output_layer.0', c)
    _mlp(rng, sd, 'semantic_linear', c, sem_classes)
    _mlp(rng, sd, 'offset_linear', c, 3)
    if inst_classes is not None:
        _ublock(rng, sd, 'tiny_unet.', [c, 2 * c])
        _bn(rng, sd, 'tiny_unet_outputlayer.0', c)
        _linear(rng, sd, 'cls_linear', inst_classes + 1, c)
        _mlp(rng, sd, 'mask_linear', c, inst_classes + 1, normed=False)
        _linear(rng, sd, 'iou_score_linear', inst_classes + 1, c)
    return sd


# ---------------------------------------------------------------------------
# Dense torch oracle of the reference network (eval mode)
# ---------------------------------------------------------------------------

class TorchDenseOracle:
    """Reference SoftGroup backbone on a dense grid: every voxel active, so
    spconv layers reduce to dense torch convs (module tree and layer order
    mirror `softgroup/model/blocks.py` / `softgroup.py:56-69,363-378`)."""

    def __init__(self, sd):
        self.sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def bn(self, x, prefix):  # x (1, C, D, D, D), eval-mode BatchNorm1d
        s = self.sd
        sh = (1, -1, 1, 1, 1)
        return ((x - s[f'{prefix}.running_mean'].view(sh))
                / torch.sqrt(s[f'{prefix}.running_var'].view(sh) + BN_EPS)
                * s[f'{prefix}.weight'].view(sh)
                + s[f'{prefix}.bias'].view(sh))

    def conv(self, x, key, k, stride, padding):
        w = self.sd[key].permute(0, 4, 1, 2, 3)  # OKKKI -> (O, I, k, k, k)
        return F.conv3d(x, w, stride=stride, padding=padding)

    def deconv(self, x, key):
        w = self.sd[key].permute(4, 0, 1, 2, 3)  # OKKKI -> (I, O, k, k, k)
        return F.conv_transpose3d(x, w, stride=2)

    def resblock(self, x, prefix, cout):
        if x.shape[1] == cout:
            identity = x
        else:
            identity = self.conv(x, f'{prefix}i_branch.0.weight', 1, 1, 0)
        y = F.relu(self.bn(x, f'{prefix}conv_branch.0'))
        y = self.conv(y, f'{prefix}conv_branch.2.weight', 3, 1, 1)
        y = F.relu(self.bn(y, f'{prefix}conv_branch.3'))
        y = self.conv(y, f'{prefix}conv_branch.5.weight', 3, 1, 1)
        return y + identity

    def ublock(self, x, prefix, planes, block_reps=2):
        for i in range(block_reps):
            x = self.resblock(x, f'{prefix}blocks.block{i}.', planes[0])
        if len(planes) > 1:
            y = F.relu(self.bn(x, f'{prefix}conv.0'))
            y = self.conv(y, f'{prefix}conv.2.weight', 2, 2, 0)
            y = self.ublock(y, f'{prefix}u.', planes[1:], block_reps)
            y = F.relu(self.bn(y, f'{prefix}deconv.0'))
            y = self.deconv(y, f'{prefix}deconv.2.weight')
            x = torch.cat([x, y], dim=1)
            for i in range(block_reps):
                x = self.resblock(x, f'{prefix}blocks_tail.block{i}.',
                                  planes[0])
        return x

    def mlp(self, x, prefix, normed=True):  # x (N, C)
        s = self.sd
        y = x @ s[f'{prefix}.0.weight'].T + s[f'{prefix}.0.bias']
        if normed:
            y = ((y - s[f'{prefix}.1.running_mean'])
                 / torch.sqrt(s[f'{prefix}.1.running_var'] + BN_EPS)
                 * s[f'{prefix}.1.weight'] + s[f'{prefix}.1.bias'])
            fin = f'{prefix}.3'
        else:
            fin = f'{prefix}.2'
        y = F.relu(y)
        return y @ self.sd[f'{fin}.weight'].T + self.sd[f'{fin}.bias']

    def backbone(self, x, channels, num_blocks, sem_classes):
        """x (1, in_ch, D, D, D) -> per-voxel (D^3, sem) scores, (D^3, 3)
        offsets, (D^3, C) output feats, flattened in grid C-order."""
        x = self.conv(x, 'input_conv.0.weight', 3, 1, 1)
        x = self.ublock(x, 'unet.',
                        [channels * (i + 1) for i in range(num_blocks)])
        x = F.relu(self.bn(x, 'output_layer.0'))
        n = x.shape[2] * x.shape[3] * x.shape[4]
        feats = x.reshape(1, x.shape[1], n)[0].T  # (D^3, C) grid C-order
        sem = self.mlp(feats, 'semantic_linear')
        off = self.mlp(feats, 'offset_linear')
        return sem, off, feats


# ---------------------------------------------------------------------------
# The parity test
# ---------------------------------------------------------------------------

D = 8
CH = 4
NB = 3
SEM = 6
IN_CH = 6  # 3 colors + 3 coords (with_coords)

CFG = Config(dict(
    channels=CH, num_blocks=NB, semantic_classes=SEM, instance_classes=4,
    semantic_only=True, ignore_label=-100, with_coords=True,
    grouping_cfg=dict(score_thr=0.2, radius=0.3, mean_active=50,
                      class_numpoint_mean=[-1.0] * SEM, npoint_thr=10,
                      ignore_classes=[0, 1]),
    instance_voxel_cfg=dict(scale=10, spatial_shape=10),
    train_cfg=dict(max_proposal_num=8, pos_iou_thr=0.5),
    test_cfg=dict(x4_split=False, cls_score_thr=0.001, mask_score_thr=-0.5,
                  min_npoint=10, eval_tasks=['semantic']),
))

CAPS = Capacities(points=1024, voxels=(1024, 256, 64),
                  grouping_points=1024, proposals=8, proposal_entries=1024,
                  instances=8, inst_voxels=(512, 128))


def _dense_scene(rng):
    """One point per voxel of a dense D^3 grid, in grid C-order."""
    g = np.stack(np.meshgrid(np.arange(D), np.arange(D), np.arange(D),
                             indexing='ij'), axis=-1).reshape(-1, 3)
    coords = np.concatenate(
        [np.zeros((len(g), 1), np.int64), g], axis=1).astype(np.int32)
    colors = rng.randn(len(g), 3).astype(np.float32)
    coords_float = (g.astype(np.float32) / 10.0
                    + rng.randn(len(g), 3).astype(np.float32) * 0.01)
    return coords, colors, coords_float


class TestActivationParity:

    @pytest.fixture(scope='class')
    def setup(self):
        rng = np.random.RandomState(7)
        sd = make_ref_state_dict(rng, IN_CH, CH, NB, SEM)
        coords, colors, coords_float = _dense_scene(rng)
        n = len(coords)
        batch = build_scene_batch(
            coords, coords_float, colors,
            np.zeros(n, np.int32), np.zeros(n, np.int32),
            np.zeros((n, 3), np.float32), np.asarray([n], np.int32),
            np.asarray([2], np.int32), np.asarray([D, D, D]), CAPS,
            num_levels=NB)
        # bf16=False: parity is an f32-exactness test (production bf16 is a
        # deliberate approximation, tested elsewhere)
        net = SoftGroupNet(channels=CH, num_blocks=NB, semantic_classes=SEM,
                           instance_classes=4, semantic_only=True,
                           bf16=False)
        variables = jax.jit(lambda key, b: net.init(
            key, b, CFG, CAPS, method=net.test_forward))(
                jax.random.PRNGKey(0), batch)
        return rng, sd, batch, net, variables, coords, colors, coords_float

    def test_import_covers_every_leaf(self, setup):
        """Every parameter/batch_stat of the backbone net must translate to
        a reference key and import (a silent miss would leave random init
        in place and break AP parity undetected)."""
        _, sd, _, _, variables, *_ = setup
        msgs = []

        class Rec:
            def info(self, m):
                msgs.append(m)

        import_reference_weights(variables, sd, logger=Rec())
        bad = [m for m in msgs if 'missing' in m or 'mismatch' in m]
        assert not bad, bad
        n_leaves = len(jax.tree_util.tree_leaves(variables))
        assert any(f'loaded {n_leaves}/{n_leaves}' in m for m in msgs), msgs

    def test_backbone_activations_match_torch_oracle(self, setup):
        rng, sd, batch, net, variables, coords, colors, coords_float = setup
        imported = import_reference_weights(variables, sd)
        out = net.apply(imported, batch, CFG, CAPS, method=net.test_forward)
        n = len(coords)
        sem = np.asarray(out['semantic_scores'])[:n]
        off = np.asarray(out['pt_offsets'])[:n]

        # torch oracle on the dense grid (grid C-order == our point order)
        x = np.concatenate([colors, coords_float], axis=1)  # (N, in_ch)
        dense = torch.from_numpy(
            x.T.reshape(1, IN_CH, D, D, D).astype(np.float32))
        with torch.no_grad():
            sem_t, off_t, _ = TorchDenseOracle(sd).backbone(
                dense, CH, NB, SEM)
        np.testing.assert_allclose(sem, sem_t.numpy(), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(off, off_t.numpy(), rtol=2e-3, atol=2e-4)

    def test_full_net_import_covers_instance_heads(self, setup):
        """Key translation for tiny_unet + cls/mask/iou heads (the full
        released checkpoints carry these too)."""
        rng, _, batch, _, _, *_ = setup
        sd = make_ref_state_dict(np.random.RandomState(8), IN_CH, CH, NB,
                                 SEM, inst_classes=4)
        cfg = Config(dict(CFG.to_dict(), semantic_only=False,
                          test_cfg=dict(CFG.test_cfg.to_dict(),
                                        eval_tasks=['semantic', 'instance'])))
        net = SoftGroupNet(channels=CH, num_blocks=NB, semantic_classes=SEM,
                           instance_classes=4, semantic_only=False,
                           bf16=False)
        # eval_shape: the test only checks KEY TRANSLATION coverage, which
        # needs leaf shapes/dtypes, not values — skips the full-pipeline
        # compile (~30 s on the CI host)
        variables = jax.eval_shape(lambda key, b: net.init(
            key, b, cfg, CAPS, method=net.test_forward),
            jax.random.PRNGKey(0), batch)
        msgs = []

        class Rec:
            def info(self, m):
                msgs.append(m)

        import_reference_weights(variables, sd, logger=Rec())
        bad = [m for m in msgs if 'missing' in m or 'mismatch' in m]
        assert not bad, bad
        n_leaves = len(jax.tree_util.tree_leaves(variables))
        assert any(f'loaded {n_leaves}/{n_leaves}' in m for m in msgs), msgs


class TestRefinementParity:
    """Full-pipeline refinement-stage activations vs the torch dense oracle
    (VERDICT r03 missing #3): clusters_voxelization + tiny U-Net +
    cls/mask/iou heads with reference-format imported weights.

    Construction: two proposals whose points fill a dense spatial_shape^3
    grid one-to-one after the reference cluster scaling
    (`clusters_voxelization`, softgroup.py:655-709, no rand_quantize at
    test time) — on that dense grid the tiny sparse U-Net equals dense
    torch convs, the per-voxel mask head equals a flat MLP, and
    `global_pool` (softgroup.py:519-521: mean over the cluster's VOXEL
    features) equals a dense mean, so torch is an exact f32 oracle for the
    whole refinement stage."""

    D2 = 8          # instance_voxel_cfg.spatial_shape
    NPROP = 2
    PMAX = 4

    @pytest.fixture(scope='class')
    def refine(self):
        from softgroup_tpu.model.softgroup import (Proposals,
                                                   clusters_voxelization)
        rng = np.random.RandomState(11)
        d = self.D2
        g = np.stack(np.meshgrid(np.arange(d), np.arange(d), np.arange(d),
                                 indexing='ij'), axis=-1).reshape(-1, 3)
        npts = len(g) * self.NPROP
        # intra-cell jitter keeps every scaled coordinate strictly inside
        # its cell: the (0,0,0) anchor point carries the strictly smallest
        # intra offset (0.25) so the per-axis cluster minimum is the anchor
        # on every axis, and every other point's scaled coordinate lands in
        # g + [0.2, 0.3] — never on a floor() boundary
        coords, feats = [], []
        for p in range(self.NPROP):
            intra = 0.5 + 0.1 * (rng.rand(len(g), 3) - 0.5)
            intra[0] = 0.25   # g[0] == (0, 0, 0)
            off = rng.rand(3) * 3.0
            coords.append((g + intra) / 10.0 + off)
        coords_float = np.concatenate(coords).astype(np.float32)
        feats = rng.randn(npts, CH).astype(np.float32)

        entry_pt = np.arange(npts, dtype=np.int32)
        entry_seg = np.repeat(np.arange(self.NPROP), len(g)).astype(np.int32)
        props = Proposals(
            entry_pt=jnp.asarray(entry_pt),
            entry_seg=jnp.asarray(entry_seg),
            entry_valid=jnp.ones(npts, bool),
            n_proposals=jnp.int32(self.NPROP),
            prop_valid=jnp.asarray(np.arange(self.PMAX) < self.NPROP))
        caps = Capacities(points=npts, voxels=(npts,),
                          grouping_points=npts, proposals=self.PMAX,
                          proposal_entries=npts, instances=4,
                          inst_voxels=(2048, 512))
        vox_feats, levels, entry_p2v = clusters_voxelization(
            props, jnp.asarray(feats), jnp.asarray(coords_float),
            scale=10.0, spatial_shape=d, caps=caps)

        sd = make_ref_state_dict(np.random.RandomState(12), IN_CH, CH, NB,
                                 SEM, inst_classes=4)
        net = SoftGroupNet(channels=CH, num_blocks=NB, semantic_classes=SEM,
                           instance_classes=4, semantic_only=False,
                           bf16=False)
        variables = jax.jit(lambda key: net.init(
            key, vox_feats, levels, entry_p2v,
            props.entry_seg, props.entry_valid, self.PMAX, False,
            method=net.instance_head))(jax.random.PRNGKey(0))
        imported = import_reference_weights(variables, sd)
        cls_s, iou_s, mask_s = net.apply(
            imported, vox_feats, levels, entry_p2v, props.entry_seg,
            props.entry_valid, self.PMAX, False, method=net.instance_head)
        return (sd, g, feats, props, levels, entry_p2v,
                np.asarray(cls_s), np.asarray(iou_s), np.asarray(mask_s))

    def test_cluster_grid_is_reference_formula(self, refine):
        """Every entry must land in its own voxel at the grid cell the
        reference scaling assigns (one-to-one by construction)."""
        _, g, _, props, levels, entry_p2v, *_ = refine
        lv0 = levels[0]
        vox_coords = np.asarray(lv0.vox_coords)
        vox_valid = np.asarray(lv0.vox_valid)
        d = self.D2
        assert int(vox_valid.sum()) == self.NPROP * d ** 3
        p2v = np.asarray(entry_p2v)
        seg = np.asarray(props.entry_seg)
        got = vox_coords[p2v]
        expect = np.concatenate([g] * self.NPROP)
        assert np.array_equal(got[:, 0], seg)
        assert np.array_equal(got[:, 1:], expect)
        # bijection: no two entries share a voxel
        assert len(np.unique(p2v)) == len(p2v)

    def test_refinement_matches_torch_oracle(self, refine):
        (sd, g, feats, props, levels, entry_p2v, cls_s, iou_s,
         mask_s) = refine
        d = self.D2
        oracle = TorchDenseOracle(sd)
        dense = np.zeros((self.NPROP, CH, d, d, d), np.float32)
        seg = np.asarray(props.entry_seg)
        for e in range(len(seg)):
            x, y, z = g[e % len(g)]
            dense[seg[e], :, x, y, z] = feats[e]
        with torch.no_grad():
            t = torch.from_numpy(dense)
            t = oracle.ublock(t, 'tiny_unet.', [CH, 2 * CH])
            t = F.relu(oracle.bn(t, 'tiny_unet_outputlayer.0'))
            flat = t.reshape(self.NPROP, CH, -1).permute(0, 2, 1) \
                .reshape(-1, CH)                       # (P*d^3, CH) C-order
            mask_t = oracle.mlp(flat, 'mask_linear', normed=False)
            pooled = t.reshape(self.NPROP, CH, -1).mean(dim=2)
            cls_t = (pooled @ oracle.sd['cls_linear.weight'].T
                     + oracle.sd['cls_linear.bias'])
            iou_t = (pooled @ oracle.sd['iou_score_linear.weight'].T
                     + oracle.sd['iou_score_linear.bias'])
        np.testing.assert_allclose(cls_s[:self.NPROP], cls_t.numpy(),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(iou_s[:self.NPROP], iou_t.numpy(),
                                   rtol=2e-3, atol=2e-4)
        # per-entry mask scores: entry e sits at grid cell g[e % d^3] of
        # proposal seg[e] — oracle flat index = seg*d^3 + C-order(g)
        lin = (g[:, 0] * d + g[:, 1]) * d + g[:, 2]
        idx = seg * d ** 3 + np.concatenate([lin] * self.NPROP)
        np.testing.assert_allclose(mask_s, mask_t.numpy()[idx],
                                   rtol=2e-3, atol=2e-4)


class TestConvLayoutParity:
    """Layer-level pins of the spconv conventions through the importer:
    tap enumeration (C-order over coordinate axes), cross-correlation (not
    flipped-kernel convolution), strided-conv parent mapping, transposed-conv
    tap indexing."""

    def _dense_vox(self, rng, d=6):
        g = np.stack(np.meshgrid(np.arange(d), np.arange(d), np.arange(d),
                                 indexing='ij'), axis=-1).reshape(-1, 3)
        return np.concatenate(
            [np.zeros((len(g), 1), np.int64), g], axis=1).astype(np.int32)

    def test_subm_matches_dense_conv3d(self, rng):
        from softgroup_tpu.ops.rulebook import build_subm_rules_np
        from softgroup_tpu.ops.sparse_conv import subm_conv
        from softgroup_tpu.util.checkpoint import _convert
        d, cin, cout = 6, 5, 7
        vox = self._dense_vox(rng, d)
        rules = jnp.asarray(build_subm_rules_np(vox, np.asarray([d, d, d])))
        w_ref = rng.randn(cout, 3, 3, 3, cin).astype(np.float32)  # OKKKI
        w_ours = _convert(w_ref, (27, cin, cout))
        assert w_ours is not None
        feats = rng.randn(len(vox), cin).astype(np.float32)
        ours = np.asarray(subm_conv(jnp.asarray(feats),
                                    jnp.asarray(w_ours), rules))
        dense = torch.from_numpy(feats.T.reshape(1, cin, d, d, d).copy())
        wt = torch.from_numpy(w_ref).permute(0, 4, 1, 2, 3)
        ref = F.conv3d(dense, wt, padding=1)[0].reshape(cout, -1).T.numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_down_matches_strided_conv3d(self, rng):
        from softgroup_tpu.ops.rulebook import build_downsample_np
        from softgroup_tpu.ops.sparse_conv import down_conv
        from softgroup_tpu.util.checkpoint import _convert
        d, cin, cout = 6, 5, 7
        vox = self._dense_vox(rng, d)
        coarse, down_rules, _, _ = build_downsample_np(vox)
        w_ref = rng.randn(cout, 2, 2, 2, cin).astype(np.float32)
        w_ours = _convert(w_ref, (8, cin, cout))
        feats = rng.randn(len(vox), cin).astype(np.float32)
        ours = np.asarray(down_conv(jnp.asarray(feats), jnp.asarray(w_ours),
                                    jnp.asarray(down_rules)))
        dense = torch.from_numpy(feats.T.reshape(1, cin, d, d, d).copy())
        wt = torch.from_numpy(w_ref).permute(0, 4, 1, 2, 3)
        ref_d = F.conv3d(dense, wt, stride=2)[0].numpy()  # (cout, d/2^3)
        # coarse voxel order is sorted-key == grid C-order on a dense grid
        h = d // 2
        ref = ref_d.reshape(cout, -1).T
        assert np.array_equal(coarse[:, 1:],
                              np.stack(np.meshgrid(*([np.arange(h)] * 3),
                                                   indexing='ij'),
                                       axis=-1).reshape(-1, 3))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_inverse_matches_conv_transpose3d(self, rng):
        from softgroup_tpu.ops.rulebook import build_downsample_np
        from softgroup_tpu.ops.sparse_conv import inverse_conv
        from softgroup_tpu.util.checkpoint import _convert
        d, cin, cout = 6, 5, 7
        vox = self._dense_vox(rng, d)
        h = d // 2
        coarse, _, parent_idx, child_tap = build_downsample_np(vox)
        w_ref = rng.randn(cout, 2, 2, 2, cin).astype(np.float32)
        w_ours = _convert(w_ref, (8, cin, cout))
        feats_c = rng.randn(len(coarse), cin).astype(np.float32)
        ours = np.asarray(inverse_conv(jnp.asarray(feats_c),
                                       jnp.asarray(w_ours),
                                       jnp.asarray(parent_idx),
                                       jnp.asarray(child_tap)))
        dense = torch.from_numpy(feats_c.T.reshape(1, cin, h, h, h).copy())
        wt = torch.from_numpy(w_ref).permute(4, 0, 1, 2, 3)  # (I, O, k,k,k)
        ref = F.conv_transpose3d(dense, wt, stride=2)[0] \
            .reshape(cout, -1).T.numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
