"""SoftGroup / SoftGroup++ model — TPU-native re-design of
`softgroup/model/softgroup.py` (reference class `SoftGroup`, :18-731).

Architecture notes (vs. the reference):
  * The network is a flax module over padded (V, C) matrices + a precomputed
    grid pyramid; there is no SparseConvTensor — geometry and compute are
    separated (see ops/geometry.py).
  * `forward_grouping` (:411-480) — reference: per-class Python loop with a
    CUDA ball query and a host BFS round-trip per class.  Here: one
    `lax.scan` over classes, each iteration compacting active points and
    running the on-device ball_cluster; everything stays in the jitted step.
  * Proposals live in a static-capacity CSR layout (entry point ids + entry
    segment ids + validity) instead of dynamically sized
    (proposals_idx, proposals_offset) pairs (:458-480).
  * `clusters_voxelization` (:655-709) re-voxelizes proposals on device via
    the same voxelize/rulebook machinery (batch dim = proposal id).
  * Losses reproduce `point_wise_loss` (:152-170) and `instance_loss`
    (:172-255) semantics exactly, with masked reductions instead of boolean
    indexing.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from ..ops.geometry import LevelGeom, Pyramid, build_pyramid
from ..ops.grouping import ball_cluster
from ..ops.masks import mask_iou_on_cluster, mask_iou_on_pred, mask_label
from ..ops.segment import (segment_max, segment_mean, segment_mean_fused,
                           segment_min, sorted_segment_minmax)
from ..ops.voxelize import devoxelize, voxel_features, voxelize
from ..util.config import getattr_or
from .blocks import MLP, Dense, MaskedBatchNorm, SubMConv, UBlock


@struct.dataclass
class SceneBatch:
    """Static-shape device batch (built by the data pipeline)."""
    pyramid: Pyramid
    feats: jax.Array          # (P, C_in) colors (noise added by pipeline)
    coords_float: jax.Array   # (P, 3) metric coords
    batch_idxs: jax.Array     # (P,) int32
    semantic_labels: jax.Array    # (P,) int32, ignore_label padded
    instance_labels: jax.Array    # (P,) int32, ignore_label padded
    pt_offset_labels: jax.Array   # (P, 3)
    instance_pointnum: jax.Array  # (I,) int32
    instance_cls: jax.Array       # (I,) int32 (ignore_label for pads)
    instance_valid: jax.Array     # (I,) bool
    vox_in: jax.Array | None = None  # (V0, C_in) host-precomputed voxel-mean
    # network input ([colors || coords_float] per with_coords) — saves the
    # device-side segment mean and the point-feature transfer
    point_perm: jax.Array | None = None  # (P,) int32: original index of
    # each (voxel-sorted) batch row.  The pipeline sorts points by p2v so
    # the devoxelize gather is monotone (kernel-eligible); hosts translate
    # per-point outputs back with out_orig[perm[:n]] = out_sorted[:n]
    # (tools_impl/test_runner.py).  None = identity (device-built batches).


class Capacities(NamedTuple):
    """Static paddings — the central TPU design knob (SURVEY.md §7 "hard
    parts"): every dynamic size in the reference becomes a capacity + mask."""
    points: int                 # P: padded point count
    voxels: tuple               # per-U-Net-level voxel caps
    grouping_points: int        # total soft-assignment entry cap (all classes)
    proposals: int              # Pmax (train: == train_cfg.max_proposal_num)
    proposal_entries: int       # S: CSR entry cap (sumNPoint analogue)
    instances: int              # I: gt instance cap
    inst_voxels: tuple          # tiny-U-Net level caps
    grouping_cells: int = 65536  # contracted-cell cap inside cell_cluster


class Proposals(NamedTuple):
    """Static-capacity CSR proposal layout (replaces proposals_idx/offset)."""
    entry_pt: jax.Array      # (S,) int32 point index per entry
    entry_seg: jax.Array     # (S,) int32 proposal id per entry (cap = invalid)
    entry_valid: jax.Array   # (S,) bool
    n_proposals: jax.Array   # () int32
    prop_valid: jax.Array    # (Pmax,) bool


class SoftGroupNet(nn.Module):
    """Parameterized part of SoftGroup: backbone U-Net + point heads + the
    top-down refinement heads (`softgroup.py:56-77`)."""
    channels: int = 32
    num_blocks: int = 7
    semantic_classes: int = 20
    instance_classes: int = 18
    semantic_only: bool = False
    fixed_modules: Sequence[str] = ()
    bf16: bool = True  # bf16 conv compute (f32 accumulate) — the TPU analogue
    # of the reference's AMP fp16 (`tools/train.py:47`, `util/fp16.py`); loss
    # heads and statistics stay f32 like force_fp32

    def setup(self):
        ch = self.channels
        self.input_conv = SubMConv(ch)
        self.unet = UBlock([ch * (i + 1) for i in range(self.num_blocks)],
                           block_reps=2)
        self.output_norm = MaskedBatchNorm(ch)
        self.semantic_linear = MLP(self.semantic_classes, norm=True,
                                   num_layers=2)
        self.offset_linear = MLP(3, norm=True, num_layers=2)
        if not self.semantic_only:
            self.tiny_unet = UBlock([ch, 2 * ch], block_reps=2)
            self.tiny_output_norm = MaskedBatchNorm(ch)
            self.cls_linear = Dense(self.instance_classes + 1)
            self.mask_linear = MLP(self.instance_classes + 1, norm=False,
                                   num_layers=2)
            self.iou_score_linear = Dense(self.instance_classes + 1)

    def _t(self, name: str, train: bool) -> bool:
        """BN of frozen modules stays in eval mode during training
        (`softgroup.py:98-104`)."""
        return train and name not in self.fixed_modules

    def backbone(self, x: jax.Array, pyramid: Pyramid, train: bool):
        """input_conv -> UBlock -> BN/ReLU -> devoxelize -> point heads
        (`forward_backbone`, softgroup.py:363-378).  ``x`` is the
        voxel-level input (V0, C_in) — see _input_voxels."""
        lv0 = pyramid.levels[0]
        if self.bf16:
            x = x.astype(jnp.bfloat16)
        x = self.input_conv(x, lv0)
        x = self.unet(x, pyramid.levels, self._t('unet', train))
        x = self.output_norm(x, lv0.vox_valid,
                             self._t('output_norm', train))
        x = nn.relu(x)
        output_feats = devoxelize(x, pyramid.p2v)
        pmask = pyramid.point_valid
        semantic_scores = self.semantic_linear(
            output_feats, pmask,
            self._t('semantic_linear', train)).astype(jnp.float32)
        pt_offsets = self.offset_linear(
            output_feats, pmask,
            self._t('offset_linear', train)).astype(jnp.float32)
        return semantic_scores, pt_offsets, output_feats

    def backbone_voxel_heads(self, x: jax.Array, pyramid: Pyramid,
                             train: bool):
        """SoftGroup++ lvl_fusion: keep voxel-level outputs, skip devoxelize
        (`softgroup.py:309-312,373-374`)."""
        lv0 = pyramid.levels[0]
        if self.bf16:
            x = x.astype(jnp.bfloat16)
        x = self.input_conv(x, lv0)
        x = self.unet(x, pyramid.levels, self._t('unet', train))
        x = self.output_norm(x, lv0.vox_valid, self._t('output_norm', train))
        x = nn.relu(x)
        vmask = lv0.vox_valid
        semantic_scores = self.semantic_linear(
            x, vmask, self._t('semantic_linear', train)).astype(jnp.float32)
        pt_offsets = self.offset_linear(
            x, vmask, self._t('offset_linear', train)).astype(jnp.float32)
        return semantic_scores, pt_offsets, x

    def instance_head(self, inst_vox_feats: jax.Array,
                      inst_levels: tuple[LevelGeom, ...], entry_p2v: jax.Array,
                      entry_seg: jax.Array, entry_valid: jax.Array,
                      n_proposal_cap: int, train: bool):
        """tiny U-Net + cls / mask / iou heads (`forward_instance`,
        softgroup.py:509-522)."""
        lv0 = inst_levels[0]
        if self.bf16:
            inst_vox_feats = inst_vox_feats.astype(jnp.bfloat16)
        x = self.tiny_unet(inst_vox_feats, inst_levels, train)
        x = self.tiny_output_norm(x, lv0.vox_valid, train)
        x = nn.relu(x)
        # per-voxel mask scores, gathered back to CSR entries (:514-515)
        mask_scores_vox = self.mask_linear(x, lv0.vox_valid, train)
        mask_scores = mask_scores_vox[
            jnp.clip(entry_p2v, 0, mask_scores_vox.shape[0] - 1)]
        # proposal-level pooled features -> cls / iou (:519-521); the voxel's
        # proposal id is its batch coordinate
        vox_seg = jnp.where(lv0.vox_valid, lv0.vox_coords[:, 0],
                            n_proposal_cap)
        pooled = segment_mean(x, vox_seg, n_proposal_cap)
        cls_scores = self.cls_linear(pooled).astype(jnp.float32)
        iou_scores = self.iou_score_linear(pooled).astype(jnp.float32)
        return cls_scores, iou_scores, mask_scores.astype(jnp.float32)

    def __call__(self, feats, pyramid, train: bool = False):
        # used for parameter initialization of the backbone path
        return self.backbone(feats, pyramid, train)

    def _input_voxels(self, batch: SceneBatch, cfg):
        """Voxel-level network input: host-precomputed when available,
        device segment mean otherwise (hand-built batches)."""
        if batch.vox_in is not None:
            return batch.vox_in
        feats = batch.feats
        if cfg.with_coords:
            feats = jnp.concatenate([feats, batch.coords_float], axis=1)
        v0 = batch.pyramid.levels[0].vox_valid.shape[0]
        return voxel_features(feats, batch.pyramid.p2v, v0)

    def loss_forward(self, batch: SceneBatch, cfg, caps: Capacities,
                     rng: jax.Array):
        """Full training forward -> (total_loss, log_vars)
        (`forward_train`, softgroup.py:112-150)."""
        sem, off, outf = self.backbone(self._input_voxels(batch, cfg),
                                       batch.pyramid, train=True)
        losses = point_wise_loss(sem, off, batch.semantic_labels,
                                 batch.instance_labels, batch.pt_offset_labels,
                                 batch.pyramid.point_valid, cfg)
        if not self.semantic_only:
            props = forward_grouping(
                jax.lax.stop_gradient(sem), jax.lax.stop_gradient(off),
                batch.batch_idxs, batch.coords_float,
                batch.pyramid.point_valid, cfg, caps)
            vox_feats, levels, entry_p2v = clusters_voxelization(
                props, outf, batch.coords_float,
                float(cfg.instance_voxel_cfg.scale),
                int(cfg.instance_voxel_cfg.spatial_shape), caps,
                rand_quantize=True, rng=rng)
            cls_scores, iou_scores, mask_scores = self.instance_head(
                vox_feats, levels, entry_p2v, props.entry_seg,
                props.entry_valid, caps.proposals, train=True)
            losses.update(instance_loss(
                cls_scores, mask_scores, iou_scores, props,
                batch.instance_labels, batch.instance_pointnum,
                batch.instance_cls, batch.instance_valid, cfg))
        return parse_losses(losses)

    def test_forward_plus(self, batch: SceneBatch, cfg, caps: Capacities):
        """SoftGroup++ lvl_fusion inference (`softgroup.py:309-312,332-341`):
        grouping and refinement run on the level-0 *voxels* (the voxel set is
        pyramid level 1); host postprocessing maps masks back to points
        through p2v."""
        from ..ops.voxelize import voxel_features
        lv0 = batch.pyramid.levels[0]
        v0 = lv0.vox_valid.shape[0]
        sem_v, off_v, outf_v = self.backbone_voxel_heads(
            self._input_voxels(batch, cfg), batch.pyramid, train=False)
        p2v = batch.pyramid.p2v
        sem_pt = sem_v[jnp.clip(p2v, 0, v0 - 1)]
        out = dict(semantic_scores=sem_pt,
                   pt_offsets=off_v[jnp.clip(p2v, 0, v0 - 1)],
                   semantic_preds=jnp.argmax(sem_pt, axis=1))
        if not self.semantic_only:
            vox_cf = voxel_features(batch.coords_float, p2v, v0)
            vox_batch = jnp.where(lv0.vox_valid, lv0.vox_coords[:, 0], 0)
            props = forward_grouping(sem_v, off_v, vox_batch, vox_cf,
                                     lv0.vox_valid, cfg, caps)
            vox_feats, levels, entry_p2v = clusters_voxelization(
                props, outf_v, vox_cf,
                float(cfg.instance_voxel_cfg.scale),
                int(cfg.instance_voxel_cfg.spatial_shape), caps)
            cls_scores, iou_scores, mask_scores = self.instance_head(
                vox_feats, levels, entry_p2v, props.entry_seg,
                props.entry_valid, caps.proposals, train=False)
            out.update(
                cls_scores=jax.nn.softmax(cls_scores.astype(jnp.float32), -1),
                iou_scores=iou_scores, mask_scores=mask_scores,
                entry_pt=props.entry_pt, entry_seg=props.entry_seg,
                entry_valid=props.entry_valid,
                n_proposals=props.n_proposals)
        return out

    def test_forward(self, batch: SceneBatch, cfg, caps: Capacities):
        """Device part of inference (`forward_test`, softgroup.py:299-361);
        host-side instance extraction / panoptic fusion live in
        evaluation/postprocess.py."""
        sem, off, outf = self.backbone(self._input_voxels(batch, cfg),
                                       batch.pyramid, train=False)
        semantic_preds = jnp.argmax(sem, axis=1)
        out = dict(semantic_scores=sem, pt_offsets=off,
                   semantic_preds=semantic_preds)
        if not self.semantic_only:
            props = forward_grouping(sem, off, batch.batch_idxs,
                                     batch.coords_float,
                                     batch.pyramid.point_valid, cfg, caps)
            vox_feats, levels, entry_p2v = clusters_voxelization(
                props, outf, batch.coords_float,
                float(cfg.instance_voxel_cfg.scale),
                int(cfg.instance_voxel_cfg.spatial_shape), caps)
            cls_scores, iou_scores, mask_scores = self.instance_head(
                vox_feats, levels, entry_p2v, props.entry_seg,
                props.entry_valid, caps.proposals, train=False)
            out.update(
                cls_scores=jax.nn.softmax(cls_scores.astype(jnp.float32), -1),
                iou_scores=iou_scores, mask_scores=mask_scores,
                entry_pt=props.entry_pt, entry_seg=props.entry_seg,
                entry_valid=props.entry_valid, n_proposals=props.n_proposals)
        return out


# ---------------------------------------------------------------------------
# Grouping (no parameters)
# ---------------------------------------------------------------------------

def _compact_ascending(mask_flat: jax.Array, n_out: int):
    """Ascending indices of True entries, padded to n_out.

    top_k over negated iota instead of nonzero (4x cheaper on TPU;
    identical ascending-index result).  Returns (idx clamped to valid
    range 0 where padded, valid mask)."""
    n = mask_flat.shape[0]
    big = jnp.int32(n)
    iota = jax.lax.iota(jnp.int32, n)
    k_top = min(n_out, n)
    idx = -jax.lax.top_k(jnp.where(mask_flat, -iota, -big), k_top)[0]
    if k_top < n_out:
        idx = jnp.concatenate(
            [idx, jnp.full((n_out - k_top,), big, jnp.int32)])
    valid = idx < big
    return jnp.where(valid, idx, 0), valid


def forward_grouping(semantic_scores: jax.Array, pt_offsets: jax.Array,
                     batch_idxs: jax.Array, coords_float: jax.Array,
                     point_valid: jax.Array, cfg: Any, caps: Any) -> Proposals:
    """Class-wise soft grouping (`forward_grouping`, softgroup.py:411-480).

    One `lax.scan` over semantic classes; each class thresholds the softmax
    scores (soft assignment — points can join several classes), compacts the
    active points, clusters their offset-shifted coordinates with
    ball_cluster, and applies the class-size threshold
    (`bfs_cluster.cpp:70-78`: absolute npoint_thr when class_numpoint_mean is
    -1, else relative).  Classes in `ignore_classes` and classes with fewer
    than test min_npoint active points yield nothing (:434-439).
    """
    p = semantic_scores.shape[0]
    n_cls = semantic_scores.shape[1]
    n_tot = caps.grouping_points  # total soft-assignment entries, all classes
    scores = jax.nn.softmax(semantic_scores.astype(jnp.float32), axis=-1)

    ignore = np.zeros((n_cls,), bool)
    for c in cfg.grouping_cfg.ignore_classes:
        ignore[c] = True
    ignore = jnp.asarray(ignore)
    numpoint_mean = jnp.asarray(cfg.grouping_cfg.class_numpoint_mean,
                                jnp.float32)
    radius = float(cfg.grouping_cfg.radius)
    score_thr = float(cfg.grouping_cfg.score_thr)
    npoint_thr = float(cfg.grouping_cfg.npoint_thr)
    min_npoint = int(cfg.test_cfg.min_npoint)

    # soft assignment: a point joins every non-ignored class whose softmax
    # score clears score_thr (:433-437); classes with too few active points
    # are dropped entirely (:438-439)
    active = (scores.T > score_thr) & point_valid[None, :] \
        & ~ignore[:, None]                                 # (C, P)
    counts = active.sum(axis=1)
    active &= (counts >= min_npoint)[:, None]

    # SoftGroup++ scene pyramid (`get_level`, reference softgroup.py:445,
    # 482-489): coarsen the grouping radius/grid on big scenes, PER CLASS
    # from each class's active count (1 / 2 / 3 at the 1e5 / 1e6
    # thresholds).  Scaling a class's entry coordinates by 1/level is
    # exactly equivalent to scaling its query radius by level — class
    # groups never interact in the fused clustering (the group key
    # separates them), so per-entry coordinate scale carries per-class
    # levels through one clustering call.
    radius_j = jnp.float32(radius)
    level_of_cls = None
    if getattr_or(cfg.grouping_cfg, 'with_pyramid', False):
        thr_lo, thr_hi = getattr_or(cfg.grouping_cfg, 'pyramid_thresholds',
                                    (100000, 1000000))
        level_of_cls = jnp.where(
            counts > thr_hi, 3.0,
            jnp.where(counts > thr_lo, 2.0, 1.0))          # (C,)

    # one fused compaction over candidate (class, point) entries.  The
    # softmax scores sum to 1, so at most floor(1/score_thr) classes can
    # strictly clear score_thr per point; +1 absorbs f32 softmax rounding
    # (a computed sum can exceed 1 by ~1e-7, which at thresholds of the
    # form 1/k could otherwise let one extra class through).  With the
    # standard thr=0.2 a per-point top-6 provably covers every active
    # entry, shrinking the compaction sort >3x (n_cls=20).
    k_cand = min(n_cls, int(np.floor(1.0 / max(score_thr, 1e-6))) + 1)
    # shift at point level first: ONE entry-level gather instead of two
    shifted_pts = coords_float + pt_offsets.astype(jnp.float32)
    # ONE wide row gather carrying the batch id as a 4th f32 column (exact
    # for < 2^24 scenes): a (E, 3) f32 gather moves a full tile per row
    # anyway, and the separate 1-D batch_idxs gather costs ~3 ms at bench
    # scale
    wide_src = jnp.concatenate(
        [shifted_pts, batch_idxs.astype(jnp.float32)[:, None]], axis=1)
    if k_cand < n_cls:
        top_s, top_c = jax.lax.top_k(scores, k_cand)      # (P, k_cand)
        # per-class gates looked up via one-hot compare (tiny tables; a
        # 1-D gather here costs ~10 ns/element)
        class_ok = (counts >= min_npoint) & ~ignore       # (C,)
        oh = top_c[:, :, None] == jnp.arange(n_cls)[None, None, :]
        ok_sel = (oh & class_ok[None, None, :]).any(-1)
        cand = (top_s > score_thr) & point_valid[:, None] & ok_sel
        idx, valid_e = _compact_ascending(cand.reshape(-1), n_tot)
        # pad entries point at the LAST row so pt_e stays non-decreasing
        # (required by the windowed gather kernel; harmless otherwise —
        # everything downstream is gated on valid_e)
        pt_e = jnp.where(valid_e, idx // k_cand, p - 1)
        from ..ops.dispatch import kernels_enabled
        if kernels_enabled() and n_tot % 256 == 0 and p >= 1024:
            # windowed monotone-gather kernel: the flat candidate index is
            # point-major, so pt_e is non-decreasing and a block of 256
            # entries reads a contiguous point window.  The class column
            # rides along (top_c per point, selected per entry below),
            # killing the separate (P*k_cand,)[idx] gather.  Sparse entry
            # patterns can overflow the window — fall back to XLA gathers.
            from ..ops.dispatch import kernel_interpret
            from ..ops.gather_kernel import (monotone_gather_f32,
                                             monotone_window_overflow)
            n_bad = monotone_window_overflow(pt_e, 256, 1024, p)
            topc_f = top_c.astype(jnp.float32)
            wide, ex = jax.lax.cond(
                n_bad == 0,
                lambda: monotone_gather_f32(wide_src, pt_e, topc_f,
                                            block_b=256, window_w=1024,
                                            interpret=kernel_interpret()),
                lambda: (wide_src[pt_e], topc_f[pt_e]))
            slot_oh = (jnp.where(valid_e, idx % k_cand, 0)[:, None]
                       == jnp.arange(k_cand)[None, :])
            cls_e = jnp.where(valid_e,
                              jnp.sum(jnp.where(slot_oh, ex, 0.0),
                                      axis=1).astype(jnp.int32), 0)
        else:
            wide = wide_src[pt_e]
            cls_e = jnp.where(valid_e, top_c.reshape(-1)[idx], 0)
    else:
        idx, valid_e = _compact_ascending(active.reshape(-1), n_tot)
        cls_e = jnp.where(valid_e, idx // p, 0)
        pt_e = jnp.where(valid_e, idx % p, 0)
        wide = wide_src[pt_e]
    shifted = wide[:, :3]
    if level_of_cls is not None:
        # per-class pyramid level as a per-entry coordinate scale
        shifted = shifted / level_of_cls[cls_e][:, None]
    group = wide[:, 3].astype(jnp.int32) * n_cls + cls_e

    # one clustering call for all classes (group key separates them).
    # Default: cell contraction (the SoftGroup++-style pyramid centroid
    # query — fast path).  grouping_cfg.exact_ball_query: point-level radius
    # graph CC (ball_cluster), the exact analogue of the reference vanilla
    # SoftGroup's ballquery_batch_p + BFS.
    m = caps.grouping_cells
    if getattr_or(cfg.grouping_cfg, 'exact_ball_query', False):
        labels = ball_cluster(shifted, group, valid_e, radius_j)
        # per-label sizes in point-index label space
        sizes = jnp.zeros((n_tot + 1,), jnp.float32).at[
            jnp.where(labels >= 0, labels, n_tot)].add(1.0)
        size_of = sizes[jnp.clip(labels, 0, n_tot - 1)]
        np_mean = numpoint_mean[cls_e]
        thr = jnp.where(np_mean == -1.0, npoint_thr, npoint_thr * np_mean)
        keep = valid_e & (labels >= 0) & (size_of >= thr)
        key = jnp.where(keep, labels, jnp.iinfo(jnp.int32).max)
        key_pt = pt_e
    else:
        from ..ops.grouping import cell_cluster_csr
        cell_scale = float(getattr_or(cfg.grouping_cfg, 'cell_scale', 1.0))
        # class-size threshold (bfs_cluster.cpp:70-78) resolved inside at
        # CELL granularity; entry labels come back already thresholded, in
        # sorted-entry order with pt_e carried through the bucketing sort —
        # no entry-scale scatter or label/size gathers at all.
        thr_cls = jnp.where(numpoint_mean == -1.0, npoint_thr,
                            npoint_thr * numpoint_mean)
        # pair_keys=False is a config opt-in for bounded scenes (ScanNet)
        # where the single-int32 linear key provably cannot overflow
        ent_label, pt_sorted = cell_cluster_csr(
            shifted, group, valid_e, pt_e, thr_cls, radius_j,
            cell_scale=cell_scale, m_cap=m,
            pair_keys=bool(getattr_or(cfg.grouping_cfg, 'pair_keys', True)))
        key = jnp.where(ent_label >= 0, ent_label,
                        jnp.iinfo(jnp.int32).max)
        key_pt = pt_sorted

    # ---- build the global static CSR (:467-480) ---------------------------
    s_cap = caps.proposal_entries
    p_max = caps.proposals
    key_s, pt_s = jax.lax.sort((key, key_pt), num_keys=1)
    valid_s = key_s != jnp.iinfo(jnp.int32).max
    prev = jnp.concatenate([jnp.full((1,), -1, key_s.dtype), key_s[:-1]])
    firsts = valid_s & (key_s != prev)
    pid = jnp.cumsum(firsts.astype(jnp.int32)) - 1
    n_proposals = jnp.minimum(jnp.maximum(pid[-1] + 1, 0), p_max)

    entry_pt = pt_s[:s_cap]
    pid = pid[:s_cap]
    entry_valid = valid_s[:s_cap] & (pid < p_max) & (pid >= 0)
    entry_seg = jnp.where(entry_valid, pid, p_max).astype(jnp.int32)
    prop_valid = jnp.arange(p_max) < n_proposals
    return Proposals(entry_pt.astype(jnp.int32), entry_seg, entry_valid,
                     n_proposals, prop_valid)


# ---------------------------------------------------------------------------
# Cluster re-voxelization (no parameters)
# ---------------------------------------------------------------------------

def clusters_voxelization(props: Proposals, feats: jax.Array,
                          coords_float: jax.Array, scale: float,
                          spatial_shape: int, caps: Any,
                          rand_quantize: bool = False,
                          rng: jax.Array | None = None):
    """Scale each proposal into a spatial_shape^3 grid and voxelize, with the
    proposal id as the batch coordinate (`clusters_voxelization`,
    softgroup.py:655-709).  Returns (vox_feats, levels, entry_p2v).
    """
    p_max = props.prop_valid.shape[0]
    ci = jnp.clip(props.entry_pt, 0, coords_float.shape[0] - 1)
    # ONE wide row gather for coords+feats: TPU row gathers move a (16, 128)
    # tile per row, so a (E, 3) f32 gather costs the same as (E, 3+C) — two
    # separate gathers would double the traffic (the narrow coords one is
    # ~2.5 ms alone at bench scale).  The custom VJP replaces the gather
    # transpose's serial scatter-add with sort + one-hot MXU segment sum
    # (the backbone grad flows through this gather when training all
    # params: ~95 -> ~12 ms at batch-4 scale).
    from ..ops.gather_kernel import gather_rows_segsum_vjp
    comb = gather_rows_segsum_vjp(
        jnp.concatenate([coords_float, feats.astype(jnp.float32)], axis=1),
        ci)
    coords = comb[:, :3]
    fe = comb[:, 3:]
    seg = jnp.where(props.entry_valid, props.entry_seg, p_max)

    # entry_seg is CSR-sorted (forward_grouping builds it from a key sort),
    # so the proposal boxes come from the dense sorted reduction instead of
    # two serial scatter-min/max passes over all entries (~8 ms saved at
    # bench scale)
    if seg.shape[0] % 128 == 0:
        cmin, cmax = sorted_segment_minmax(coords, seg, p_max)
    else:
        cmin = segment_min(coords, seg, p_max)
        cmax = segment_max(coords, seg, p_max)
    extent = jnp.max(cmax - cmin, axis=1)
    clusters_scale = 1.0 / jnp.maximum(extent / spatial_shape, 1e-12) - 0.01
    clusters_scale = jnp.minimum(clusters_scale, scale)

    cmin_s = cmin * clusters_scale[:, None]
    cmax_s = cmax * clusters_scale[:, None]
    if rand_quantize:
        # one random 3-vector shared by all clusters (:692-696)
        r1 = jax.random.uniform(rng, (3,))
        r2 = jax.random.uniform(jax.random.fold_in(rng, 1), (3,))
        rng_range = cmax_s - cmin_s
        cmin_s = cmin_s - jnp.maximum(spatial_shape - rng_range - 0.001, 0) * r1
        cmin_s = cmin_s - jnp.minimum(spatial_shape - rng_range + 0.001, 0) * r2
    # one row gather for (scale, cmin) instead of a 1-D float gather + a
    # narrow row gather (same tile-per-row argument as above)
    par = jnp.concatenate([clusters_scale[:, None], cmin_s], axis=1)
    pe = par[jnp.clip(seg, 0, p_max - 1)]
    grid = coords * pe[:, :1] - pe[:, 1:]
    grid = jnp.clip(jnp.floor(grid), 0, spatial_shape - 1).astype(jnp.int32)
    c4 = jnp.concatenate([seg[:, None].astype(jnp.int32), grid], axis=1)

    dims = jnp.full((3,), spatial_shape, jnp.int32)
    from ..ops.voxelize import voxelize_linear
    vx, ckey = voxelize_linear(c4, props.entry_valid, dims,
                               caps.inst_voxels[0])
    vox_feats = segment_mean_fused(fe, vx.p2v, caps.inst_voxels[0])
    from ..ops.dispatch import kernels_enabled
    if kernels_enabled() and spatial_shape % 2 == 0 \
            and not rand_quantize:
        # inference: keyed levels — the windowed conv kernel resolves
        # neighbours from the sorted key table in-kernel, no rulebook
        # searchsorted at all.  Training (rand_quantize=True) builds
        # explicit rulebooks once so the conv VJPs reuse them instead of
        # reconstructing rules per conv in the backward.
        levels = build_keyed_levels(vx, ckey, dims, spatial_shape,
                                    caps.inst_voxels)
    else:
        levels = build_pyramid_from_voxels(vx, ckey, dims, caps.inst_voxels)
    return vox_feats, levels, vx.p2v


def build_keyed_levels(vx, ckey, dims, spatial_shape: int, capacities):
    """Two-level keyed geometry for the tiny U-Net: sorted key tables plus
    the parent/tap maps for the inverse conv; neighbour resolution happens
    inside the keyed windowed conv kernel (ops/conv_kernel.py)."""
    from ..ops.voxelize import voxelize_linear
    d = spatial_shape
    dc = d // 2
    xyz = vx.vox_coords[:, 1:]
    child_tap = ((xyz[:, 0] & 1) * 4 + (xyz[:, 1] & 1) * 2
                 + (xyz[:, 2] & 1)).astype(jnp.int32)
    parent_coords = jnp.concatenate(
        [vx.vox_coords[:, :1], jnp.floor_divide(xyz, 2)], axis=1)
    coarse_dims = (dims + 1) // 2
    vx2, ckey2 = voxelize_linear(parent_coords, vx.vox_valid, coarse_dims,
                                 capacities[1])
    lv0 = LevelGeom(vx.vox_coords, vx.vox_valid, None, None, vx2.p2v,
                    child_tap, dims, ckey=ckey, spatial_d=d)
    lv1 = LevelGeom(vx2.vox_coords, vx2.vox_valid, None, None, None, None,
                    coarse_dims, ckey=ckey2, spatial_d=dc)
    return (lv0, lv1)


def build_pyramid_from_voxels(vx, ckey, dims, capacities):
    """Tiny-U-Net pyramid geometry from an existing device voxelization —
    linear-key fast path (proposal grids always fit int32 keys)."""
    from ..ops.rulebook import (build_downsample_linear,
                                build_subm_rules_linear)
    levels = []
    cur_coords, cur_valid, cur_key, cur_dims = (vx.vox_coords, vx.vox_valid,
                                                ckey, dims)
    for lvl in range(len(capacities)):
        subm = build_subm_rules_linear(cur_key, cur_coords, cur_valid,
                                       cur_dims)
        if lvl + 1 < len(capacities):
            (nxt_coords, nxt_valid, _, down_rules, parent_idx, child_tap,
             nxt_key, nxt_dims) = build_downsample_linear(
                 cur_coords, cur_valid, cur_dims, capacities[lvl + 1])
            levels.append(LevelGeom(cur_coords, cur_valid, subm, down_rules,
                                    parent_idx, child_tap, cur_dims))
            cur_coords, cur_valid, cur_key, cur_dims = (nxt_coords, nxt_valid,
                                                        nxt_key, nxt_dims)
        else:
            levels.append(LevelGeom(cur_coords, cur_valid, subm, None, None,
                                    None, cur_dims))
    return tuple(levels)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def point_wise_loss(semantic_scores, pt_offsets, semantic_labels,
                    instance_labels, pt_offset_labels, point_valid, cfg):
    """Semantic CE (+class weights) with ignore_index, masked offset L1
    (`point_wise_loss`, softgroup.py:152-170)."""
    ignore = cfg.ignore_label
    n_cls = semantic_scores.shape[1]
    sem_valid = point_valid & (semantic_labels != ignore)
    tgt = jnp.clip(semantic_labels, 0, n_cls - 1)
    logp = jax.nn.log_softmax(semantic_scores.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
    weight = getattr_or(cfg, 'semantic_weight', None)
    if weight is not None:
        w = jnp.asarray(weight, jnp.float32)[tgt]
    else:
        w = jnp.ones_like(ce)
    w = w * sem_valid.astype(jnp.float32)
    semantic_loss = (ce * w).sum() / jnp.maximum(w.sum(), 1e-12)

    pos = point_valid & (instance_labels != ignore)
    diff = jnp.abs(pt_offsets.astype(jnp.float32)
                   - pt_offset_labels.astype(jnp.float32))
    npos = pos.sum()
    offset_loss = jnp.where(
        npos > 0,
        (diff * pos[:, None]).sum() / jnp.maximum(npos, 1).astype(jnp.float32),
        0.0)
    return dict(semantic_loss=semantic_loss, offset_loss=offset_loss)


def instance_loss(cls_scores, mask_scores, iou_scores, props: Proposals,
                  instance_labels, instance_pointnum, instance_cls,
                  instance_valid, cfg):
    """Refinement losses (`instance_loss`, softgroup.py:172-255): proposal-gt
    assignment by IoU, CE cls loss, masked BCE mask loss, MSE IoU-score loss.
    All reductions masked so empty batches degrade to zero like the
    reference's early-out (:175-184)."""
    k = cfg.instance_classes
    p_max = props.prop_valid.shape[0]
    n_inst = instance_pointnum.shape[0]
    pos_iou_thr = float(cfg.train_cfg.pos_iou_thr)

    ious = mask_iou_on_cluster(props.entry_pt, props.entry_seg,
                               props.entry_valid, instance_labels,
                               instance_pointnum, p_max)  # (Pmax, I)

    fg = instance_valid & (instance_cls != cfg.ignore_label)
    any_fg = fg.any()
    fg_ious = jnp.where(fg[None, :], ious, -1.0)
    max_iou = fg_ious.max(axis=1)
    argmax_iou = jnp.argmax(fg_ious, axis=1)
    assigned = (max_iou >= pos_iou_thr) & props.prop_valid

    # low-quality matching (`softgroup.py:211-217`, stpls3d): each fg gt
    # claims its best proposal; later gts win ties like the reference loop.
    if getattr_or(cfg.train_cfg, 'match_low_quality', False):
        min_pos_thr = float(getattr_or(cfg.train_cfg, 'min_pos_thr', 0.0))
        col_ious = jnp.where(props.prop_valid[:, None], ious, -1.0)
        gt_max = col_ious.max(axis=0)
        gt_argmax = jnp.argmax(col_ious, axis=0)
        claim_ok = fg & (gt_max >= min_pos_thr)
        claimer = jnp.full((p_max + 1,), -1, jnp.int32).at[
            jnp.where(claim_ok, gt_argmax, p_max)].max(
                jnp.where(claim_ok, jnp.arange(n_inst, dtype=jnp.int32), -1)
        )[:p_max]
        assigned = assigned | (claimer >= 0)
        argmax_iou = jnp.where(claimer >= 0, jnp.maximum(claimer, 0),
                               argmax_iou)

    gt_cls = instance_cls[jnp.clip(argmax_iou, 0, n_inst - 1)]
    labels = jnp.where(assigned, jnp.clip(gt_cls, 0, k - 1), k)

    # cls loss: CE mean over valid proposals (:219-224)
    logp = jax.nn.log_softmax(cls_scores.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    pv = props.prop_valid.astype(jnp.float32)
    have = any_fg & (props.n_proposals > 0)
    cls_loss = jnp.where(have, (ce * pv).sum() / jnp.maximum(pv.sum(), 1.0),
                         0.0)

    # mask loss: BCE on per-entry sigmoid sliced at the assigned class
    # (:226-238); targets from mask_label, -1 rows ignored
    seg = jnp.clip(props.entry_seg, 0, p_max - 1)
    mask_cls_label = labels[seg]
    ms = jnp.take_along_axis(
        mask_scores.astype(jnp.float32), mask_cls_label[:, None], axis=1)[:, 0]
    ms_sig = jax.nn.sigmoid(ms)
    mlabel = mask_label(props.entry_pt, props.entry_seg, props.entry_valid,
                        instance_labels, instance_cls, ious, pos_iou_thr,
                        cfg.ignore_label)
    mw = ((mlabel != -1.0) & props.entry_valid).astype(jnp.float32)
    tgt = jnp.clip(mlabel, 0.0, 1.0)
    eps = 1e-12
    bce = -(tgt * jnp.log(jnp.maximum(ms_sig, eps))
            + (1 - tgt) * jnp.log(jnp.maximum(1 - ms_sig, eps)))
    mask_loss = jnp.where(have, (bce * mw).sum() / (mw.sum() + 1.0), 0.0)

    # iou score loss: MSE vs mask-gated IoU, fg proposals only (:240-250)
    ious_pred = mask_iou_on_pred(props.entry_pt, props.entry_seg,
                                 props.entry_valid, instance_labels,
                                 instance_pointnum,
                                 jax.lax.stop_gradient(ms_sig), p_max)
    fg_pred = jnp.where(fg[None, :], ious_pred, -1.0)
    gt_ious = jnp.maximum(fg_pred.max(axis=1), 0.0)
    iou_slice = jnp.take_along_axis(
        iou_scores.astype(jnp.float32), labels[:, None], axis=1)[:, 0]
    iw = ((labels < k) & props.prop_valid).astype(jnp.float32)
    iou_score_loss = jnp.where(
        have, (jnp.square(iou_slice - gt_ious) * iw).sum() / (iw.sum() + 1.0),
        0.0)

    num_pos = ((labels < k) & props.prop_valid).sum().astype(jnp.float32)
    num_neg = ((labels >= k) & props.prop_valid).sum().astype(jnp.float32)
    return dict(cls_loss=cls_loss, mask_loss=mask_loss,
                iou_score_loss=iou_score_loss, num_pos=num_pos,
                num_neg=num_neg)


def parse_losses(losses: dict):
    """Total = sum of entries whose key contains 'loss'
    (`parse_losses`, softgroup.py:257-297); cross-device averaging happens in
    the pjit train step via lax.pmean."""
    total = sum(v for k, v in losses.items() if 'loss' in k)
    log_vars = dict(losses)
    log_vars['loss'] = total
    return total, log_vars
