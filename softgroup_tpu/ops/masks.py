"""Proposal/instance IoU matrices and mask labels.

TPU-native equivalents of the reference's CUDA kernels in
`softgroup/ops/src/cal_iou_and_masklabel/cal_iou_and_masklabel.cu`:
`get_mask_iou_on_cluster` (:9-34), `get_mask_iou_on_pred` (:36-68) and
`get_mask_label` (:70-104).  Proposals arrive as a static-capacity CSR
(entry point indices + entry segment ids + validity) and all counting becomes
2-D scatter-adds that XLA turns into sorted segment reductions — no per-block
point loops, no atomics.

Exact reference semantics preserved: the +1e-5 IoU denominator, mask gating
at sigmoid > 0.5, the argmax-gt scan that skips ignored-class instances with
a strict `>` against an initial 0 (first maximum wins), and -1 "ignore"
labels for proposals whose best IoU is below `iou_thr`.
"""

from __future__ import annotations

import jax.numpy as jnp


def _intersections(entry_seg, entry_inst, weights, n_proposals, n_instances):
    """Scatter (entry -> (proposal, instance)) weighted counts into a
    (n_proposals, n_instances) matrix; out-of-range ids land in a dropped
    dustbin row/col."""
    seg = jnp.clip(entry_seg, 0, n_proposals)
    inst = jnp.where((entry_inst >= 0) & (entry_inst < n_instances),
                     entry_inst, n_instances)
    mat = jnp.zeros((n_proposals + 1, n_instances + 1), jnp.float32)
    mat = mat.at[seg, inst].add(weights)
    return mat[:n_proposals, :n_instances]


def mask_iou_on_cluster(entry_pt: jnp.ndarray, entry_seg: jnp.ndarray,
                        entry_valid: jnp.ndarray, instance_labels: jnp.ndarray,
                        instance_pointnum: jnp.ndarray, n_proposals: int):
    """IoU between each proposal's point set and each gt instance.

    entry_pt:  (S,) point index per CSR entry
    entry_seg: (S,) proposal id per CSR entry
    instance_labels: (P,) per-point gt instance id or ignore (<0)
    instance_pointnum: (I,) gt instance sizes
    """
    n_inst = instance_pointnum.shape[0]
    w = entry_valid.astype(jnp.float32)
    ent_inst = instance_labels[jnp.clip(entry_pt, 0, instance_labels.shape[0] - 1)]
    inter = _intersections(jnp.where(entry_valid, entry_seg, n_proposals),
                           ent_inst, w, n_proposals, n_inst)
    prop_total = jnp.zeros((n_proposals + 1,), jnp.float32).at[
        jnp.where(entry_valid, entry_seg, n_proposals)].add(w)[:n_proposals]
    union = prop_total[:, None] + instance_pointnum[None, :].astype(jnp.float32) \
        - inter
    return inter / (union + 1e-5)


def mask_iou_on_pred(entry_pt, entry_seg, entry_valid, instance_labels,
                     instance_pointnum, mask_scores_sigmoid, n_proposals: int):
    """Same IoU but proposal membership gated by mask_scores_sigmoid > 0.5
    (`cal_iou_and_masklabel.cu:36-68`)."""
    n_inst = instance_pointnum.shape[0]
    gate = entry_valid & (mask_scores_sigmoid > 0.5)
    w = gate.astype(jnp.float32)
    ent_inst = instance_labels[jnp.clip(entry_pt, 0, instance_labels.shape[0] - 1)]
    inter = _intersections(jnp.where(gate, entry_seg, n_proposals),
                           ent_inst, w, n_proposals, n_inst)
    prop_total = jnp.zeros((n_proposals + 1,), jnp.float32).at[
        jnp.where(gate, entry_seg, n_proposals)].add(w)[:n_proposals]
    union = prop_total[:, None] + instance_pointnum[None, :].astype(jnp.float32) \
        - inter
    return inter / (union + 1e-5)


def mask_label(entry_pt, entry_seg, entry_valid, instance_labels, instance_cls,
               proposals_iou, iou_thr: float, ignore_label: int = -100):
    """Per-CSR-entry binary mask target, or -1 = ignore
    (`cal_iou_and_masklabel.cu:70-104`).

    For each proposal: the argmax-IoU gt among instances whose class is not
    ignored (strict `>` vs. initial 0 — ties keep the earliest); if that IoU
    >= iou_thr, entries are labelled 1 where the point belongs to that gt,
    else 0; proposals below the threshold keep -1 everywhere.
    """
    n_proposals, n_inst = proposals_iou.shape
    allowed = (instance_cls != ignore_label)[None, :]
    iou_m = jnp.where(allowed, proposals_iou, 0.0)
    # strict-> semantics: argmax returns the first maximal index, and an
    # all-zero row returns 0 — exactly the CUDA loop's (max_iou=0, max_ind=0)
    max_ind = jnp.argmax(iou_m, axis=1)
    max_iou = jnp.take_along_axis(iou_m, max_ind[:, None], axis=1)[:, 0]

    seg = jnp.clip(entry_seg, 0, n_proposals - 1)
    assigned = max_iou[seg] >= iou_thr
    ent_inst = instance_labels[jnp.clip(entry_pt, 0, instance_labels.shape[0] - 1)]
    member = (ent_inst == max_ind[seg]).astype(jnp.float32)
    out = jnp.where(assigned & entry_valid, member, -1.0)
    return out
