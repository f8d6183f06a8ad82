"""Synthetic scene generator — used by tests and bench.py.

Generates ScanNet-like scenes (floor/wall stuff classes + blob instances of
thing classes) with exact offset labels, in the same tuple layout the real
datasets produce, so the whole pipeline can be exercised without dataset
downloads.
"""

from __future__ import annotations

import numpy as np


def make_scene(rng: np.random.RandomState, n_points: int = 20000,
               n_instances: int = 8, room: float | None = None,
               semantic_classes: int = 20, thing_start: int = 2):
    """Returns (xyz, rgb, semantic_label, instance_label) float32/int32.

    Default room size scales with n_points to keep ScanNet-like density
    (~8000 points/m^2 -> ~3 points per 2 cm voxel), so voxel counts and
    pyramid shrink factors behave like real scans.
    """
    if room is None:
        room = max(float(np.sqrt(n_points / 8000.0)), 1.0)
    n_stuff = n_points // 3
    n_thing = n_points - n_stuff

    # stuff: floor (class 0) and one wall (class 1)
    floor = rng.rand(n_stuff // 2, 3).astype(np.float32) * [room, room, 0.05]
    wall = rng.rand(n_stuff - n_stuff // 2, 3).astype(np.float32) \
        * [room, 0.05, 2.5]
    stuff = np.concatenate([floor, wall])
    stuff_sem = np.concatenate([
        np.zeros(len(floor), np.int32), np.ones(len(wall), np.int32)])

    # things: gaussian-ish blobs
    counts = rng.multinomial(n_thing, np.ones(n_instances) / n_instances)
    pts, sem, inst = [], [], []
    for i, c in enumerate(counts):
        c = max(int(c), 10)
        center = rng.rand(3).astype(np.float32) * [room, room, 1.5] + [0, 0, 0.3]
        size = rng.rand(3).astype(np.float32) * 0.4 + 0.15
        blob = center + rng.randn(c, 3).astype(np.float32) * size / 2
        pts.append(blob)
        cls = thing_start + int(rng.randint(semantic_classes - thing_start))
        sem.append(np.full(c, cls, np.int32))
        inst.append(np.full(c, i, np.int32))

    xyz = np.concatenate([stuff] + pts).astype(np.float32)
    semantic = np.concatenate([stuff_sem] + sem)
    instance = np.concatenate(
        [np.full(len(stuff), -100, np.int32)] + inst)
    rgb = (rng.rand(len(xyz), 3).astype(np.float32) * 2 - 1)
    return xyz, rgb, semantic, instance


def instance_info(xyz: np.ndarray, instance_label: np.ndarray,
                  semantic_label: np.ndarray):
    """Per-instance sizes/classes and per-point offset-to-centroid labels —
    semantics of `CustomDataset.getInstanceInfo` (custom.py:76-90)."""
    n_inst = max(int(instance_label.max()) + 1, 0)
    pt_mean = np.full((len(xyz), 3), -100.0, np.float32)
    pointnum, cls = [], []
    for i in range(n_inst):
        mask = instance_label == i
        pt_mean[mask] = xyz[mask].mean(0)
        pointnum.append(int(mask.sum()))
        cls.append(int(semantic_label[mask][0]))
    offsets = pt_mean - xyz
    return (n_inst, np.asarray(pointnum, np.int32), np.asarray(cls, np.int32),
            offsets)


def collate_scenes(scenes, scale: float = 50.0, min_spatial: int = 128):
    """Concatenate scenes into the reference collate layout
    (`custom.py:191-256`): voxel coords with batch idx in column 0,
    instance ids offset per scan, clipped spatial shape."""
    coords, coords_float, feats, sems, insts, offs = [], [], [], [], [], []
    pointnum, icls = [], []
    total_inst = 0
    for b, (xyz, rgb, sem, inst) in enumerate(scenes):
        xyz_scaled = xyz * scale
        xyz_scaled = xyz_scaled - xyz_scaled.min(0)
        n_i, pn, ic, off = instance_info(xyz, inst, sem)
        inst_shift = np.where(inst >= 0, inst + total_inst, inst)
        total_inst += n_i
        c = np.concatenate(
            [np.full((len(xyz), 1), b), xyz_scaled.astype(np.int64)], 1)
        coords.append(c)
        coords_float.append(xyz)
        feats.append(rgb)
        sems.append(sem)
        insts.append(inst_shift)
        offs.append(off)
        pointnum.append(pn)
        icls.append(ic)
    coords = np.concatenate(coords).astype(np.int32)
    spatial = np.clip(coords[:, 1:].max(0) + 1, min_spatial, None)
    return dict(
        coords=coords,
        coords_float=np.concatenate(coords_float),
        feats=np.concatenate(feats),
        semantic_labels=np.concatenate(sems),
        instance_labels=np.concatenate(insts),
        pt_offset_labels=np.concatenate(offs),
        instance_pointnum=np.concatenate(pointnum) if total_inst else
        np.zeros((0,), np.int32),
        instance_cls=np.concatenate(icls) if total_inst else
        np.zeros((0,), np.int32),
        spatial_shape=spatial,
    )
