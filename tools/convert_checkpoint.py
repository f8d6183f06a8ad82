#!/usr/bin/env python3
"""Convert a reference SoftGroup/HAIS .pth checkpoint into an orbax
checkpoint for this framework — the cross-format import tool (reference has
the inverse-direction `tools/convert_checkpoint.py` for spconv1->2).

Usage:
    python tools/convert_checkpoint.py configs/softgroup/softgroup_scannet.yaml \
        path/to/softgroup_scannet_spconv2.pth out_dir/
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

import jax
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from softgroup_tpu.util.checkpoint import (import_reference_weights,
                                           load_reference_state_dict)
from softgroup_tpu.util.config import load_config
from softgroup_tpu.util.logger import get_root_logger


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('pth')
    p.add_argument('out')
    args = p.parse_args()
    logger = get_root_logger()
    cfg = load_config(args.config)

    from tools.train import build_net, caps_from_cfg
    from softgroup_tpu.data.synthetic import collate_scenes, make_scene
    from softgroup_tpu.data.padding import build_scene_batch

    net = build_net(cfg)
    caps = caps_from_cfg(cfg)
    rng = np.random.RandomState(0)
    data = collate_scenes([make_scene(rng, n_points=20000,
                                      semantic_classes=cfg.model.semantic_classes)],
                          scale=cfg.data.test.voxel_cfg.scale)
    batch = build_scene_batch(
        data['coords'], data['coords_float'], data['feats'],
        data['semantic_labels'], data['instance_labels'],
        data['pt_offset_labels'], data['instance_pointnum'],
        data['instance_cls'], data['spatial_shape'], caps,
        cfg.tpu.num_levels)
    variables = net.init(jax.random.PRNGKey(0), batch, cfg.model, caps,
                         method=net.test_forward)
    variables = import_reference_weights(
        dict(variables), load_reference_state_dict(args.pth), logger)

    import orbax.checkpoint as ocp
    ocp.StandardCheckpointer().save(osp.abspath(args.out), dict(variables),
                                    force=True)
    logger.info(f'wrote {args.out}')


if __name__ == '__main__':
    main()
