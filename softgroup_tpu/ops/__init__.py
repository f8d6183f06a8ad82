"""Public op surface — TPU-native equivalents of the reference extension
`softgroup.ops.ops` (13 functions, `softgroup/ops/src/softgroup_api.cpp:6-29`).

Mapping (reference -> here):
  voxelize_idx               -> voxelize (device) / voxelize_np (host)
  voxelize_fp / voxelize_bp  -> voxel_features (+ autodiff)
  ballquery_batch_p + bfs_cluster -> ball_cluster (one fused device routine)
  octree_ball_query          -> ball_cluster on the SoftGroup++ pyramid level
  global_avg_pool_fp/bp      -> segment_mean (+ autodiff)
  sec_mean / sec_min / sec_max -> segment_mean / segment_min / segment_max
  get_mask_iou_on_cluster    -> mask_iou_on_cluster
  get_mask_iou_on_pred       -> mask_iou_on_pred
  get_mask_label             -> mask_label
"""

from .geometry import LevelGeom, Pyramid, build_pyramid, build_pyramid_np
from .grouping import ball_cluster
from .masks import mask_iou_on_cluster, mask_iou_on_pred, mask_label
from .rulebook import (build_downsample, build_downsample_np, build_subm_rules,
                       build_subm_rules_np)
from .segment import (offsets_to_segment_ids, segment_count, segment_max,
                      segment_mean, segment_min, segment_sum)
from .sparse_conv import down_conv, inverse_conv, linear, subm_conv
from .voxelize import (Voxelized, devoxelize, voxel_features, voxelize,
                       voxelize_np)

__all__ = [
    'LevelGeom', 'Pyramid', 'build_pyramid', 'build_pyramid_np',
    'ball_cluster', 'mask_iou_on_cluster', 'mask_iou_on_pred', 'mask_label',
    'build_downsample', 'build_downsample_np', 'build_subm_rules',
    'build_subm_rules_np', 'offsets_to_segment_ids', 'segment_count',
    'segment_max', 'segment_mean', 'segment_min', 'segment_sum', 'down_conv',
    'inverse_conv', 'linear', 'subm_conv', 'Voxelized', 'devoxelize',
    'voxel_features', 'voxelize', 'voxelize_np',
]
