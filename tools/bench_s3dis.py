"""Smoke S3DIS-scale inference: 1M-point scene as 4 interleaved parts
(x4_split), caps at the softgroup_s3dis config scale."""
import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from softgroup_tpu.data.padding import build_scene_batch
from softgroup_tpu.data.synthetic import collate_scenes, make_room_scene
from softgroup_tpu.model.softgroup import Capacities, SoftGroupNet
from softgroup_tpu.util.config import Config

rng = np.random.RandomState(0)
# one huge room = 4 interleaved parts of 262144 points (batch idx 0..3)
scenes = [make_room_scene(rng, n_points=250000, n_instances=10)
          for _ in range(4)]
data = collate_scenes(scenes, scale=50.0)
caps = Capacities(points=1048576, voxels=(851968, 425984, 131072, 32768, 8192, 4096, 2048),
                  grouping_points=2097152, proposals=256, proposal_entries=1048576,
                  instances=128, inst_voxels=(65536, 16384), grouping_cells=32768)
batch = build_scene_batch(data['coords'], data['coords_float'], data['feats'],
                          data['semantic_labels'], data['instance_labels'],
                          data['pt_offset_labels'], data['instance_pointnum'],
                          data['instance_cls'], data['spatial_shape'], caps, num_levels=7)
cfg = Config(dict(channels=32, num_blocks=7, semantic_classes=13, instance_classes=13,
                  semantic_only=False, ignore_label=-100, with_coords=True,
                  sem2ins_classes=[0, 1],
                  grouping_cfg=dict(score_thr=0.2, radius=0.04, mean_active=300,
                                    class_numpoint_mean=[-1.0]*13, npoint_thr=50,
                                    ignore_classes=[]),
                  instance_voxel_cfg=dict(scale=50, spatial_shape=20),
                  train_cfg=dict(max_proposal_num=256, pos_iou_thr=0.5),
                  test_cfg=dict(x4_split=True, cls_score_thr=0.001, mask_score_thr=-0.5,
                                min_npoint=100, eval_tasks=['semantic', 'instance'])))
net = SoftGroupNet(channels=32, num_blocks=7, semantic_classes=13, instance_classes=13)
init = jax.jit(lambda key, b: net.init(key, b, cfg, caps, method=net.test_forward))
variables = init(jax.random.PRNGKey(0), batch)
fn = jax.jit(lambda v, b: net.apply(v, b, cfg, caps, method=net.test_forward))
out = fn(variables, batch)
np.asarray(out['n_proposals'])
t0 = time.perf_counter()
outs = [fn(variables, batch) for _ in range(5)]
np.asarray(outs[-1]['n_proposals'])
print('S3DIS-scale (1M pts, x4 parts) e2e:', round((time.perf_counter()-t0)/5*1000, 1), 'ms/scene')
