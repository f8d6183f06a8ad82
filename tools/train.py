#!/usr/bin/env python3
"""Training CLI — equivalent of the reference `tools/train.py` (epoch loop,
cosine-after-step LR, periodic validation, checkpointing), rebuilt around a
jitted SPMD step over a device mesh instead of DDP+NCCL.

Usage:
    python tools/train.py configs/softgroup/softgroup_scannet.yaml
    python tools/train.py <cfg> --resume --num-devices 4
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from softgroup_tpu.data import (build_dataloader, build_dataset,
                                build_scene_batch)
from softgroup_tpu.model.softgroup import Capacities, SoftGroupNet
from softgroup_tpu.parallel.mesh import (TrainState, make_mesh,
                                         make_train_step, stack_batches)
from softgroup_tpu.util.checkpoint import (CheckpointManager,
                                           import_reference_weights,
                                           load_reference_state_dict)
from softgroup_tpu.util.config import load_config
from softgroup_tpu.util.logger import AverageMeter, SummaryWriter, \
    get_max_memory, get_root_logger
from softgroup_tpu.util.optim import (build_optimizer, clip_by_global_norm,
                                      cosine_after_step_schedule,
                                      masked_optimizer)

import optax


def parse_args():
    p = argparse.ArgumentParser(description='softgroup_tpu training')
    p.add_argument('config', help='path to config yaml')
    p.add_argument('--resume', action='store_true')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--skip-validate', action='store_true')
    p.add_argument('--num-devices', type=int, default=0,
                   help='data-parallel devices (0 = all)')
    p.add_argument('--epochs', type=int, default=0, help='override epochs')
    return p.parse_args()


def caps_from_cfg(cfg) -> Capacities:
    c = cfg.tpu.caps
    return Capacities(points=c.points, voxels=tuple(c.voxels),
                      grouping_points=c.grouping_points,
                      proposals=c.proposals,
                      proposal_entries=c.proposal_entries,
                      instances=c.instances,
                      inst_voxels=tuple(c.inst_voxels),
                      grouping_cells=c.get('grouping_cells', 65536))


def make_post(caps, num_levels, ignore_label, with_coords=True):
    def post(batch):
        return batch['scan_ids'], build_scene_batch(
            batch['coords'], batch['coords_float'], batch['feats'],
            batch['semantic_labels'], batch['instance_labels'],
            batch['pt_offset_labels'], batch['instance_pointnum'],
            batch['instance_cls'], batch['spatial_shape'], caps, num_levels,
            ignore_label, with_coords=with_coords)
    return post


def build_net(cfg) -> SoftGroupNet:
    return SoftGroupNet(
        channels=cfg.model.channels, num_blocks=cfg.model.num_blocks,
        semantic_classes=cfg.model.semantic_classes,
        instance_classes=cfg.model.instance_classes,
        semantic_only=cfg.model.semantic_only,
        bf16=bool(cfg.get('tpu', {}).get('bf16', True)),
        fixed_modules=tuple(cfg.model.get('fixed_modules', [])))


def main():
    args = parse_args()
    cfg = load_config(args.config)
    if args.epochs:
        cfg.epochs = args.epochs
    work_dir = args.work_dir or cfg.get('work_dir') or osp.join(
        './work_dirs', osp.splitext(osp.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(osp.join(work_dir, 'train.log'))
    writer = SummaryWriter(work_dir)
    logger.info(f'config: {args.config}  devices: {jax.devices()}')

    caps = caps_from_cfg(cfg)
    num_levels = cfg.tpu.num_levels
    net = build_net(cfg)

    train_set = build_dataset(cfg.data.train, logger)
    post = make_post(caps, num_levels, cfg.model.ignore_label,
                     cfg.model.get('with_coords', True))
    n_dev = args.num_devices or jax.device_count()
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    train_loader = build_dataloader(
        train_set, batch_size=cfg.dataloader.train.batch_size,
        num_workers=cfg.dataloader.train.num_workers, training=True,
        post=post)
    steps_per_epoch = max(len(train_loader) // max(n_dev, 1), 1)

    # ---- init params from one real batch ----
    logger.info('initializing parameters...')
    first = next(iter(train_loader))[1]
    variables = net.init(jax.random.PRNGKey(0), first, cfg.model, caps,
                         jax.random.PRNGKey(1), method=net.loss_forward)
    if cfg.get('pretrain') and osp.exists(cfg.pretrain):
        logger.info(f'importing pretrain {cfg.pretrain}')
        variables = import_reference_weights(
            dict(variables), load_reference_state_dict(cfg.pretrain), logger)

    schedule = cosine_after_step_schedule(
        cfg.optimizer.lr, cfg.step_epoch, cfg.epochs, steps_per_epoch)
    tx = optax.chain(
        clip_by_global_norm(cfg.get('clip_grad_norm')),
        masked_optimizer(build_optimizer(variables['params'], cfg.optimizer,
                                         schedule),
                         variables['params'],
                         cfg.model.get('fixed_modules', [])))
    state = TrainState(params=variables['params'],
                       batch_stats=variables['batch_stats'],
                       opt_state=tx.init(variables['params']),
                       step=jnp.zeros((), jnp.int32))

    ckpt = CheckpointManager(work_dir, cfg.get('save_freq', 0))
    start_epoch = 1
    if args.resume:
        state, start_epoch = ckpt.load(state)
        logger.info(f'resumed at epoch {start_epoch}')

    train_step = make_train_step(
        net, cfg.model, caps, tx, mesh,
        frozen_modules=tuple(cfg.model.get('fixed_modules', [])))
    rng = jax.random.PRNGKey(42)

    for epoch in range(start_epoch, cfg.epochs + 1):
        train_loader.set_epoch(epoch)
        iter_time, data_time = AverageMeter(), AverageMeter()
        meters: dict[str, AverageMeter] = {}
        end = time.time()
        it = iter(train_loader)
        step_in_epoch = 0
        while True:
            # group one stacked batch per mesh device
            group = []
            for _ in range(max(n_dev, 1)):
                try:
                    group.append(next(it)[1])
                except StopIteration:
                    break
            if len(group) < max(n_dev, 1):
                break
            data_time.update(time.time() - end)
            rng, sub = jax.random.split(rng)
            batch = stack_batches(group) if mesh else group[0]
            state, logs = train_step(state, batch, sub)
            step_in_epoch += 1
            for k, v in logs.items():
                meters.setdefault(k, AverageMeter()).update(float(v))
            iter_time.update(time.time() - end)
            end = time.time()
            if step_in_epoch % 10 == 0:
                lr = float(schedule(int(state.step)))
                remain = (steps_per_epoch - step_in_epoch) \
                    + (cfg.epochs - epoch) * steps_per_epoch
                eta = remain * iter_time.avg
                mstr = ', '.join(f'{k}: {m.avg:.4f}'
                                 for k, m in meters.items())
                logger.info(
                    f'Epoch [{epoch}/{cfg.epochs}][{step_in_epoch}/'
                    f'{steps_per_epoch}] lr {lr:.2g} eta {eta / 3600:.1f}h '
                    f'mem {get_max_memory()}MB '
                    f'iter {iter_time.avg:.2f}s ({mstr})')
        for k, m in meters.items():
            writer.add_scalar(f'train/{k}', m.avg, epoch)
        writer.add_scalar('train/lr', float(schedule(int(state.step))), epoch)
        ckpt.save(state, epoch)
        if not args.skip_validate and (
                epoch % max(cfg.get('save_freq', 4), 1) == 0
                or (epoch & (epoch - 1)) == 0):
            validate(net, state, cfg, caps, num_levels, logger, writer, epoch)
    logger.info('training done')


def validate(net, state, cfg, caps, num_levels, logger, writer, epoch):
    from softgroup_tpu.tools_impl.test_runner import run_eval
    try:
        results = run_eval(net, {'params': state.params,
                                 'batch_stats': state.batch_stats},
                           cfg, caps, num_levels, logger)
    except (AssertionError, FileNotFoundError) as e:
        logger.info(f'validation skipped: {e}')
        return
    for k, v in results.items():
        if isinstance(v, (int, float)):
            writer.add_scalar(f'val/{k}', v, epoch)
            logger.info(f'val {k}: {v:.4f}')


if __name__ == '__main__':
    main()
