"""SPMD data parallelism over a device mesh.

Replaces the reference's NCCL stack — DDP gradient bucketing
(`tools/train.py:174`), loss all_reduce (`softgroup.py:290-295`), process
group init (`softgroup/util/dist.py:27-31`) — with a single jitted step over
a 1-D `jax.sharding.Mesh`: scene batches are stacked on a leading 'data'
axis and sharded across devices; `shard_map` runs the per-device forward and
`lax.pmean` averages grads/metrics over ICI.  Multi-host extends the same
mesh over DCN via `jax.distributed.initialize` (see init_dist).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def init_dist(coordinator: str | None = None, num_processes: int | None = None,
              process_id: int | None = None):
    """Multi-host init (DCN); single-host callers skip this entirely — the
    reference's degrade-to-single-process behaviour (`dist.py:17-24`)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)
    return jax.process_index(), jax.process_count()


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D 'data' mesh over n_devices.

    If the default backend has fewer devices, fall back to the CPU backend
    (virtual devices via --xla_force_host_platform_device_count) rather than
    silently building a smaller mesh — a dry run asking for 8-way sharding
    must actually exercise 8-way sharding.
    """
    devs = jax.devices()
    if n_devices and len(devs) < n_devices:
        cpu = jax.devices('cpu')
        if len(cpu) >= n_devices:
            devs = cpu
        else:
            raise ValueError(
                f'make_mesh: requested {n_devices} devices but only '
                f'{len(devs)} {devs[0].platform} / {len(cpu)} cpu available '
                f'(set --xla_force_host_platform_device_count)')
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ('data',))


def stack_batches(batches: list) -> Any:
    """Stack per-device SceneBatches along a leading 'data' axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *batches)


def shard_batch(stacked, mesh: Mesh):
    sh = NamedSharding(mesh, P('data'))
    return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)


def make_train_step(net, cfg, caps, tx, mesh: Mesh | None = None,
                    frozen_modules: tuple = ()):
    """Build the jitted train step.

    Single-device: plain jit.  Mesh: shard_map over 'data' with pmean'd
    gradients/metrics (replacing DDP all_reduce) and pmean'd batch-stat
    updates (an improvement over the reference, which lets per-rank BN
    statistics drift and keeps rank 0's).

    frozen_modules: top-level param modules to exclude from
    differentiation (the reference's requires_grad=False freezing,
    `softgroup.py:81-84`).  Excluding them from the grad computation — not
    just masking their updates — lets XLA dead-code-eliminate the whole
    frozen backward: with the flagship config's frozen backbone, the
    backward pass shrinks to the refinement stage.
    """
    frozen = tuple(m for m in frozen_modules)

    def device_grads(batch, params, batch_stats, rng):
        trainable = {k: v for k, v in params.items() if k not in frozen}
        frozen_p = {k: v for k, v in params.items() if k in frozen}

        def loss_fn(tp):
            (loss, logs), mut = net.apply(
                {'params': {**frozen_p, **tp}, 'batch_stats': batch_stats},
                batch, cfg, caps, rng, method=net.loss_forward,
                mutable=['batch_stats'])
            return loss, (logs, mut['batch_stats'])

        (loss, (logs, new_bs)), tgrads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        # return only trainable grads: the mesh path then pmeans only
        # these (no all-reduce of frozen-module zeros)
        return loss, logs, new_bs, tgrads

    if mesh is not None:
        from jax import shard_map

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P('data'), P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False)
        def sharded_grads(stacked, params, batch_stats, rng):
            local = jax.tree.map(lambda x: x[0], stacked)
            my = jax.lax.axis_index('data')
            loss, logs, new_bs, grads = device_grads(
                local, params, batch_stats, jax.random.fold_in(rng, my))
            pm = lambda t: jax.lax.pmean(t, 'data')
            return pm(loss), jax.tree.map(pm, logs), jax.tree.map(
                pm, new_bs), jax.tree.map(pm, grads)

        grads_fn = sharded_grads
    else:
        def grads_fn(batch, params, batch_stats, rng):
            return device_grads(batch, params, batch_stats, rng)

    def train_step(state: TrainState, batch, rng):
        loss, logs, new_bs, tgrads = grads_fn(batch, state.params,
                                              state.batch_stats, rng)
        # zero-fill frozen modules post-pmean; the masked optimizer turns
        # these into no-op updates
        grads = {k: (tgrads[k] if k in tgrads
                     else jax.tree.map(jnp.zeros_like, v))
                 for k, v in state.params.items()}
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=new_bs,
                                  opt_state=opt_state, step=state.step + 1)
        return new_state, logs

    return jax.jit(train_step, donate_argnums=(0,))


def collect_results(local_results: list, rank: int, world: int,
                    gather_dir: str | None = None) -> list | None:
    """Gather per-scan eval results to process 0.

    The reference pickles per-rank results into a shared tmpdir and
    concatenates on rank 0 (`collect_results_cpu`, dist.py:76-112); on a
    single host this is a no-op, and multi-host uses the same shared-filesystem
    protocol (eval outputs are ragged python objects, not arrays — DCN
    all_gather buys nothing here).
    """
    if world == 1:
        return local_results
    import pickle
    import os
    assert gather_dir, 'multi-host gather needs a shared directory'
    os.makedirs(gather_dir, exist_ok=True)
    with open(os.path.join(gather_dir, f'part_{rank}.pkl'), 'wb') as f:
        pickle.dump(local_results, f)
    # barrier across hosts
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices('collect_results')
    if rank != 0:
        return None
    out = []
    for r in range(world):
        with open(os.path.join(gather_dir, f'part_{r}.pkl'), 'rb') as f:
            part = pickle.load(f)
        out.append(part)
    # interleave rank-sharded results back to dataset order
    merged = []
    for i in range(max(len(p) for p in out)):
        for p in out:
            if i < len(p):
                merged.append(p[i])
    return merged
