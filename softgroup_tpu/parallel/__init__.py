from .mesh import (TrainState, collect_results, init_dist, make_mesh,
                   make_train_step, shard_batch, stack_batches)

__all__ = [
    'TrainState', 'collect_results', 'init_dist', 'make_mesh',
    'make_train_step', 'shard_batch', 'stack_batches',
]
