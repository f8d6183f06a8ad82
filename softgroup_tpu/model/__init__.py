from .blocks import MLP, Dense, MaskedBatchNorm, ResidualBlock, SubMConv, \
    UBlock
from .softgroup import (Capacities, Proposals, SceneBatch, SoftGroupNet,
                        clusters_voxelization, forward_grouping,
                        instance_loss, parse_losses, point_wise_loss)

__all__ = [
    'MLP', 'Dense', 'MaskedBatchNorm', 'ResidualBlock', 'SubMConv', 'UBlock',
    'Capacities', 'Proposals', 'SceneBatch', 'SoftGroupNet',
    'clusters_voxelization', 'forward_grouping', 'instance_loss',
    'parse_losses', 'point_wise_loss',
]
