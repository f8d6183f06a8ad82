from .checkpoint import (CheckpointManager, import_reference_weights,
                         load_reference_state_dict)
from .config import Config, getattr_or, load_config
from .logger import AverageMeter, SummaryWriter, get_root_logger
from .optim import (build_optimizer, clip_by_global_norm,
                    cosine_after_step_schedule, freeze_mask, masked_optimizer)
from .rle import rle_decode, rle_encode

__all__ = [
    'CheckpointManager', 'import_reference_weights',
    'load_reference_state_dict', 'Config', 'getattr_or', 'load_config',
    'AverageMeter', 'SummaryWriter', 'get_root_logger', 'build_optimizer',
    'clip_by_global_norm', 'cosine_after_step_schedule', 'freeze_mask',
    'masked_optimizer', 'rle_decode', 'rle_encode',
]
