from .instance_eval import ScanNetEval
from .panoptic_eval import PanopticEval
from .point_wise_eval import (evaluate_offset_mae, evaluate_semantic_acc,
                              evaluate_semantic_miou)
from .postprocess import (get_gt_instances, get_instances, panoptic_fusion)

__all__ = [
    'ScanNetEval', 'PanopticEval', 'evaluate_offset_mae',
    'evaluate_semantic_acc', 'evaluate_semantic_miou', 'get_gt_instances',
    'get_instances', 'panoptic_fusion',
]
