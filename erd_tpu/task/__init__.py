from .anchors import (AnchorGenerator, MlvlPointGenerator, featmap_sizes_for,
                      valid_flags_jax)
from .atss import AssignResult, atss_assign, atss_assign_batch
from .coder import DeltaXYWHBBoxCoder, DistancePointBBoxCoder
from .max_iou import max_iou_assign

__all__ = [
    'AnchorGenerator', 'MlvlPointGenerator', 'featmap_sizes_for',
    'valid_flags_jax', 'AssignResult', 'atss_assign', 'atss_assign_batch',
    'DistancePointBBoxCoder', 'DeltaXYWHBBoxCoder', 'max_iou_assign',
]
