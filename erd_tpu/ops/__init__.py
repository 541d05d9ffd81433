from .extra_nms import corner_pool, fast_nms, matrix_nms, nms_match
from .integral import integral
from .misc import (cap_candidates, filter_scores_and_topk, masked_mean_std,
                   topk_mask_select, unmap)
from .nms import (batched_nms_mask, nms_mask, nms_select, nms_select_cfg,
                  set_nms_mask, soft_nms_select)
from .sampling import masked_conv2d, point_sample

__all__ = [
    'integral', 'nms_mask', 'batched_nms_mask', 'nms_select',
    'nms_select_cfg', 'soft_nms_select',
    'filter_scores_and_topk', 'topk_mask_select', 'masked_mean_std', 'unmap',
    'cap_candidates', 'matrix_nms', 'fast_nms', 'corner_pool', 'nms_match',
    'set_nms_mask',
    'point_sample', 'masked_conv2d',
]
