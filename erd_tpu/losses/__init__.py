from .extra import (associative_embedding_loss, bounded_iou_loss, carl_loss,
                    dice_loss, eiou_loss, gaussian_focal_loss, ghm_c_loss,
                    ghm_r_loss, isr_p_weights, seesaw_loss, varifocal_loss)
from .focal import (CrossEntropyLoss, FocalLoss, binary_cross_entropy_loss,
                    cross_entropy_loss, sigmoid_focal_loss)
from .gfocal import (DistributionFocalLoss, QualityFocalLoss,
                     distribution_focal_loss, quality_focal_loss,
                     quality_focal_loss_tensor_target)
from .iou_loss import (CIoULoss, DIoULoss, GIoULoss, IoULoss, ciou_loss,
                       diou_loss, giou_loss, iou_loss)
from .kd_loss import (KnowledgeDistillationKLDivLoss,
                      knowledge_distillation_kl_div_loss, l2_response_loss)
from .smooth_l1 import (BalancedL1Loss, L1Loss, MSELoss, SmoothL1Loss,
                        balanced_l1_loss, l1_loss, mse_loss, smooth_l1_loss)
from .utils import (binary_cross_entropy_with_logits, cross_entropy_int,
                    reduce_loss, weight_reduce_loss, weighted_loss)

__all__ = [
    'weight_reduce_loss', 'weighted_loss', 'reduce_loss',
    'binary_cross_entropy_with_logits', 'cross_entropy_int',
    'quality_focal_loss', 'quality_focal_loss_tensor_target',
    'distribution_focal_loss', 'QualityFocalLoss', 'DistributionFocalLoss',
    'iou_loss', 'giou_loss', 'diou_loss', 'ciou_loss', 'IoULoss', 'GIoULoss',
    'DIoULoss', 'CIoULoss', 'knowledge_distillation_kl_div_loss',
    'l2_response_loss', 'KnowledgeDistillationKLDivLoss',
    'sigmoid_focal_loss', 'cross_entropy_loss', 'binary_cross_entropy_loss',
    'FocalLoss', 'CrossEntropyLoss', 'smooth_l1_loss', 'l1_loss', 'mse_loss',
    'balanced_l1_loss', 'SmoothL1Loss', 'L1Loss', 'MSELoss', 'BalancedL1Loss',
    'varifocal_loss', 'ghm_c_loss', 'ghm_r_loss', 'gaussian_focal_loss',
    'dice_loss', 'seesaw_loss', 'bounded_iou_loss', 'eiou_loss',
    'associative_embedding_loss', 'isr_p_weights', 'carl_loss',
]
