"""Knowledge-distillation KL loss (LD-style) and the ERD L2 response loss.

KL math mirrors /root/reference/mmdet/models/losses/kd_loss.py:12-37:
``KL(softmax(teacher/T) || log_softmax(student/T)) * T^2`` with the
elementwise KL averaged (not summed) over the bin axis, teacher detached.
The L2 response loss mirrors the inline ``l2_loss`` at
/root/reference/mmdet/models/dense_heads/gfl_head_increment_erd.py:324-332.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import weight_reduce_loss


def knowledge_distillation_kl_div_loss(pred, soft_label, weight=None, T=10,
                                       detach_target=True, reduction='mean',
                                       avg_factor=None):
    """Per-row KL distillation loss.

    Args:
        pred: (N, B) student logits.
        soft_label: (N, B) teacher logits.
        T: temperature.
    """
    assert pred.shape == soft_label.shape
    target = jax.nn.softmax(soft_label / T, axis=-1)
    if detach_target:
        target = jax.lax.stop_gradient(target)
    log_p = jax.nn.log_softmax(pred / T, axis=-1)
    # torch F.kl_div(log_p, target, reduction='none') = target*(log(target)-log_p)
    # with the convention 0*log(0) = 0.
    elem = jnp.where(target > 0, target * (jnp.log(jnp.maximum(target, 1e-30))
                                           - log_p), -target * log_p)
    kd = elem.mean(axis=-1) * (T * T)
    return weight_reduce_loss(kd, weight, reduction, avg_factor)


def l2_response_loss(pred, target, mask=None, reduction='mean'):
    """Plain element-wise squared error, mean over all elements.

    With ``mask`` (broadcastable bool, e.g. per-row validity of a padded
    ERS selection) the mean runs over valid elements only, reproducing the
    reference's mean over a dynamically gathered block with static shapes.
    """
    assert pred.shape == target.shape
    sq = jnp.square(pred - jax.lax.stop_gradient(target))
    if mask is not None:
        mask = jnp.broadcast_to(mask, sq.shape).astype(sq.dtype)
        if reduction == 'mean':
            return (sq * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        if reduction == 'sum':
            return (sq * mask).sum()
        return sq * mask
    if reduction == 'mean':
        return sq.mean()
    if reduction == 'sum':
        return sq.sum()
    return sq


class KnowledgeDistillationKLDivLoss:

    def __init__(self, reduction='mean', loss_weight=1.0, T=10):
        assert T >= 1
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.T = T

    def __call__(self, pred, soft_label, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * knowledge_distillation_kl_div_loss(
            pred, soft_label, weight, T=self.T, reduction=reduction,
            avg_factor=avg_factor)
