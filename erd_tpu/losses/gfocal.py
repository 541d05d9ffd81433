"""Quality Focal Loss and Distribution Focal Loss (Generalized Focal Loss).

Dense, fixed-shape re-derivations of
/root/reference/mmdet/models/losses/gfocal_loss.py:12-165. The reference uses
``nonzero`` + advanced indexing to overwrite positive entries; here positives
are handled with a one-hot mask so everything vectorizes on the VPU with no
dynamic shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import (binary_cross_entropy_with_logits, cross_entropy_int,
                    weight_reduce_loss)


def quality_focal_loss(pred, target, weight=None, beta=2.0, reduction='mean',
                       avg_factor=None):
    """QFL with (label, score) targets.

    Args:
        pred: (N, C) joint cls-quality logits.
        target: tuple of labels (N,) int in [0, C] (C = background) and
            quality scores (N,) float (IoU of the assigned box; 0 for bg).
        weight: optional (N,) weights.
    Returns reduced loss; element-wise loss has shape (N,).
    """
    labels, score = target
    num_classes = pred.shape[-1]
    pred_sigmoid = jax.nn.sigmoid(pred)

    # Negatives: BCE against 0 scaled by sigmoid^beta (for every entry).
    neg_loss = binary_cross_entropy_with_logits(
        pred, jnp.zeros_like(pred)) * jnp.power(pred_sigmoid, beta)

    # Positives: BCE against the quality score scaled by |score - sigma|^beta,
    # applied only at the (row, label) entries of foreground rows.
    pos_mask = (labels >= 0) & (labels < num_classes)
    safe_labels = jnp.clip(labels, 0, num_classes - 1)
    onehot = jax.nn.one_hot(safe_labels, num_classes, dtype=bool)
    onehot = onehot & pos_mask[..., None]
    score_b = jnp.broadcast_to(score[..., None], pred.shape)
    pos_loss = binary_cross_entropy_with_logits(pred, score_b) * jnp.power(
        jnp.abs(score_b - pred_sigmoid), beta)

    loss = jnp.where(onehot, pos_loss, neg_loss).sum(axis=-1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def quality_focal_loss_tensor_target(pred, target, weight=None, beta=2.0,
                                     reduction='mean', avg_factor=None,
                                     activated=False):
    """QFL with a dense (N, C) soft target (reference `:56-94`)."""
    if activated:
        pred_sigmoid = pred
        eps = 1e-12
        bce = lambda p, t: -(t * jnp.log(p + eps) +  # noqa: E731
                             (1 - t) * jnp.log(1 - p + eps))
    else:
        pred_sigmoid = jax.nn.sigmoid(pred)
        bce = binary_cross_entropy_with_logits
    target = target.astype(pred.dtype)
    neg_loss = bce(pred, jnp.zeros_like(pred)) * jnp.power(pred_sigmoid, beta)
    pos_loss = bce(pred, target) * jnp.power(
        jnp.abs(target - pred_sigmoid), beta)
    loss = jnp.where(target != 0, pos_loss, neg_loss).sum(axis=-1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def distribution_focal_loss(pred, label, weight=None, reduction='mean',
                            avg_factor=None):
    """DFL: CE to the two integer bins bracketing the continuous target.

    Args:
        pred: (N, n+1) distribution logits over bins {0..n}.
        label: (N,) continuous distance targets in [0, n).
    """
    dis_left = jnp.floor(label).astype(jnp.int32)
    dis_right = dis_left + 1
    weight_left = dis_right.astype(label.dtype) - label
    weight_right = label - dis_left.astype(label.dtype)
    nbins = pred.shape[-1]
    loss = (cross_entropy_int(pred, jnp.clip(dis_left, 0, nbins - 1)) *
            weight_left +
            cross_entropy_int(pred, jnp.clip(dis_right, 0, nbins - 1)) *
            weight_right)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


class QualityFocalLoss:
    """Module-style wrapper mirroring the reference class API."""

    def __init__(self, use_sigmoid=True, beta=2.0, reduction='mean',
                 loss_weight=1.0, activated=False):
        assert use_sigmoid, 'QFL only supports sigmoid form'
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.activated = activated

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        if isinstance(target, (tuple, list)):
            loss = quality_focal_loss(
                pred, target, weight, beta=self.beta, reduction=reduction,
                avg_factor=avg_factor)
        else:
            loss = quality_focal_loss_tensor_target(
                pred, target, weight, beta=self.beta, reduction=reduction,
                avg_factor=avg_factor, activated=self.activated)
        return self.loss_weight * loss


class DistributionFocalLoss:

    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * distribution_focal_loss(
            pred, target, weight, reduction=reduction, avg_factor=avg_factor)
