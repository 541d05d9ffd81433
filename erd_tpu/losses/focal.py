"""Sigmoid focal loss and cross-entropy family.

The reference backs FocalLoss with a CUDA kernel
(/root/reference/mmdet/models/losses/focal_loss.py); on TPU the pure-jnp form
fuses into surrounding ops under XLA, so no custom kernel is needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import (binary_cross_entropy_with_logits, cross_entropy_int,
                    weight_reduce_loss)


def sigmoid_focal_loss(pred, target, weight=None, gamma=2.0, alpha=0.25,
                       reduction='mean', avg_factor=None):
    """Focal loss on logits.

    Args:
        pred: (N, C) logits.
        target: (N,) int labels in [0, C] where C means background, or
            (N, C) binary targets.
    """
    num_classes = pred.shape[-1]
    if target.ndim == pred.ndim - 1:
        onehot = jax.nn.one_hot(
            jnp.clip(target, 0, num_classes), num_classes + 1,
            dtype=pred.dtype)[..., :num_classes]
    else:
        onehot = target.astype(pred.dtype)
    p = jax.nn.sigmoid(pred)
    pt = (1 - p) * onehot + p * (1 - onehot)
    focal_weight = (alpha * onehot + (1 - alpha) *
                    (1 - onehot)) * jnp.power(pt, gamma)
    loss = binary_cross_entropy_with_logits(pred, onehot) * focal_weight
    loss = loss.sum(axis=-1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def cross_entropy_loss(pred, label, weight=None, reduction='mean',
                       avg_factor=None, class_weight=None, ignore_index=-100):
    """Softmax CE with integer labels; rows equal to ignore_index get 0."""
    valid = label != ignore_index
    safe = jnp.where(valid, label, 0)
    loss = cross_entropy_int(pred, safe)
    if class_weight is not None:
        loss = loss * jnp.asarray(class_weight)[safe]
    loss = jnp.where(valid, loss, 0.0)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def binary_cross_entropy_loss(pred, label, weight=None, reduction='mean',
                              avg_factor=None):
    """Sigmoid BCE; integer labels are one-hot encoded, C-col targets pass through."""
    if label.ndim == pred.ndim - 1:
        num_classes = pred.shape[-1]
        target = jax.nn.one_hot(
            jnp.clip(label, 0, num_classes), num_classes + 1,
            dtype=pred.dtype)[..., :num_classes]
    else:
        target = label.astype(pred.dtype)
    loss = binary_cross_entropy_with_logits(pred, target)
    if weight is not None and weight.ndim == loss.ndim - 1:
        weight = weight[..., None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


class FocalLoss:

    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                 reduction='mean', loss_weight=1.0):
        assert use_sigmoid
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * sigmoid_focal_loss(
            pred, target, weight, gamma=self.gamma, alpha=self.alpha,
            reduction=reduction, avg_factor=avg_factor)


class CrossEntropyLoss:

    def __init__(self, use_sigmoid=False, use_mask=False, reduction='mean',
                 class_weight=None, loss_weight=1.0, ignore_index=-100):
        assert not use_mask
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.class_weight = class_weight
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index

    def __call__(self, pred, label, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        if self.use_sigmoid:
            loss = binary_cross_entropy_loss(
                pred, label, weight, reduction=reduction,
                avg_factor=avg_factor)
        else:
            loss = cross_entropy_loss(
                pred, label, weight, reduction=reduction,
                avg_factor=avg_factor, class_weight=self.class_weight,
                ignore_index=self.ignore_index)
        return self.loss_weight * loss
