"""IoU-family box losses (IoU/GIoU/DIoU/CIoU/EIoU).

Math mirrors /root/reference/mmdet/models/losses/iou_loss.py. As in the
reference GIoULoss, an (N, 4) weight is collapsed to (N,) by taking its mean
over the last axis before weighting.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..structures.boxes import bbox_overlaps
from .utils import weight_reduce_loss


def _collapse_box_weight(loss, weight):
    if weight is not None and weight.ndim == loss.ndim + 1:
        weight = weight.mean(axis=-1)
    return weight


def iou_loss(pred, target, weight=None, linear=False, mode='log', eps=1e-6,
             reduction='mean', avg_factor=None):
    if linear:
        mode = 'linear'
    ious = jnp.clip(
        bbox_overlaps(pred, target, is_aligned=True, eps=eps), eps, None)
    if mode == 'linear':
        loss = 1 - ious
    elif mode == 'square':
        loss = 1 - ious**2
    elif mode == 'log':
        loss = -jnp.log(ious)
    else:
        raise ValueError(f'unknown mode {mode}')
    weight = _collapse_box_weight(loss, weight)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def giou_loss(pred, target, weight=None, eps=1e-7, reduction='mean',
              avg_factor=None):
    gious = bbox_overlaps(pred, target, mode='giou', is_aligned=True, eps=eps)
    loss = 1 - gious
    weight = _collapse_box_weight(loss, weight)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def _centers_and_wh(boxes):
    cx = (boxes[..., 0] + boxes[..., 2]) / 2
    cy = (boxes[..., 1] + boxes[..., 3]) / 2
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return cx, cy, w, h


def diou_loss(pred, target, weight=None, eps=1e-7, reduction='mean',
              avg_factor=None):
    ious = bbox_overlaps(pred, target, is_aligned=True, eps=eps)
    px, py, _, _ = _centers_and_wh(pred)
    tx, ty, _, _ = _centers_and_wh(target)
    enc_lt = jnp.minimum(pred[..., :2], target[..., :2])
    enc_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    c2 = ((enc_rb - enc_lt)**2).sum(-1) + eps
    rho2 = (px - tx)**2 + (py - ty)**2
    loss = 1 - ious + rho2 / c2
    weight = _collapse_box_weight(loss, weight)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def ciou_loss(pred, target, weight=None, eps=1e-7, reduction='mean',
              avg_factor=None):
    ious = bbox_overlaps(pred, target, is_aligned=True, eps=eps)
    px, py, pw, ph = _centers_and_wh(pred)
    tx, ty, tw, th = _centers_and_wh(target)
    enc_lt = jnp.minimum(pred[..., :2], target[..., :2])
    enc_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    c2 = ((enc_rb - enc_lt)**2).sum(-1) + eps
    rho2 = (px - tx)**2 + (py - ty)**2
    factor = 4 / jnp.pi**2
    v = factor * (jnp.arctan(tw / (th + eps)) - jnp.arctan(pw /
                                                           (ph + eps)))**2
    alpha = jnp.where(ious > 0.5, v / (1 - ious + v + eps), 0.0)
    # Reference detaches alpha (iou_loss.py CIoU): treat as constant.
    import jax
    alpha = jax.lax.stop_gradient(alpha)
    loss = 1 - ious + rho2 / c2 + alpha * v
    weight = _collapse_box_weight(loss, weight)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


class GIoULoss:

    def __init__(self, eps=1e-6, reduction='mean', loss_weight=1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * giou_loss(
            pred, target, weight, eps=self.eps, reduction=reduction,
            avg_factor=avg_factor)


class IoULoss:

    def __init__(self, linear=False, eps=1e-6, reduction='mean',
                 loss_weight=1.0, mode='log'):
        self.linear = linear
        self.mode = mode
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * iou_loss(
            pred, target, weight, linear=self.linear, mode=self.mode,
            eps=self.eps, reduction=reduction, avg_factor=avg_factor)


class DIoULoss:

    def __init__(self, eps=1e-6, reduction='mean', loss_weight=1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * diou_loss(
            pred, target, weight, eps=self.eps, reduction=reduction,
            avg_factor=avg_factor)


class CIoULoss:

    def __init__(self, eps=1e-6, reduction='mean', loss_weight=1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * ciou_loss(
            pred, target, weight, eps=self.eps, reduction=reduction,
            avg_factor=avg_factor)
