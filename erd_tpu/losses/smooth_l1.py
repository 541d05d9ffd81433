"""Smooth-L1 / L1 / balanced-L1 / MSE regression losses
(math mirrors /root/reference/mmdet/models/losses/smooth_l1_loss.py,
balanced_l1_loss.py, mse_loss.py)."""
from __future__ import annotations

import jax.numpy as jnp

from .utils import weight_reduce_loss, weighted_loss


@weighted_loss
def smooth_l1_loss(pred, target, beta=1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


@weighted_loss
def l1_loss(pred, target):
    return jnp.abs(pred - target)


@weighted_loss
def mse_loss(pred, target):
    return jnp.square(pred - target)


@weighted_loss
def balanced_l1_loss(pred, target, beta=1.0, alpha=0.5, gamma=1.5):
    diff = jnp.abs(pred - target)
    b = jnp.e**(gamma / alpha) - 1
    return jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log(b * diff / beta + 1) -
        alpha * diff, gamma * diff + gamma / b - alpha * beta)


class SmoothL1Loss:

    def __init__(self, beta=1.0, reduction='mean', loss_weight=1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * smooth_l1_loss(
            pred, target, weight, reduction=reduction, avg_factor=avg_factor,
            beta=self.beta)


class L1Loss:

    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * l1_loss(
            pred, target, weight, reduction=reduction, avg_factor=avg_factor)


class MSELoss:

    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * mse_loss(
            pred, target, weight, reduction=reduction, avg_factor=avg_factor)


class BalancedL1Loss:

    def __init__(self, alpha=0.5, gamma=1.5, beta=1.0, reduction='mean',
                 loss_weight=1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * balanced_l1_loss(
            pred, target, weight, reduction=reduction, avg_factor=avg_factor,
            beta=self.beta, alpha=self.alpha, gamma=self.gamma)
