"""Additional loss-zoo members.

Math mirrors the reference implementations:
  - VarifocalLoss: mmdet/models/losses/varifocal_loss.py
  - GHM-C / GHM-R: mmdet/models/losses/ghm_loss.py (gradient-density
    reweighting; the running-bin EMA variant is momentum=0 faithful here —
    stateless, jit-friendly)
  - GaussianFocalLoss: mmdet/models/losses/gaussian_focal_loss.py
  - DiceLoss: mmdet/models/losses/dice_loss.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import binary_cross_entropy_with_logits, weight_reduce_loss


def varifocal_loss(pred, target, weight=None, alpha=0.75, gamma=2.0,
                   iou_weighted=True, reduction='mean', avg_factor=None):
    """Varifocal loss on logits; target is a (N, C) IoU-aware score map."""
    pred_sigmoid = jax.nn.sigmoid(pred)
    target = target.astype(pred.dtype)
    pos = (target > 0).astype(pred.dtype)
    if iou_weighted:
        focal_weight = target * pos + \
            alpha * jnp.power(jnp.abs(pred_sigmoid - target), gamma) * \
            (1 - pos)
    else:
        focal_weight = pos + \
            alpha * jnp.power(jnp.abs(pred_sigmoid - target), gamma) * \
            (1 - pos)
    loss = binary_cross_entropy_with_logits(pred, target) * focal_weight
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def ghm_c_loss(pred, target, label_weight, bins=10, momentum=0.0,
               reduction='mean'):
    """GHM classification loss (one-hot targets, dense masked).

    Args:
        pred: (N, C) logits.
        target: (N, C) binary targets.
        label_weight: (N, C) valid mask.
    """
    edges = jnp.linspace(0, 1, bins + 1).at[-1].add(1e-6)
    g = jnp.abs(jax.lax.stop_gradient(jax.nn.sigmoid(pred)) - target)
    valid = label_weight > 0
    tot = jnp.maximum(valid.sum(), 1.0)
    weights = jnp.zeros_like(pred)
    n_nonempty = 0.0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum()
        has = (num_in_bin > 0).astype(pred.dtype)
        w = jnp.where(inds, tot / jnp.maximum(num_in_bin, 1.0), 0.0)
        weights = weights + w * has
        n_nonempty = n_nonempty + has
    weights = weights / jnp.maximum(n_nonempty, 1.0)
    loss = binary_cross_entropy_with_logits(pred, target) * weights
    if reduction == 'mean':
        return loss.sum() / tot
    return loss if reduction == 'none' else loss.sum()


def ghm_r_loss(pred, target, label_weight, mu=0.02, bins=10,
               reduction='mean'):
    """GHM regression loss over ASL1 gradients."""
    diff = pred - target
    loss = jnp.sqrt(diff * diff + mu * mu) - mu
    g = jnp.abs(jax.lax.stop_gradient(diff) /
                jnp.sqrt(mu * mu + diff * diff))
    valid = label_weight > 0
    tot = jnp.maximum(valid.sum(), 1.0)
    edges = jnp.linspace(0, 1, bins + 1).at[-1].add(1e3)
    weights = jnp.zeros_like(pred)
    n_nonempty = 0.0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum()
        has = (num_in_bin > 0).astype(pred.dtype)
        w = jnp.where(inds, tot / jnp.maximum(num_in_bin, 1.0), 0.0)
        weights = weights + w * has
        n_nonempty = n_nonempty + has
    loss = loss * weights / jnp.maximum(n_nonempty, 1.0)
    if reduction == 'mean':
        return loss.sum() / tot
    return loss if reduction == 'none' else loss.sum()


def gaussian_focal_loss(pred, gaussian_target, weight=None, alpha=2.0,
                        gamma=4.0, reduction='mean', avg_factor=None):
    """CornerNet/CenterNet focal loss on a gaussian heatmap (pred is a
    probability)."""
    eps = 1e-12
    pos_weights = (gaussian_target == 1).astype(pred.dtype)
    neg_weights = jnp.power(1 - gaussian_target, gamma)
    pos_loss = -jnp.log(pred + eps) * jnp.power(1 - pred, alpha) * \
        pos_weights
    neg_loss = -jnp.log(1 - pred + eps) * jnp.power(pred, alpha) * \
        neg_weights * (1 - pos_weights)
    loss = pos_loss + neg_loss
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def seesaw_loss(pred, target, cum_samples, weight=None, p=0.8, q=2.0,
                eps=1e-2, reduction='mean', avg_factor=None):
    """Seesaw loss (long-tail instance seg; seesaw_loss.py semantics).

    Args:
        pred: (N, C) logits (no explicit background column here).
        target: (N,) int labels in [0, C).
        cum_samples: (C,) per-class cumulative sample counts (state kept by
            the caller — a pure-function framework keeps the counter in the
            train state rather than a module buffer).
    """
    import jax
    num_classes = pred.shape[-1]
    onehot = jax.nn.one_hot(target, num_classes, dtype=pred.dtype)

    # mitigation factor: dampen negative gradients for rarer classes
    ratio = cum_samples[None, :] / jnp.clip(cum_samples[:, None], 1, None)
    sample_w = jnp.where(ratio < 1.0, jnp.power(ratio, p), 1.0)  # (C, C)
    mit = sample_w[target]  # (N, C)

    # compensation factor: boost for misclassified high-scoring negatives
    scores = jax.nn.softmax(pred, axis=-1)
    self_scores = jnp.take_along_axis(scores, target[:, None], axis=1)
    score_ratio = scores / jnp.clip(self_scores, 1e-12, None)
    comp = jnp.where(score_ratio > 1.0, jnp.power(score_ratio, q), 1.0)

    seesaw = mit * comp
    seesaw = jnp.where(onehot > 0, 1.0, seesaw)
    shifted = pred + jnp.log(jnp.clip(seesaw, eps, None)) * (1 - onehot)
    lse = jax.scipy.special.logsumexp(shifted, axis=-1)
    picked = jnp.take_along_axis(shifted, target[:, None], axis=1)[:, 0]
    loss = lse - picked
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def dice_loss(pred, target, weight=None, eps=1e-3, naive=False,
              activate=True, reduction='mean', avg_factor=None):
    """Dice loss over flattened masks (N, ...)."""
    if activate:
        pred = jax.nn.sigmoid(pred)
    pred_f = pred.reshape(pred.shape[0], -1)
    target_f = target.reshape(target.shape[0], -1).astype(pred.dtype)
    a = (pred_f * target_f).sum(-1)
    if naive:
        b = pred_f.sum(-1)
        c = target_f.sum(-1)
        d = (2 * a + eps) / (b + c + eps)
    else:
        b = (pred_f * pred_f).sum(-1)
        c = (target_f * target_f).sum(-1)
        d = (2 * a + eps) / (b + c + eps)
    loss = 1 - d
    return weight_reduce_loss(loss, weight, reduction, avg_factor)
