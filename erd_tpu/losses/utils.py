"""Loss weighting/reduction protocol.

Every loss primitive takes ``(pred, target, weight=None, reduction='mean',
avg_factor=None)`` and reduces via :func:`weight_reduce_loss`, matching the
reference protocol (/root/reference/mmdet/models/losses/utils.py,
weight_reduce_loss body): with ``avg_factor`` and reduction 'mean', the loss is
``sum(loss * weight) / (avg_factor + eps)``. ``avg_factor`` may be a traced
scalar (it is all-reduced across the data mesh with pmean upstream).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def reduce_loss(loss, reduction):
    if reduction == 'none':
        return loss
    if reduction == 'mean':
        return loss.mean()
    if reduction == 'sum':
        return loss.sum()
    raise ValueError(f'unknown reduction {reduction!r}')


def weight_reduce_loss(loss, weight=None, reduction='mean', avg_factor=None):
    """Apply element-wise weight then reduce.

    ``avg_factor`` semantics follow the reference: mean -> sum / (avg+eps);
    combining avg_factor with reduction='sum' is an error.
    """
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == 'mean':
        return loss.sum() / (avg_factor + _EPS)
    if reduction == 'none':
        return loss
    raise ValueError('avg_factor can not be used with reduction="sum"')


def weighted_loss(loss_func):
    """Decorator adding (weight, reduction, avg_factor) to an element-wise loss."""

    @functools.wraps(loss_func)
    def wrapper(pred, target, weight=None, reduction='mean', avg_factor=None,
                **kwargs):
        loss = loss_func(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction, avg_factor)

    return wrapper


def binary_cross_entropy_with_logits(pred, target):
    """Numerically stable element-wise BCE on logits (no reduction)."""
    return (jnp.maximum(pred, 0) - pred * target +
            jnp.log1p(jnp.exp(-jnp.abs(pred))))


def cross_entropy_int(logits, labels, axis=-1):
    """Element-wise CE with integer labels: logsumexp(x) - x[label]."""
    lse = jax.scipy.special.logsumexp(logits, axis=axis)
    picked = jnp.take_along_axis(
        logits, jnp.expand_dims(labels.astype(jnp.int32), axis), axis=axis)
    return lse - jnp.squeeze(picked, axis)
