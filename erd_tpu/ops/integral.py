"""Integral distribution decoding (GFL's Integral layer).

Computes E[t] = sum_i softmax(logits)_i * i over the discrete bin set
{0..reg_max} for each of the four box sides, mirroring
/root/reference/mmdet/models/dense_heads/gfl_head.py:29-62. Parameter-free,
so it is a function, not a module.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def integral(bbox_pred, reg_max=16):
    """(..., 4*(reg_max+1)) distribution logits -> (..., 4) expected distances."""
    shape = bbox_pred.shape
    x = bbox_pred.reshape(shape[:-1] + (4, reg_max + 1))
    p = jax.nn.softmax(x, axis=-1)
    proj = jnp.arange(reg_max + 1, dtype=p.dtype)
    return jnp.einsum('...b,b->...', p, proj)
