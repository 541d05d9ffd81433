"""Multi-scale deformable attention sampling (Deformable DETR).

TPU-native replacement for mmcv's MultiScaleDeformableAttention CUDA kernel
(/root/reference/mmdet refs in SURVEY.md section 2.9): per query, per head,
per level, K learned sampling locations are bilinearly read from the value
maps and combined with softmaxed attention weights. Pure gather/weighted-sum
— XLA lowers the bilinear reads to vectorized dynamic-gathers (forward-only
dense math; offsets/weights gradients are elementwise).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def ms_deform_attn_sample(value_levels, sampling_locs, attn_weights):
    """Core sampling.

    Args:
        value_levels: list of L tensors (H_l, W_l, n_heads, head_dim) —
            one image's per-level value maps.
        sampling_locs: (Q, n_heads, L, K, 2) normalized [0, 1] xy.
        attn_weights: (Q, n_heads, L, K) softmaxed over (L, K).

    Returns:
        (Q, n_heads, head_dim).
    """
    q, n_heads, n_levels, k, _ = sampling_locs.shape
    outs = []
    for lvl, v in enumerate(value_levels):
        h, w = v.shape[0], v.shape[1]
        loc = sampling_locs[:, :, lvl]  # (Q, heads, K, 2)
        xs = loc[..., 0] * w - 0.5
        ys = loc[..., 1] * h - 0.5
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        wx = xs - x0
        wy = ys - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x1i = x0i + 1
        y1i = y0i + 1
        head_idx = jnp.arange(n_heads)[None, :, None]  # (1, heads, 1)

        def read(yy, xx):
            # torch grid_sample(padding_mode='zeros') semantics: each corner
            # outside the map contributes zero, not a clamped edge read.
            ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            yc = jnp.clip(yy, 0, h - 1)
            xc = jnp.clip(xx, 0, w - 1)
            return v[yc, xc, head_idx] * ok[..., None]

        v00 = read(y0i, x0i)
        v01 = read(y0i, x1i)
        v10 = read(y1i, x0i)
        v11 = read(y1i, x1i)
        wx_ = wx[..., None]
        wy_ = wy[..., None]
        samp = (v00 * (1 - wy_) * (1 - wx_) + v01 * (1 - wy_) * wx_ +
                v10 * wy_ * (1 - wx_) + v11 * wy_ * wx_)
        outs.append((samp * attn_weights[:, :, lvl][..., None]).sum(axis=2))
    return sum(outs)  # (Q, heads, head_dim)


def make_level_start_index(spatial_shapes):
    import numpy as np
    sizes = [h * w for h, w in spatial_shapes]
    return np.concatenate([[0], np.cumsum(sizes)])
