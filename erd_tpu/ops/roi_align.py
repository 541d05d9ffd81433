"""RoIAlign in pure JAX (gather-based bilinear sampling).

TPU-native replacement for mmcv's CUDA RoIAlign kernel
(/root/reference/mmdet/models/roi_heads use ``RoIAlign(output_size=7,
sampling_ratio=0, aligned=True)`` via SingleRoIExtractor). ``aligned=True``
semantics: subtract 0.5 after scaling (no pixel-corner offset), each output
bin averages ``sampling_ratio^2`` bilinear samples placed at the bin's
regular sub-grid. The reference's adaptive sampling_ratio=0 (ceil(bin size))
is data-dependent, so a fixed ratio (default 2, the common static choice) is
used instead — a documented, bounded deviation.

Multi-level extraction maps each RoI to an FPN level with mmdet's
finest_scale rule and blends via masked selection so shapes stay static.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_gather(feat, ys, xs):
    """feat (H, W, C); ys/xs (...,) -> (..., C) bilinear samples with mmcv
    RoIAlign boundary semantics: samples strictly outside [-1, H]x[-1, W]
    contribute zero; in-range coords are clamped to [0, size-1] with the
    reference's edge handling (y_low >= H-1 => y = y_low, ly = 0)."""
    h, w, _ = feat.shape
    inside = (ys >= -1.0) & (ys <= h) & (xs >= -1.0) & (xs <= w)
    y = jnp.clip(ys, 0.0, None)
    x = jnp.clip(xs, 0.0, None)
    y0i = jnp.minimum(y.astype(jnp.int32), h - 1)
    x0i = jnp.minimum(x.astype(jnp.int32), w - 1)
    y = jnp.where(y0i >= h - 1, jnp.asarray(h - 1, y.dtype), y)
    x = jnp.where(x0i >= w - 1, jnp.asarray(w - 1, x.dtype), x)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    wy1 = y - y0i
    wx1 = x - x0i
    v00 = feat[y0i, x0i]
    v01 = feat[y0i, x1i]
    v10 = feat[y1i, x0i]
    v11 = feat[y1i, x1i]
    wy1 = wy1[..., None]
    wx1 = wx1[..., None]
    out = (v00 * (1 - wy1) * (1 - wx1) + v01 * (1 - wy1) * wx1 +
           v10 * wy1 * (1 - wx1) + v11 * wy1 * wx1)
    return jnp.where(inside[..., None], out, 0.0)


def roi_align(feat, rois, out_size=7, spatial_scale=1.0, sampling_ratio=2,
              aligned=True):
    """feat (H, W, C); rois (R, 4) xyxy in IMAGE coords -> (R, out, out, C)."""
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    roi_w = jnp.maximum(x2 - x1, 1e-6 if aligned else 1.0)
    roi_h = jnp.maximum(y2 - y1, 1e-6 if aligned else 1.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    s = sampling_ratio
    # sample offsets within a bin: (i + .5)/s for i in [0, s)
    sub = (jnp.arange(s) + 0.5) / s  # (s,)
    # grid: out*s sample positions along each axis
    grid = (jnp.arange(out_size)[:, None] + sub[None, :]).reshape(-1)  # (out*s,)

    ys = y1[:, None] + bin_h[:, None] * grid[None, :]  # (R, out*s)
    xs = x1[:, None] + bin_w[:, None] * grid[None, :]
    yy = jnp.broadcast_to(ys[:, :, None],
                          (rois.shape[0], out_size * s, out_size * s))
    xx = jnp.broadcast_to(xs[:, None, :],
                          (rois.shape[0], out_size * s, out_size * s))
    samples = jax.vmap(lambda y, x: _bilinear_gather(feat, y, x))(yy, xx)
    # (R, out*s, out*s, C) -> average s x s sub-samples per bin
    r = rois.shape[0]
    c = feat.shape[-1]
    samples = samples.reshape(r, out_size, s, out_size, s, c)
    return samples.mean(axis=(2, 4))


def map_roi_levels(rois, num_levels, finest_scale=56):
    """mmdet SingleRoIExtractor.map_roi_levels: level by sqrt(area)."""
    scale = jnp.sqrt(jnp.maximum(
        (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 1e-6))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl.astype(jnp.int32), 0, num_levels - 1)


def multilevel_roi_align(feats: Sequence[jnp.ndarray], rois,
                         strides=(4, 8, 16, 32), out_size=7,
                         sampling_ratio=2, finest_scale=56):
    """feats: per-level (H_l, W_l, C); rois (R, 4) image coords.

    Computes RoIAlign on every level and selects per-roi by the finest_scale
    rule — static shapes at 4x compute (levels are cheap relative to the
    head FLOPs).
    """
    num_levels = len(strides)
    lvl = map_roi_levels(rois, num_levels, finest_scale)
    outs = []
    for i, (f, s) in enumerate(zip(feats, strides)):
        outs.append(roi_align(f, rois, out_size, 1.0 / s, sampling_ratio))
    stacked = jnp.stack(outs)  # (L, R, out, out, C)
    sel = jax.nn.one_hot(lvl, num_levels, axis=0,
                         dtype=stacked.dtype)  # (L, R)
    return (stacked * sel[:, :, None, None, None]).sum(axis=0)
