"""Point sampling + masked conv (TPU-native equivalents of mmcv ops).

- ``point_sample`` mirrors mmcv.ops.point_sample: bilinear sampling of a
  feature map at normalized [0, 1] point coordinates with
  ``align_corners=False`` grid-sample semantics (PointRend / mask heads).
- ``masked_conv2d`` mirrors mmcv.ops.MaskedConv2d semantics: the reference
  kernel is an *optimization* that computes the conv only at masked
  positions; functionally it equals conv(x) * mask, which is the efficient
  dense form on TPU (XLA fuses the mask multiply into the conv epilogue).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _grid_sample_bilinear(img, ys, xs):
    """img (H, W, C); ys/xs unnormalized pixel coords; border-zero
    (grid_sample padding_mode='zeros', align_corners=False)."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def corner(yy, xx):
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        v = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return v * ok[..., None]

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
            v10 * wy * (1 - wx) + v11 * wy * wx)


def point_sample(feat, points, align_corners=False):
    """feat (H, W, C); points (..., 2) in [0, 1] (x, y) -> (..., C).

    align_corners=False: pixel centers at (i + 0.5)/size (the mmcv/torch
    grid_sample convention used by PointRend).
    """
    h, w, _ = feat.shape
    if align_corners:
        xs = points[..., 0] * (w - 1)
        ys = points[..., 1] * (h - 1)
    else:
        xs = points[..., 0] * w - 0.5
        ys = points[..., 1] * h - 0.5
    return _grid_sample_bilinear(feat, ys, xs)


def masked_conv2d(x, mask, weight, bias=None, stride=1):
    """x (B, H, W, Cin); mask (B, H, W) bool/float; weight (K, K, Cin, Co).

    Output positions where mask == 0 are zero (mmcv MaskedConv2d contract).
    """
    k = weight.shape[0]
    pad = (k - 1) // 2
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), weight.astype(jnp.float32),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if bias is not None:
        out = out + bias
    return out * mask[..., None].astype(out.dtype)
