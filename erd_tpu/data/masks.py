"""Instance-mask support for the data pipeline.

The reference carries BitmapMasks/PolygonMasks at full image resolution
(mmdet/structures/mask/structures.py). TPU twist: gt masks ride through the
batch as FIXED-SIZE coarse bitmaps (one (MASK_RES, MASK_RES) uint8 crop per
gt, normalized to the gt box), and the mask head's 28x28 targets are
produced in-jit by bilinear resampling of that crop to the RoI — the same
crop-and-resize approximation Detectron-style training uses, with the
rasterization (cv2.fillPoly) done host-side.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def polygons_to_boxmask(polygons: Sequence[np.ndarray], box,
                        mask_res: int = 56) -> np.ndarray:
    """Rasterize polygons (absolute image coords) into a box-normalized
    (mask_res, mask_res) uint8 crop."""
    import cv2
    x1, y1, x2, y2 = box
    w = max(x2 - x1, 1e-3)
    h = max(y2 - y1, 1e-3)
    out = np.zeros((mask_res, mask_res), np.uint8)
    pts = []
    for poly in polygons:
        p = np.asarray(poly, np.float32).reshape(-1, 2).copy()
        p[:, 0] = (p[:, 0] - x1) / w * mask_res
        p[:, 1] = (p[:, 1] - y1) / h * mask_res
        pts.append(np.round(p).astype(np.int32))
    if pts:
        cv2.fillPoly(out, pts, 1)
    return out


def pad_gt_masks(masks: List[np.ndarray], max_gt: int,
                 mask_res: int = 56) -> np.ndarray:
    out = np.zeros((max_gt, mask_res, mask_res), np.uint8)
    for i, m in enumerate(masks[:max_gt]):
        out[i] = m
    return out


def crop_resize_mask(gt_mask, gt_box, roi, out_size=28):
    """Resample a box-normalized gt mask crop to an RoI's 28x28 target.

    All-jnp, usable under jit/vmap. gt_mask: (R, R) float; gt_box/roi: (4,).
    """
    import jax.numpy as jnp
    r = gt_mask.shape[0]
    gx1, gy1, gx2, gy2 = gt_box[0], gt_box[1], gt_box[2], gt_box[3]
    gw = jnp.maximum(gx2 - gx1, 1e-3)
    gh = jnp.maximum(gy2 - gy1, 1e-3)
    # sample grid: roi pixel centers mapped into gt-box-normalized coords
    ys = roi[1] + (jnp.arange(out_size) + 0.5) / out_size * \
        (roi[3] - roi[1])
    xs = roi[0] + (jnp.arange(out_size) + 0.5) / out_size * \
        (roi[2] - roi[0])
    my = (ys - gy1) / gh * r - 0.5
    mx = (xs - gx1) / gw * r - 0.5
    y0 = jnp.floor(my)
    x0 = jnp.floor(mx)
    wy = my - y0
    wx = mx - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, r - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, r - 1)
    y1i = jnp.clip(y0i + 1, 0, r - 1)
    x1i = jnp.clip(x0i + 1, 0, r - 1)
    # zero outside the gt box
    in_y = (my >= -0.5) & (my <= r - 0.5)
    in_x = (mx >= -0.5) & (mx <= r - 0.5)
    m = gt_mask.astype(jnp.float32)
    v00 = m[y0i[:, None], x0i[None, :]]
    v01 = m[y0i[:, None], x1i[None, :]]
    v10 = m[y1i[:, None], x0i[None, :]]
    v11 = m[y1i[:, None], x1i[None, :]]
    wyc = wy[:, None]
    wxc = wx[None, :]
    out = (v00 * (1 - wyc) * (1 - wxc) + v01 * (1 - wyc) * wxc +
           v10 * wyc * (1 - wxc) + v11 * wyc * wxc)
    return out * (in_y[:, None] & in_x[None, :]).astype(out.dtype)
