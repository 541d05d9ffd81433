"""Box coders.

DistancePointBBoxCoder mirrors
/root/reference/mmdet/models/task_modules/coders/distance_point_bbox_coder.py:28-85;
DeltaXYWHBBoxCoder mirrors delta_xywh_bbox_coder.py (for the broader zoo);
TBLRBBoxCoder mirrors tblr_bbox_coder.py:95-226 (FSAF).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..structures.boxes import bbox2distance, distance2bbox


class DistancePointBBoxCoder:
    """Encode boxes as clamped point-to-side distances (GFL/FCOS family)."""

    def __init__(self, clip_border=True):
        self.clip_border = clip_border

    def encode(self, points, gt_bboxes, max_dis=None, eps=0.1):
        return bbox2distance(points, gt_bboxes, max_dis, eps)

    def decode(self, points, pred_bboxes, max_shape=None):
        if not self.clip_border:
            max_shape = None
        return distance2bbox(points, pred_bboxes, max_shape)


class DeltaXYWHBBoxCoder:
    """Classic (dx, dy, dw, dh) anchor-delta coder (Faster R-CNN family)."""

    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.), clip_border=True,
                 add_ctr_clamp=False, ctr_clamp=32):
        self.means = jnp.asarray(target_means, jnp.float32)
        self.stds = jnp.asarray(target_stds, jnp.float32)
        self.clip_border = clip_border
        # YOLOF: clamp the center shift to +-ctr_clamp px and cap (not
        # symmetrically clip) dw/dh (delta_xywh_bbox_coder.py add_ctr_clamp)
        self.add_ctr_clamp = add_ctr_clamp
        self.ctr_clamp = ctr_clamp

    def encode(self, bboxes, gt_bboxes):
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        gx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5
        gy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
        gw = gt_bboxes[..., 2] - gt_bboxes[..., 0]
        gh = gt_bboxes[..., 3] - gt_bboxes[..., 1]
        deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                            jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)
        return (deltas - self.means) / self.stds

    def decode(self, bboxes, deltas, max_shape=None, wh_ratio_clip=16 / 1000):
        deltas = deltas * self.stds + self.means
        max_ratio = jnp.abs(jnp.log(wh_ratio_clip))
        dx, dy = deltas[..., 0], deltas[..., 1]
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        if self.add_ctr_clamp:
            dxw = jnp.clip(pw * dx, -self.ctr_clamp, self.ctr_clamp)
            dyh = jnp.clip(ph * dy, -self.ctr_clamp, self.ctr_clamp)
            dw = jnp.clip(deltas[..., 2], None, max_ratio)
            dh = jnp.clip(deltas[..., 3], None, max_ratio)
        else:
            dxw = pw * dx
            dyh = ph * dy
            dw = jnp.clip(deltas[..., 2], -max_ratio, max_ratio)
            dh = jnp.clip(deltas[..., 3], -max_ratio, max_ratio)
        gx = px + dxw
        gy = py + dyh
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        boxes = jnp.stack([gx - gw * 0.5, gy - gh * 0.5,
                           gx + gw * 0.5, gy + gh * 0.5], axis=-1)
        if max_shape is not None and self.clip_border:
            h, w = max_shape[0], max_shape[1]
            wh = jnp.stack([w, h, w, h]).astype(boxes.dtype)
            boxes = jnp.clip(boxes, 0, wh)
        return boxes


class TBLRBBoxCoder:
    """(top, bottom, left, right) distances from the prior center, each
    normalized by the prior's height (t/b) or width (l/r), then by a shared
    ``normalizer`` (reference tblr_bbox_coder.py:95-226; FSAF uses 4.0)."""

    def __init__(self, normalizer=4.0, clip_border=True):
        self.normalizer = normalizer
        self.clip_border = clip_border

    def encode(self, bboxes, gt_bboxes):
        cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        top = (cy - gt_bboxes[..., 1]) / h
        bottom = (gt_bboxes[..., 3] - cy) / h
        left = (cx - gt_bboxes[..., 0]) / w
        right = (gt_bboxes[..., 2] - cx) / w
        return jnp.stack([top, bottom, left, right],
                         axis=-1) / self.normalizer

    def decode(self, bboxes, tblr, max_shape=None):
        loc = tblr * self.normalizer
        cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        top = loc[..., 0] * h
        bottom = loc[..., 1] * h
        left = loc[..., 2] * w
        right = loc[..., 3] * w
        boxes = jnp.stack([cx - left, cy - top, cx + right, cy + bottom],
                          axis=-1)
        if max_shape is not None and self.clip_border:
            hh, ww = max_shape[0], max_shape[1]
            wh = jnp.stack([ww, hh, ww, hh]).astype(boxes.dtype)
            boxes = jnp.clip(boxes, 0, wh)
        return boxes
