"""Box coders.

DistancePointBBoxCoder mirrors
/root/reference/mmdet/models/task_modules/coders/distance_point_bbox_coder.py:28-85;
DeltaXYWHBBoxCoder mirrors delta_xywh_bbox_coder.py (for the broader zoo).
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
                 target_stds=(1., 1., 1., 1.), clip_border=True):
        self.means = jnp.asarray(target_means, jnp.float32)
        self.stds = jnp.asarray(target_stds, jnp.float32)
        self.clip_border = clip_border

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
        dw = jnp.clip(deltas[..., 2], -max_ratio, max_ratio)
        dh = jnp.clip(deltas[..., 3], -max_ratio, max_ratio)
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        gx = px + pw * dx
        gy = py + ph * dy
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        boxes = jnp.stack([gx - gw * 0.5, gy - gh * 0.5,
                           gx + gw * 0.5, gy + gh * 0.5], axis=-1)
        if max_shape is not None and self.clip_border:
            h, w = max_shape[0], max_shape[1]
            wh = jnp.stack([w, h, w, h]).astype(boxes.dtype)
            boxes = jnp.clip(boxes, 0, wh)
        return boxes
