"""Box math in pure jnp, all fixed-shape.

Semantics match the reference implementations:
  - distance2bbox / bbox2distance: /root/reference/mmdet/structures/bbox/transforms.py:147,206
  - bbox_overlaps: /root/reference/mmdet/structures/bbox/bbox_overlaps.py:13
All functions broadcast over leading batch dims and never use data-dependent
shapes, so they are safe inside jit/vmap/pjit.
"""
from __future__ import annotations

import jax.numpy as jnp


def distance2bbox(points, distance, max_shape=None):
    """Decode (left, top, right, bottom) distances into xyxy boxes.

    Args:
        points: (..., 2) anchor-center xy.
        distance: (..., 4) distances to the four sides.
        max_shape: optional (H, W) to clip into. May be a traced array so a
            single compiled fn serves every image shape in a bucket.

    Returns:
        (..., 4) xyxy boxes.
    """
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    bboxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    if max_shape is not None:
        h = max_shape[0]
        w = max_shape[1]
        wh = jnp.stack([w, h, w, h]).astype(bboxes.dtype)
        bboxes = jnp.clip(bboxes, 0, wh)
    return bboxes


def bbox2distance(points, bbox, max_dis=None, eps=0.1):
    """Encode xyxy boxes as clamped (l, t, r, b) distances from points."""
    left = points[..., 0] - bbox[..., 0]
    top = points[..., 1] - bbox[..., 1]
    right = bbox[..., 2] - points[..., 0]
    bottom = bbox[..., 3] - points[..., 1]
    dist = jnp.stack([left, top, right, bottom], axis=-1)
    if max_dis is not None:
        dist = jnp.clip(dist, 0, max_dis - eps)
    return dist


def bbox_area(boxes):
    """(..., 4) xyxy -> (...,) area; degenerate boxes give 0."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)
    return w * h


def bbox_overlaps(bboxes1, bboxes2, mode='iou', is_aligned=False, eps=1e-6):
    """Pairwise or aligned overlaps between two box sets.

    Args:
        bboxes1: (..., m, 4) xyxy.
        bboxes2: (..., n, 4) xyxy (or (..., m, 4) when ``is_aligned``).
        mode: 'iou' | 'iof' | 'giou'.
        is_aligned: if True, compute element-wise overlaps of equal-length
            sets, returning (..., m); else the full (..., m, n) matrix.
    """
    assert mode in ('iou', 'iof', 'giou'), f'unknown mode {mode}'
    area1 = bbox_area(bboxes1)
    area2 = bbox_area(bboxes2)

    if not is_aligned:
        b1 = bboxes1[..., :, None, :]
        b2 = bboxes2[..., None, :, :]
        area1 = area1[..., :, None]
        area2 = area2[..., None, :]
    else:
        b1, b2 = bboxes1, bboxes2

    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.maximum(rb - lt, 0)
    overlap = wh[..., 0] * wh[..., 1]

    if mode == 'iof':
        union = area1
    else:
        union = area1 + area2 - overlap
    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode in ('iou', 'iof'):
        return ious

    # GIoU: subtract the normalized hole in the smallest enclosing box.
    enc_lt = jnp.minimum(b1[..., :2], b2[..., :2])
    enc_rb = jnp.maximum(b1[..., 2:], b2[..., 2:])
    enc_wh = jnp.maximum(enc_rb - enc_lt, 0)
    enc_area = jnp.maximum(enc_wh[..., 0] * enc_wh[..., 1], eps)
    return ious - (enc_area - union) / enc_area


def bbox_center(boxes):
    """(..., 4) xyxy -> (..., 2) center xy."""
    return (boxes[..., :2] + boxes[..., 2:]) / 2.0


def xyxy_to_xywh(boxes):
    """COCO-result format conversion (mirrors coco_metric.py xyxy2xywh)."""
    return jnp.concatenate(
        [boxes[..., :2], boxes[..., 2:] - boxes[..., :2]], axis=-1)


def scale_boxes(boxes, scale_factor):
    """Multiply boxes by per-axis (sx, sy) scale factors."""
    sx, sy = scale_factor[..., 0], scale_factor[..., 1]
    s = jnp.stack([sx, sy, sx, sy], axis=-1)
    return boxes * s
