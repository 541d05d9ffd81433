"""Vectorized NMS variants + corner pooling.

Mirrors the remaining native-ish layer ops of the reference
(/root/reference/mmdet/models/layers/__init__.py): ``mask_matrix_nms``
(SOLO's Matrix NMS — here in its bbox form), ``fast_nms`` (YOLACT), and
``CornerPool`` (CornerNet's directional max pooling). Unlike greedy NMS all
three are loop-free — ideal TPU citizens.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.boxes import bbox_overlaps


def matrix_nms(boxes, scores, labels, valid_mask=None, sigma=2.0,
               kernel='gaussian'):
    """Matrix NMS: soft score decay from higher-scoring same-class overlaps.

    Returns decayed scores (same order). Fully vectorized: one IoU matrix,
    two maxima, one exp — no sequential suppression.
    """
    n = boxes.shape[0]
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, 0.0)
    iou = bbox_overlaps(boxes, boxes)  # (N, N)
    same = labels[:, None] == labels[None, :]
    higher = scores[None, :] > scores[:, None]  # j scores higher than i
    # iou of i with every higher-scoring same-class j
    decay_iou = jnp.where(same & higher, iou.T, 0.0)  # (i, j)
    # for each suppressor j, its own max overlap with anything above IT
    comp_iou = decay_iou.max(axis=1)  # (N,)
    if kernel == 'gaussian':
        decay = jnp.exp(-sigma * (decay_iou ** 2 -
                                  comp_iou[None, :] ** 2))
        decay = decay.min(axis=1)
    else:  # linear
        decay = ((1 - decay_iou) /
                 jnp.maximum(1 - comp_iou[None, :], 1e-6)).min(axis=1)
    return scores * decay


def fast_nms(boxes, scores, labels, iou_threshold=0.5, valid_mask=None):
    """YOLACT fast NMS: keep a box unless a HIGHER-scoring same-class box
    overlaps it above the threshold (one matrix pass, slightly over-
    suppressive vs greedy by design)."""
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, -jnp.inf)
    order = jnp.argsort(-scores)
    sboxes = boxes[order]
    slabels = labels[order]
    iou = bbox_overlaps(sboxes, sboxes)
    idx = jnp.arange(boxes.shape[0])
    earlier = idx[:, None] < idx[None, :]  # i before j in score order
    same = slabels[:, None] == slabels[None, :]
    sup = jnp.where(earlier & same, iou, 0.0)
    keep_sorted = sup.max(axis=0) <= iou_threshold
    keep_sorted = keep_sorted & (scores[order] > -jnp.inf)
    return jnp.zeros(boxes.shape[0], bool).at[order].set(keep_sorted)


def corner_pool(x, direction):
    """CornerNet corner pooling: running max along a spatial direction.

    x: (..., H, W, C); direction in {'top', 'bottom', 'left', 'right'}.
    'top' means each pixel takes the max of everything BELOW it (scanning
    upward), matching mmcv's TopPool, etc. Implemented as flipped cumulative
    maxima — pure lax.cummax, no kernel needed.
    """
    h_ax = x.ndim - 3
    w_ax = x.ndim - 2
    if direction == 'bottom':
        return jax.lax.cummax(x, axis=h_ax)
    if direction == 'top':
        return jnp.flip(jax.lax.cummax(jnp.flip(x, h_ax), axis=h_ax), h_ax)
    if direction == 'right':
        return jax.lax.cummax(x, axis=w_ax)
    if direction == 'left':
        return jnp.flip(jax.lax.cummax(jnp.flip(x, w_ax), axis=w_ax), w_ax)
    raise ValueError(direction)


def nms_match(boxes, scores, iou_threshold, valid_mask=None):
    """Static-shape mmcv.ops.nms_match: greedy NMS grouping.

    Returns (keep_mask, group_leader): group_leader[i] is the index of the
    kept box whose greedy group box i joined (leaders map to themselves).
    Equivalence to the sequential reference: in greedy NMS a box is removed
    from the pool by the FIRST (highest-scored) kept box overlapping it
    above the threshold, so leader(i) = argmax-score kept j with
    IoU(i, j) > thr. Invalid slots get leader -1.
    """
    from .nms import nms_mask
    from ..structures.boxes import bbox_overlaps

    if valid_mask is None:
        valid_mask = jnp.ones(boxes.shape[0], bool)
    keep = nms_mask(boxes, scores, iou_threshold, valid_mask=valid_mask)
    iou = bbox_overlaps(boxes, boxes)
    # candidate leaders: kept boxes with IoU > thr (self-IoU 1 > thr covers
    # the leader itself)
    cand = keep[None, :] & (iou > iou_threshold) & valid_mask[:, None]
    s = jnp.where(cand, scores[None, :], -jnp.inf)
    leader = s.argmax(axis=1)
    has = jnp.isfinite(s.max(axis=1)) & valid_mask
    return keep, jnp.where(has, leader, -1)
