"""MaxIoU assigner (RetinaNet/Faster-RCNN family), static-shape.

Mirrors /root/reference/mmdet/models/task_modules/assigners/max_iou_assigner.py
semantics: anchors with max-IoU >= pos_iou_thr are positive, < neg_iou_thr are
negative, in between are ignored; each gt's best anchor is forced positive
when match_low_quality (IoU >= min_pos_iou).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..structures.boxes import bbox_overlaps
from .atss import AssignResult


def max_iou_assign(anchors, gt_bboxes, gt_labels, gt_mask,
                   pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0,
                   match_low_quality=True, valid_flags=None, overlaps=None):
    """``overlaps`` (N, G), when given, replaces the anchor-gt IoU matrix —
    the ApproxMaxIoUAssigner protocol (approx_max_iou_assigner.py:126-141)
    scores each square prior by the max IoU over its octave's approx
    anchors and then runs the standard MaxIoU thresholding on that."""
    if overlaps is None:
        overlaps = bbox_overlaps(anchors, gt_bboxes)  # (N, G)
    overlaps = jnp.where(gt_mask[None, :], overlaps, -1.0)
    if valid_flags is not None:
        overlaps = jnp.where(valid_flags[:, None], overlaps, -1.0)

    max_overlaps = overlaps.max(axis=1)
    gt_idx = overlaps.argmax(axis=1).astype(jnp.int32)

    pos_mask = max_overlaps >= pos_iou_thr
    ignore_mask = (max_overlaps >= neg_iou_thr) & (max_overlaps < pos_iou_thr)

    if match_low_quality:
        # reference max_iou_assigner.py:217-232 semantics, exactly:
        # gt_max_assign_all=True reassigns EVERY anchor tying the gt's
        # best IoU (not just the argmax); the python loop runs gts in
        # index order, so the highest-index forcing gt wins; and the
        # overwrite applies even to anchors already positive from step 3.
        gt_best = overlaps.max(axis=0)  # (G,)
        force = gt_mask & (gt_best >= min_pos_iou) & (gt_best > -1.0)
        eligible = (overlaps == gt_best[None, :]) & force[None, :]  # (N,G)
        forced_pos = eligible.any(axis=1)
        g = gt_bboxes.shape[0]
        last_idx = (g - 1) - jnp.argmax(eligible[:, ::-1], axis=1)
        gt_idx = jnp.where(forced_pos, last_idx.astype(jnp.int32), gt_idx)
        pos_mask = pos_mask | forced_pos
        ignore_mask = ignore_mask & ~forced_pos

    labels = jnp.where(pos_mask, gt_labels[gt_idx], -1).astype(jnp.int32)
    # ignored anchors signalled via label -2 (caller zeroes their weights).
    labels = jnp.where(ignore_mask & ~pos_mask, -2, labels)
    return AssignResult(pos_mask=pos_mask, gt_idx=gt_idx,
                        max_overlaps=max_overlaps, labels=labels)
