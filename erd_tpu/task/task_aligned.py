"""Task-aligned assigner (TOOD/RTMDet family), static-shape.

Behavioural mirror of /root/reference/mmdet/models/task_modules/assigners/
task_aligned_assigner.py: alignment metric = score(gt class)^alpha *
IoU(pred, gt)^beta; each gt takes its top-k anchors by the metric (center
must lie inside the gt); conflicts resolve by max IoU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.boxes import bbox_overlaps
from .atss import AssignResult

INF = 1e8


def task_aligned_assign(priors_xy, decoded_boxes, cls_scores, gt_bboxes,
                        gt_labels, gt_mask, topk=13, alpha=1.0, beta=6.0):
    """One image.

    Args:
        priors_xy: (N, 2) prior centers.
        decoded_boxes: (N, 4) predicted boxes.
        cls_scores: (N, C) predicted class probabilities.
        gt_*: padded ground truth.
    """
    n = priors_xy.shape[0]
    g = gt_bboxes.shape[0]
    ious = bbox_overlaps(decoded_boxes, gt_bboxes)  # (N, G)
    scores = jnp.take_along_axis(
        jnp.pad(cls_scores, ((0, 0), (0, 1))),
        jnp.clip(gt_labels, 0, cls_scores.shape[1])[None, :].repeat(n, 0),
        axis=1)  # (N, G)
    metric = jnp.power(jnp.clip(scores, 1e-8, None), alpha) * \
        jnp.power(jnp.clip(ious, 1e-8, None), beta)

    # reference task_aligned_assigner.py:97-115: topk candidates are
    # drawn over ALL priors by raw metric FIRST, and only then filtered
    # by metric > 0 and center-inside-gt (with a 0.01 margin) — an
    # outside high-metric candidate costs a slot rather than promoting
    # the next inside point
    x, y = priors_xy[:, 0:1], priors_xy[:, 1:2]
    lt = jnp.minimum(x - gt_bboxes[None, :, 0], y - gt_bboxes[None, :, 1])
    rb = jnp.minimum(gt_bboxes[None, :, 2] - x, gt_bboxes[None, :, 3] - y)
    inside = jnp.minimum(lt, rb) > 0.01
    inside = inside[:, 0] if inside.ndim == 3 else inside
    valid = inside & gt_mask[None, :]
    metric = jnp.where(gt_mask[None, :], metric, -INF)

    k = min(topk, n)
    top_vals, top_idx = jax.lax.top_k(metric.T, k)  # (G, k)
    chosen = jnp.zeros((n, g), bool).at[
        top_idx, jnp.arange(g)[:, None].repeat(k, 1)].max(top_vals > 0)
    chosen = chosen & valid

    sel = jnp.where(chosen, ious, -INF)
    max_overlaps = sel.max(axis=1)
    gt_idx = sel.argmax(axis=1).astype(jnp.int32)
    pos_mask = max_overlaps > -INF
    labels = jnp.where(pos_mask, gt_labels[gt_idx], -1).astype(jnp.int32)
    return AssignResult(pos_mask=pos_mask, gt_idx=gt_idx,
                        max_overlaps=jnp.where(pos_mask, max_overlaps,
                                               -INF),
                        labels=labels)
