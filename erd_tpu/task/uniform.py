"""Uniform assignment (YOLOF), dense/static-shape.

Behavioural mirror of
/root/reference/mmdet/models/task_modules/assigners/uniform_assigner.py:
each gt takes the ``match_times`` anchors with smallest L1 distance in
cxcywh space to BOTH its decoded predictions and its raw anchors (2k
candidates per gt); candidate entries whose anchor IoU with their gt is
below ``pos_ignore_thr`` are ignored; anchors whose decoded prediction has
max-IoU above ``neg_ignore_thr`` with any gt are removed from the negative
pool. Duplicate candidate writes resolve last-write-wins in the reference
scatter — reproduced here with an ordinal segment-max instead of scatter.
"""
from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..structures.boxes import bbox_overlaps

INF = 1e8


def _cxcywh(b):
    return jnp.stack([(b[..., 0] + b[..., 2]) * 0.5,
                      (b[..., 1] + b[..., 3]) * 0.5,
                      b[..., 2] - b[..., 0],
                      b[..., 3] - b[..., 1]], axis=-1)


@flax.struct.dataclass
class UniformAssignResult:
    labels: jnp.ndarray        # (N,) int; num_classes = background
    label_weights: jnp.ndarray  # (N,) 0 for ignored anchors
    cand_anchor: jnp.ndarray   # (K,) candidate anchor indices (K = 2*mt*G)
    cand_gt: jnp.ndarray       # (K,) candidate gt indices
    cand_weight: jnp.ndarray   # (K,) 1 where the candidate trains the reg
    num_pos: jnp.ndarray       # scalar: anchors finally assigned positive


def uniform_assign(anchors, decoded_preds, gt_bboxes, gt_labels, gt_mask,
                   num_classes, match_times=4, pos_ignore_thr=0.15,
                   neg_ignore_thr=0.7):
    n = anchors.shape[0]
    g = gt_bboxes.shape[0]
    k_per_gt = 2 * match_times

    gt_c = _cxcywh(gt_bboxes)
    cost_pred = jnp.abs(_cxcywh(decoded_preds)[:, None] -
                        gt_c[None]).sum(-1)     # (N, G)
    cost_anchor = jnp.abs(_cxcywh(anchors)[:, None] - gt_c[None]).sum(-1)

    # match_times smallest per gt from each cost (reference topk largest=False)
    _, idx_pred = jax.lax.top_k(-cost_pred.T, match_times)    # (G, mt)
    _, idx_anch = jax.lax.top_k(-cost_anchor.T, match_times)  # (G, mt)
    # reference flat order: mt-major, [pred gts..., anchor gts...] per row
    cand = jnp.concatenate([idx_pred.T[:, None], idx_anch.T[:, None]],
                           axis=1)              # (mt, 2, G)
    cand_anchor = cand.reshape(-1)              # (mt*2*G,)
    cand_gt = jnp.tile(jnp.arange(g), k_per_gt)

    anchor_iou = bbox_overlaps(anchors, gt_bboxes)          # (N, G)
    pred_iou = bbox_overlaps(decoded_preds, gt_bboxes)
    pred_max_iou = jnp.where(gt_mask[None], pred_iou, 0.0).max(axis=1) \
        if g > 0 else jnp.zeros(n)

    cand_valid = gt_mask[cand_gt]
    pos_iou = anchor_iou[cand_anchor, cand_gt]
    cand_ignored = pos_iou < pos_ignore_thr
    cand_weight = (cand_valid & ~cand_ignored).astype(jnp.float32)

    # last-write-wins scatter: winner = candidate with max ordinal per anchor
    ordinal = jnp.arange(cand_anchor.shape[0])
    ordv = jnp.where(cand_valid, ordinal, -1)
    winner = jax.ops.segment_max(ordv, cand_anchor, num_segments=n,
                                 indices_are_sorted=False)
    has_cand = winner >= 0
    w = jnp.clip(winner, 0, None)
    win_gt = cand_gt[w]
    win_ignored = cand_ignored[w]

    assigned_pos = has_cand & ~win_ignored
    assigned_ignore = (has_cand & win_ignored) | \
        (~has_cand & (pred_max_iou > neg_ignore_thr))
    labels = jnp.where(assigned_pos, gt_labels[win_gt], num_classes)
    labels = labels.astype(jnp.int32)
    label_weights = jnp.where(assigned_ignore & ~assigned_pos, 0.0, 1.0)
    return UniformAssignResult(
        labels=labels, label_weights=label_weights,
        cand_anchor=cand_anchor, cand_gt=cand_gt, cand_weight=cand_weight,
        num_pos=assigned_pos.sum().astype(jnp.float32))
