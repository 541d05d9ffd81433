"""SimOTA assigner (YOLOX/RTMDet family), static-shape.

Behavioural mirror of /root/reference/mmdet/models/task_modules/assigners/
sim_ota_assigner.py (differential-tested against a line-faithful torch
oracle in tests/test_assigner_oracle.py):

* a prior is a *candidate* if its center lies strictly inside ANY gt box or
  ANY center region (union over gts, :143-190) — candidates then compete
  for every gt, with a flat 100000 penalty when not inside that specific
  gt's box AND center (:125-128);
* cost = sum-over-classes BCE(sqrt(scores), onehot) + 3 * -log(IoU + 1e-7);
* per-gt dynamic-k = int(sum of the top-10 candidate IoUs), clamped >= 1
  (:198-204), then each gt takes its dynamic-k lowest-cost candidates;
* a prior matched to several gts keeps the lowest-cost one (:208-212).

All dynamic counts become masks; the per-gt top-k is a static rank
comparison against dynamic_k.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.boxes import bbox_overlaps
from .atss import AssignResult

INF = 1e8
_PENALTY = 100000.0  # reference INF (sim_ota_assigner.py:24)
_EPS = 1e-7


def sim_ota_assign(priors_xy, strides, decoded_boxes, cls_scores, gt_bboxes,
                   gt_labels, gt_mask, center_radius=2.5, candidate_topk=10,
                   iou_weight=3.0, cls_weight=1.0):
    """One image.

    Args:
        priors_xy: (N, 2) prior centers.
        strides: (N,) prior strides.
        decoded_boxes: (N, 4) predicted boxes (xyxy).
        cls_scores: (N, C) predicted class PROBABILITIES (post-sigmoid).
        gt_bboxes/gt_labels/gt_mask: padded gt.
    """
    n = priors_xy.shape[0]
    g = gt_bboxes.shape[0]

    # strict containment, mirroring deltas.min > 0 (:155-161)
    x, y = priors_xy[:, 0:1], priors_xy[:, 1:2]
    in_box = (x > gt_bboxes[None, :, 0]) & (x < gt_bboxes[None, :, 2]) & \
             (y > gt_bboxes[None, :, 1]) & (y < gt_bboxes[None, :, 3])
    in_box = in_box[:, 0] if in_box.ndim == 3 else in_box
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
    r = center_radius * strides[:, None]
    in_center = (x > cx[None, :] - r) & (x < cx[None, :] + r) & \
                (y > cy[None, :] - r) & (y < cy[None, :] + r)
    in_center = in_center[:, 0] if in_center.ndim == 3 else in_center
    pair_ok = (in_box | in_center) & gt_mask[None, :]
    # candidate priors: inside ANY gt box or center region (:186)
    valid_prior = pair_ok.any(axis=1)
    in_both = in_box & in_center

    live = valid_prior[:, None] & gt_mask[None, :]  # (N, G)
    ious = bbox_overlaps(decoded_boxes, gt_bboxes)  # (N, G)
    iou_cost = -jnp.log(ious + _EPS)
    # cls cost (:117-124): BCE(sqrt(scores), onehot) summed over ALL
    # classes — confident wrong-class predictions are penalized too.
    # For gt class g:
    #   cost = sum_c -log(1 - sqrt(p_c)) + log(1 - sqrt(p_g)) - log(sqrt(p_g))
    s = jnp.sqrt(jnp.clip(cls_scores, 0.0, 1.0))  # (N, C)
    log_s = jnp.log(jnp.clip(s, 1e-12, None))
    log_1ms = jnp.log(jnp.clip(1.0 - s, 1e-12, None))
    gl = jnp.clip(gt_labels, 0, cls_scores.shape[1] - 1)  # (G,)
    cls_cost = -log_1ms.sum(-1)[:, None] + (log_1ms - log_s)[:, gl]  # (N, G)
    cost = cls_weight * cls_cost + iou_weight * iou_cost + \
        jnp.where(in_both, 0.0, _PENALTY)
    cost = jnp.where(live, cost, INF)

    # dynamic k per gt: int(sum of top-10 candidate IoUs), >= 1. Zero
    # padding stands in for "top min(10, num_valid) rows" — IoUs are
    # non-negative, so the sums agree.
    k = min(candidate_topk, n)
    topk_ious, _ = jax.lax.top_k(jnp.where(live, ious, 0.0).T, k)  # (G, k)
    dynamic_k = jnp.clip(topk_ious.sum(axis=1).astype(jnp.int32), 1, None)

    # per-gt: mark the dynamic_k lowest-cost candidates. Penalized
    # (not-in-both) candidates stay selectable, exactly like the
    # reference's topk over the full cost column; INF rows (non-candidate
    # priors, padded gts) never make rank < dynamic_k <= num_valid.
    order = jnp.argsort(cost.T, axis=1)  # (G, N) ascending cost
    ranks = jax.vmap(lambda o: jnp.zeros((n,), jnp.int32).at[o].set(
        jnp.arange(n, dtype=jnp.int32)))(order)
    chosen = (ranks < dynamic_k[:, None]).T & (cost < INF / 2)  # (N, G)

    # conflict resolution: a prior assigned to multiple gts keeps the
    # lowest-cost one
    cost_sel = jnp.where(chosen, cost, INF)
    best_cost = cost_sel.min(axis=1)
    gt_idx = cost_sel.argmin(axis=1).astype(jnp.int32)
    pos_mask = best_cost < INF / 2

    labels = jnp.where(pos_mask, gt_labels[gt_idx], -1).astype(jnp.int32)
    max_overlaps = jnp.where(pos_mask,
                             ious[jnp.arange(n), gt_idx], -INF)
    return AssignResult(pos_mask=pos_mask, gt_idx=gt_idx,
                        max_overlaps=max_overlaps, labels=labels)
