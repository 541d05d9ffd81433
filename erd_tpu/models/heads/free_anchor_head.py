"""FreeAnchor loss on the RetinaNet head (learning-to-match bags).

Behavioural mirror of
/root/reference/mmdet/models/dense_heads/free_anchor_retina_head.py +
configs/free_anchor/freeanchor_r50_fpn_1x_coco.py: per gt, a bag of the
``pre_anchor_topk``(=50) highest-IoU anchors; positive loss =
alpha * BCE(mean-max_j P_cls*P_loc, 1) per gt (:259-286); negative loss =
(1-alpha) * FL-style BCE toward 0 of cls_prob * (1 - P{a in A+}) summed
over all anchors / (num_pos * topk) (:289-312). P{a in A+} is the
per-class saturated-IoU max over gts (:167-221) computed from the DECODED
boxes, no grad. Loss_bbox inside the bag is SmoothL1(beta=0.11, w=0.75)
with coder stds (0.1, 0.1, 0.2, 0.2). Sparse torch ops become dense
masked (G, A) algebra under vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...losses import smooth_l1_loss
from ...structures.boxes import bbox_overlaps
from ...task.coder import DeltaXYWHBBoxCoder

EPS = 1e-12


def free_anchor_coder():
    return DeltaXYWHBBoxCoder(target_stds=(0.1, 0.1, 0.2, 0.2))


def free_anchor_loss(anchors, cls_scores, bbox_preds, gt, num_classes,
                     coder: DeltaXYWHBBoxCoder, pre_anchor_topk=50,
                     bbox_thr=0.6, gamma=2.0, alpha=0.5,
                     smooth_l1_beta=0.11, bbox_loss_weight=0.75):
    """anchors (A, 4); cls (B, A, C) logits; bbox (B, A, 4) deltas."""
    b, a, c = cls_scores.shape
    cls_prob = jax.nn.sigmoid(cls_scores)

    def single(cls_p, deltas, gt_b, gt_l, gt_m):
        g = gt_b.shape[0]
        # ---- P{a_j in A+} per class (no grad, decoded boxes) ----
        pred_boxes = jax.lax.stop_gradient(coder.decode(anchors, deltas))
        iou = bbox_overlaps(gt_b, pred_boxes)              # (G, A)
        iou = jnp.where(gt_m[:, None], iou, 0.0)
        t2 = jnp.clip(iou.max(axis=1, keepdims=True), bbox_thr + 1e-12,
                      None)
        obj_prob = jnp.clip((iou - bbox_thr) / (t2 - bbox_thr), 0.0, 1.0)
        obj_prob = jnp.where(gt_m[:, None], obj_prob, 0.0)
        onehot = jax.nn.one_hot(gt_l, num_classes)          # (G, C)
        # per (anchor, class) max over gts of that class
        box_prob = jnp.einsum(
            'ga,gc->acg', obj_prob, onehot).max(-1)         # (A, C)

        # ---- bags: topk anchors by anchor IoU per gt ----
        q = bbox_overlaps(gt_b, anchors)                    # (G, A)
        q = jnp.where(gt_m[:, None], q, -1.0)
        _, matched = jax.lax.top_k(q, pre_anchor_topk)      # (G, K)
        m_cls = cls_p[matched]                              # (G, K, C)
        m_cls_prob = jnp.take_along_axis(
            m_cls, gt_l[:, None, None].repeat(pre_anchor_topk, 1),
            axis=2)[..., 0]                                 # (G, K)
        m_anchors = anchors[matched]                        # (G, K, 4)
        m_targets = coder.encode(m_anchors, gt_b[:, None].repeat(
            pre_anchor_topk, 1))
        lb = smooth_l1_loss(deltas[matched], m_targets, beta=smooth_l1_beta,
                            reduction='none').sum(-1) * bbox_loss_weight
        m_box_prob = jnp.exp(-lb)                           # (G, K)

        # positive bag: -alpha * log(mean-max)
        mp = m_cls_prob * m_box_prob
        w = 1.0 / jnp.clip(1.0 - mp, EPS, None)
        w = w / w.sum(axis=1, keepdims=True)
        bag_prob = (w * mp).sum(axis=1)
        pos_loss = alpha * -jnp.log(jnp.clip(bag_prob, EPS, 1.0))
        pos_loss = jnp.where(gt_m, pos_loss, 0.0)
        return box_prob, pos_loss.sum(), gt_m.sum().astype(jnp.float32)

    box_probs, pos_losses, num_pos = jax.vmap(single)(
        cls_prob, bbox_preds, gt.bboxes, gt.labels, gt.mask)
    total_pos = jnp.maximum(num_pos.sum(), 1.0)
    positive_bag_loss = pos_losses.sum() / total_pos

    neg_prob = jnp.clip(cls_prob * (1.0 - box_probs), EPS, 1.0 - EPS)
    neg = jnp.power(neg_prob, gamma) * -jnp.log(1.0 - neg_prob)
    negative_bag_loss = (1.0 - alpha) * neg.sum() / \
        jnp.maximum(total_pos * pre_anchor_topk, 1.0)
    return dict(positive_bag_loss=positive_bag_loss,
                negative_bag_loss=negative_bag_loss)
