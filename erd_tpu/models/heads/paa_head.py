"""PAA: probabilistic anchor assignment via a 2-component GMM over losses.

Behavioural mirror of /root/reference/mmdet/models/dense_heads/paa_head.py
(+ configs/paa/paa_r50_fpn_1x_coco.py), TPU-redesigned:

* first match: MaxIoU with pos_iou_thr 0.1 — every anchor whose best-IoU
  gt clears 0.1 is a candidate for that gt;
* candidate score (:180-237, computed under no-grad): per-anchor joint
  loss = sum-over-classes focal(cls) + GIoU(decoded, gt);
* per (gt, level) keep the topk=9 lowest-loss candidates (:283-299),
  pool levels, fit a 2-component 1-D GMM per gt (sklearn in the
  reference :310-334 — here a fixed-iteration masked EM, spherical, means
  initialized at the min/max loss exactly like the reference's inits);
* separation scheme (c) (:349-384): positives are component-0 (low-loss)
  samples whose loss does not exceed the component-0 sample with the
  highest mixture likelihood; gts with < 2 pooled candidates keep no
  positives (:305-306);
* final losses: focal cls (avg global num_pos), GIoU * 1.3 on decoded
  positives, BCE IoU-prediction * 0.5 against IoU(decoded, gt).

Everything is dense-masked: the per-gt python loops of the reference
become (N, G) mask algebra and a lax.fori EM over the padded gt axis.
Score voting at test time is intentionally not ported (with_score_voting
is a post-NMS rescoring refinement; the standard NMS path is used).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...losses import (binary_cross_entropy_with_logits, giou_loss,
                       sigmoid_focal_loss)
from ...structures.boxes import bbox_overlaps
from .gfl_head import AnchorContext

INF = 1e8


def _masked_gmm_em(losses, mask, iters=10, reg_covar=1e-6):
    """Per-column 1-D 2-component EM. losses/mask: (N, G).

    Returns (resp0 (N,G), loglik (N,G)) with garbage on masked entries.
    """
    x = losses
    big = jnp.where(mask, x, -INF)
    small = jnp.where(mask, x, INF)
    m0 = small.min(axis=0)  # (G,)
    m1 = big.max(axis=0)
    v0 = jnp.ones_like(m0)
    v1 = jnp.ones_like(m1)
    w0 = jnp.full_like(m0, 0.5)
    w1 = jnp.full_like(m1, 0.5)

    def log_norm(x, m, v):
        return -0.5 * (jnp.log(2 * jnp.pi * v)[None]
                       + (x - m[None]) ** 2 / v[None])

    def step(_, carry):
        m0, v0, w0, m1, v1, w1 = carry
        l0 = jnp.log(jnp.clip(w0, 1e-12, None))[None] + log_norm(x, m0, v0)
        l1 = jnp.log(jnp.clip(w1, 1e-12, None))[None] + log_norm(x, m1, v1)
        mx = jnp.maximum(l0, l1)
        r0 = jnp.exp(l0 - mx)
        r1 = jnp.exp(l1 - mx)
        resp0 = jnp.where(mask, r0 / (r0 + r1), 0.0)
        resp1 = jnp.where(mask, 1.0 - resp0, 0.0)
        n0 = jnp.clip(resp0.sum(0), 1e-12, None)
        n1 = jnp.clip(resp1.sum(0), 1e-12, None)
        m0n = (resp0 * x).sum(0) / n0
        m1n = (resp1 * x).sum(0) / n1
        v0n = (resp0 * (x - m0n[None]) ** 2).sum(0) / n0 + reg_covar
        v1n = (resp1 * (x - m1n[None]) ** 2).sum(0) / n1 + reg_covar
        cnt = jnp.clip(mask.sum(0).astype(x.dtype), 1.0, None)
        return (m0n, v0n, n0 / cnt, m1n, v1n, n1 / cnt)

    m0, v0, w0, m1, v1, w1 = jax.lax.fori_loop(
        0, iters, step, (m0, v0, w0, m1, v1, w1))
    # order components so 0 is the low-loss one (means_init already is,
    # but EM can swap)
    swap = m0 > m1
    m0s = jnp.where(swap, m1, m0)
    v0s = jnp.where(swap, v1, v0)
    w0s = jnp.where(swap, w1, w0)
    m1s = jnp.where(swap, m0, m1)
    v1s = jnp.where(swap, v0, v1)
    w1s = jnp.where(swap, w0, w1)
    l0 = jnp.log(jnp.clip(w0s, 1e-12, None))[None] + log_norm(x, m0s, v0s)
    l1 = jnp.log(jnp.clip(w1s, 1e-12, None))[None] + log_norm(x, m1s, v1s)
    resp0 = 1.0 / (1.0 + jnp.exp(l1 - l0))
    loglik = jnp.logaddexp(l0, l1)
    return resp0, loglik


def paa_assign(ctx: AnchorContext, cls_scores, decoded, gt_b, gt_l, gt_m,
               num_classes, topk=9, pos_iou_thr=0.1):
    """One image. Returns (pos_mask (N,), gt_idx (N,)).

    cls_scores/decoded must be stop-gradients of the current predictions.
    """
    anchors = jnp.asarray(ctx.anchors)
    n = anchors.shape[0]
    g = gt_b.shape[0]
    ious = bbox_overlaps(anchors, gt_b)  # (N, G)
    ious = jnp.where(gt_m[None, :], ious, -1.0)
    best_iou = ious.max(axis=1)
    gt_idx = ious.argmax(axis=1).astype(jnp.int32)
    cand = best_iou >= pos_iou_thr

    # joint per-candidate loss under its first-match gt
    labels = jnp.clip(gt_l[gt_idx], 0, num_classes - 1)
    l_cls = sigmoid_focal_loss(cls_scores, labels, reduction='none')
    l_box = giou_loss(decoded, gt_b[gt_idx], reduction='none')
    pos_loss = l_cls + l_box  # (N,)

    belongs = cand[:, None] & \
        (gt_idx[:, None] == jnp.arange(g)[None, :]) & gt_m[None, :]

    # per (level, gt): rank candidates by loss, keep topk
    sel = jnp.zeros((n, g), bool)
    start = 0
    for n_l in ctx.num_level_anchors:
        loss_lg = jnp.where(belongs[start:start + n_l],
                            pos_loss[start:start + n_l, None], INF)
        order = jnp.argsort(loss_lg, axis=0)  # (n_l, G)
        ranks = jnp.zeros((n_l, g), jnp.int32)
        ranks = jax.vmap(
            lambda o: jnp.zeros((n_l,), jnp.int32).at[o].set(
                jnp.arange(n_l, dtype=jnp.int32)),
            in_axes=1, out_axes=1)(order)
        k = min(topk, n_l)
        sel_l = (ranks < k) & belongs[start:start + n_l]
        sel = sel.at[start:start + n_l].set(sel_l)
        start += n_l

    # GMM over each gt's pooled candidate losses
    resp0, loglik = _masked_gmm_em(pos_loss[:, None] *
                                   jnp.ones((1, g)), sel)
    enough = sel.sum(0) >= 2  # (G,) reference skips gts with < 2 samples
    fg = sel & (resp0 >= 0.5)
    # likelihood threshold: the fg sample with max loglik caps the loss
    score_fg = jnp.where(fg, loglik, -INF)
    thr_idx = score_fg.argmax(axis=0)  # (G,)
    thr_loss = pos_loss[thr_idx]  # (G,)
    pos_ng = fg & (pos_loss[:, None] <= thr_loss[None, :]) & \
        enough[None, :]
    pos = pos_ng.any(axis=1)
    return pos, gt_idx


def paa_loss(ctx: AnchorContext, cls_scores, bbox_preds, iou_preds, gt,
             coder, num_classes, topk=9):
    """cls (B,N,C) logits; bbox (B,N,4) deltas; iou_preds (B,N) logits."""
    anchors = jnp.asarray(ctx.anchors)

    def single(cls_s, reg, iou_p, gt_b, gt_l, gt_m):
        decoded = coder.decode(anchors, reg)
        pos, gt_idx = paa_assign(
            ctx, jax.lax.stop_gradient(cls_s),
            jax.lax.stop_gradient(decoded), gt_b, gt_l, gt_m,
            num_classes, topk=topk)
        labels = jnp.where(pos, jnp.clip(gt_l[gt_idx], 0,
                                         num_classes - 1), num_classes)
        l_cls = sigmoid_focal_loss(cls_s, labels, reduction='none').sum()
        tgt = gt_b[gt_idx]
        lb = giou_loss(decoded, tgt, reduction='none')
        iou_t = jnp.where(pos, bbox_overlaps(
            jax.lax.stop_gradient(decoded), tgt, is_aligned=True), 0.0)
        # reference paa_head.py:168-172: GIoU weighted per-positive by
        # the detached IoU target (clamped >= EPS), avg by its sum
        l_box = (lb * jnp.clip(iou_t, 1e-6, None) * pos).sum()
        l_iou = (binary_cross_entropy_with_logits(iou_p, iou_t) *
                 pos).sum()
        return (l_cls, l_box, l_iou, pos.sum().astype(jnp.float32),
                (jnp.clip(iou_t, 1e-6, None) * pos).sum())

    l_cls, l_box, l_iou, n_pos, iou_af = jax.vmap(single)(
        cls_scores, bbox_preds, iou_preds, gt.bboxes, gt.labels, gt.mask)
    b = cls_scores.shape[0]
    # reference paa_head.py:152-172: cls avg = max(num_pos, num_imgs),
    # bbox avg = iou_target.sum(), iou avg = num_pos — all batch-global
    num_pos = jnp.maximum(n_pos.sum(), 1.0)
    return {
        'loss_cls': l_cls.sum() / jnp.maximum(n_pos.sum(), float(b)),
        'loss_bbox': 1.3 * l_box.sum() / jnp.maximum(iou_af.sum(), 1e-6),
        'loss_iou': 0.5 * l_iou.sum() / num_pos,
    }


def paa_loss_with_assignment(ctx: AnchorContext, cls_scores, bbox_preds,
                             iou_preds, gt, pos, gt_idx, coder,
                             num_classes):
    """PAA losses with an EXTERNALLY supplied assignment (LAD: the frozen
    teacher's GMM split, reference lad_head.py loss)."""
    anchors = jnp.asarray(ctx.anchors)

    def single(cls_s, reg, iou_p, pos_i, gidx_i, gt_b, gt_l, gt_m):
        decoded = coder.decode(anchors, reg)
        labels = jnp.where(pos_i, jnp.clip(gt_l[gidx_i], 0,
                                           num_classes - 1), num_classes)
        l_cls = sigmoid_focal_loss(cls_s, labels, reduction='none').sum()
        tgt = gt_b[gidx_i]
        lb = giou_loss(decoded, tgt, reduction='none')
        iou_t = jnp.where(pos_i, bbox_overlaps(
            jax.lax.stop_gradient(decoded), tgt, is_aligned=True), 0.0)
        l_box = (lb * jnp.clip(iou_t, 1e-6, None) * pos_i).sum()
        l_iou = (binary_cross_entropy_with_logits(iou_p, iou_t) *
                 pos_i).sum()
        return (l_cls, l_box, l_iou, pos_i.sum().astype(jnp.float32),
                (jnp.clip(iou_t, 1e-6, None) * pos_i).sum())

    l_cls, l_box, l_iou, n_pos, iou_af = jax.vmap(single)(
        cls_scores, bbox_preds, iou_preds, pos, gt_idx, gt.bboxes,
        gt.labels, gt.mask)
    b = cls_scores.shape[0]
    num_pos = jnp.maximum(n_pos.sum(), 1.0)
    return {
        'loss_cls': l_cls.sum() / jnp.maximum(n_pos.sum(), float(b)),
        'loss_bbox': 1.3 * l_box.sum() / jnp.maximum(iou_af.sum(), 1e-6),
        'loss_iou': 0.5 * l_iou.sum() / num_pos,
    }
