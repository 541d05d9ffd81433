"""Additional loss-zoo members.

Math mirrors the reference implementations:
  - VarifocalLoss: mmdet/models/losses/varifocal_loss.py
  - GHM-C / GHM-R: mmdet/models/losses/ghm_loss.py (gradient-density
    reweighting; the running-bin EMA variant is momentum=0 faithful here —
    stateless, jit-friendly)
  - GaussianFocalLoss: mmdet/models/losses/gaussian_focal_loss.py
  - DiceLoss: mmdet/models/losses/dice_loss.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import binary_cross_entropy_with_logits, weight_reduce_loss


def varifocal_loss(pred, target, weight=None, alpha=0.75, gamma=2.0,
                   iou_weighted=True, reduction='mean', avg_factor=None):
    """Varifocal loss on logits; target is a (N, C) IoU-aware score map."""
    pred_sigmoid = jax.nn.sigmoid(pred)
    target = target.astype(pred.dtype)
    pos = (target > 0).astype(pred.dtype)
    if iou_weighted:
        focal_weight = target * pos + \
            alpha * jnp.power(jnp.abs(pred_sigmoid - target), gamma) * \
            (1 - pos)
    else:
        focal_weight = pos + \
            alpha * jnp.power(jnp.abs(pred_sigmoid - target), gamma) * \
            (1 - pos)
    loss = binary_cross_entropy_with_logits(pred, target) * focal_weight
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def ghm_c_loss(pred, target, label_weight, bins=10, momentum=0.0,
               reduction='mean'):
    """GHM classification loss (one-hot targets, dense masked).

    Args:
        pred: (N, C) logits.
        target: (N, C) binary targets.
        label_weight: (N, C) valid mask.
    """
    edges = jnp.linspace(0, 1, bins + 1).at[-1].add(1e-6)
    g = jnp.abs(jax.lax.stop_gradient(jax.nn.sigmoid(pred)) - target)
    valid = label_weight > 0
    tot = jnp.maximum(valid.sum(), 1.0)
    weights = jnp.zeros_like(pred)
    n_nonempty = 0.0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum()
        has = (num_in_bin > 0).astype(pred.dtype)
        w = jnp.where(inds, tot / jnp.maximum(num_in_bin, 1.0), 0.0)
        weights = weights + w * has
        n_nonempty = n_nonempty + has
    weights = weights / jnp.maximum(n_nonempty, 1.0)
    loss = binary_cross_entropy_with_logits(pred, target) * weights
    if reduction == 'mean':
        return loss.sum() / tot
    return loss if reduction == 'none' else loss.sum()


def ghm_r_loss(pred, target, label_weight, mu=0.02, bins=10,
               reduction='mean'):
    """GHM regression loss over ASL1 gradients."""
    diff = pred - target
    loss = jnp.sqrt(diff * diff + mu * mu) - mu
    g = jnp.abs(jax.lax.stop_gradient(diff) /
                jnp.sqrt(mu * mu + diff * diff))
    valid = label_weight > 0
    tot = jnp.maximum(valid.sum(), 1.0)
    edges = jnp.linspace(0, 1, bins + 1).at[-1].add(1e3)
    weights = jnp.zeros_like(pred)
    n_nonempty = 0.0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum()
        has = (num_in_bin > 0).astype(pred.dtype)
        w = jnp.where(inds, tot / jnp.maximum(num_in_bin, 1.0), 0.0)
        weights = weights + w * has
        n_nonempty = n_nonempty + has
    loss = loss * weights / jnp.maximum(n_nonempty, 1.0)
    if reduction == 'mean':
        return loss.sum() / tot
    return loss if reduction == 'none' else loss.sum()


def gaussian_focal_loss(pred, gaussian_target, weight=None, alpha=2.0,
                        gamma=4.0, reduction='mean', avg_factor=None):
    """CornerNet/CenterNet focal loss on a gaussian heatmap (pred is a
    probability)."""
    eps = 1e-12
    pos_weights = (gaussian_target == 1).astype(pred.dtype)
    neg_weights = jnp.power(1 - gaussian_target, gamma)
    pos_loss = -jnp.log(pred + eps) * jnp.power(1 - pred, alpha) * \
        pos_weights
    neg_loss = -jnp.log(1 - pred + eps) * jnp.power(pred, alpha) * \
        neg_weights * (1 - pos_weights)
    loss = pos_loss + neg_loss
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def seesaw_loss(pred, target, cum_samples, weight=None, p=0.8, q=2.0,
                eps=1e-2, reduction='mean', avg_factor=None):
    """Seesaw loss (long-tail instance seg; seesaw_loss.py semantics).

    Args:
        pred: (N, C) logits (no explicit background column here).
        target: (N,) int labels in [0, C).
        cum_samples: (C,) per-class cumulative sample counts (state kept by
            the caller — a pure-function framework keeps the counter in the
            train state rather than a module buffer).
    """
    import jax
    num_classes = pred.shape[-1]
    onehot = jax.nn.one_hot(target, num_classes, dtype=pred.dtype)

    # mitigation factor: dampen negative gradients for rarer classes
    # (reference seesaw_loss.py:53-55 clamps BOTH sides to min=1)
    ratio = jnp.clip(cum_samples[None, :], 1, None) / \
        jnp.clip(cum_samples[:, None], 1, None)
    sample_w = jnp.where(ratio < 1.0, jnp.power(ratio, p), 1.0)  # (C, C)
    mit = sample_w[target]  # (N, C)

    # compensation factor: boost for misclassified high-scoring negatives
    # (reference detaches the softmax and clamps the divisor to eps)
    scores = jax.lax.stop_gradient(jax.nn.softmax(pred, axis=-1))
    self_scores = jnp.take_along_axis(scores, target[:, None], axis=1)
    score_ratio = scores / jnp.clip(self_scores, eps, None)
    comp = jnp.where(score_ratio > 1.0, jnp.power(score_ratio, q), 1.0)

    seesaw = mit * comp
    seesaw = jnp.where(onehot > 0, 1.0, seesaw)
    shifted = pred + jnp.log(jnp.clip(seesaw, eps, None)) * (1 - onehot)
    lse = jax.scipy.special.logsumexp(shifted, axis=-1)
    picked = jnp.take_along_axis(shifted, target[:, None], axis=1)[:, 0]
    loss = lse - picked
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def dice_loss(pred, target, weight=None, eps=1e-3, naive=False,
              activate=True, reduction='mean', avg_factor=None):
    """Dice loss over flattened masks (N, ...)."""
    if activate:
        pred = jax.nn.sigmoid(pred)
    pred_f = pred.reshape(pred.shape[0], -1)
    target_f = target.reshape(target.shape[0], -1).astype(pred.dtype)
    a = (pred_f * target_f).sum(-1)
    if naive:
        b = pred_f.sum(-1)
        c = target_f.sum(-1)
        d = (2 * a + eps) / (b + c + eps)
    else:
        b = (pred_f * pred_f).sum(-1)
        c = (target_f * target_f).sum(-1)
        d = (2 * a + eps) / (b + c + eps)
    loss = 1 - d
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def bounded_iou_loss(pred, target, weight=None, beta=0.2, eps=1e-3,
                     reduction='mean', avg_factor=None):
    """Bounded IoU loss (reference losses/iou_loss.py:58-108): per-coordinate
    smooth-L1 over the four bounded-fitness terms (dx, dy, dw, dh);
    the target-side quantities carry no gradient."""
    pcx = (pred[..., 0] + pred[..., 2]) * 0.5
    pcy = (pred[..., 1] + pred[..., 3]) * 0.5
    pw = pred[..., 2] - pred[..., 0]
    ph = pred[..., 3] - pred[..., 1]
    tgt = jax.lax.stop_gradient(target)
    tcx = (tgt[..., 0] + tgt[..., 2]) * 0.5
    tcy = (tgt[..., 1] + tgt[..., 3]) * 0.5
    tw = tgt[..., 2] - tgt[..., 0]
    th = tgt[..., 3] - tgt[..., 1]
    dx = tcx - pcx
    dy = tcy - pcy
    loss_dx = 1 - jnp.maximum(
        (tw - 2 * jnp.abs(dx)) / (tw + 2 * jnp.abs(dx) + eps), 0.0)
    loss_dy = 1 - jnp.maximum(
        (th - 2 * jnp.abs(dy)) / (th + 2 * jnp.abs(dy) + eps), 0.0)
    loss_dw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    loss_dh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
    loss = jnp.where(comb < beta, 0.5 * comb * comb / beta,
                     comb - 0.5 * beta)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def eiou_loss(pred, target, weight=None, smooth_point=0.1, eps=1e-7,
              reduction='mean', avg_factor=None):
    """Extended-IoU loss (reference losses/iou_loss.py:250-304)."""
    px1, py1, px2, py2 = (pred[..., 0], pred[..., 1], pred[..., 2],
                          pred[..., 3])
    tx1, ty1, tx2, ty2 = (target[..., 0], target[..., 1], target[..., 2],
                          target[..., 3])
    ex1 = jnp.minimum(px1, tx1)
    ey1 = jnp.minimum(py1, ty1)
    ix1 = jnp.maximum(px1, tx1)
    iy1 = jnp.maximum(py1, ty1)
    ix2 = jnp.minimum(px2, tx2)
    iy2 = jnp.minimum(py2, ty2)
    xmin = jnp.minimum(ix1, ix2)
    ymin = jnp.minimum(iy1, iy2)
    xmax = jnp.maximum(ix1, ix2)
    ymax = jnp.maximum(iy1, iy2)
    inter = (ix2 - ex1) * (iy2 - ey1) + (xmin - ex1) * (ymin - ey1) - \
        (ix1 - ex1) * (ymax - ey1) - (xmax - ex1) * (iy1 - ey1)
    union = (px2 - px1) * (py2 - py1) + (tx2 - tx1) * (ty2 - ty1) - \
        inter + eps
    ious = 1 - inter / union
    sign = jax.lax.stop_gradient(
        (ious < smooth_point).astype(ious.dtype))
    loss = 0.5 * sign * ious * ious / smooth_point + \
        (1 - sign) * (ious - 0.5 * smooth_point)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def associative_embedding_loss(tl_emb, br_emb, valid_mask,
                               pull_weight=0.25, push_weight=0.25):
    """Associative Embedding pull/push loss (reference losses/ae_loss.py),
    masked static-shape form for one image.

    Args:
        tl_emb, br_emb: (G,) corner embeddings gathered at the gt corner
            locations (1-d embedding as in CornerNet).
        valid_mask: (G,) bool for padded gt slots.
    Returns (pull, push) scalars, each already weighted.
    """
    m = valid_mask.astype(tl_emb.dtype)
    n = m.sum()
    mean = (tl_emb + br_emb) / 2.0
    pull = (jnp.square(tl_emb - mean) + jnp.square(br_emb - mean)) * m
    pull = pull.sum() / jnp.maximum(n, 1.0)

    margin = 1.0
    diff = jnp.abs(mean[:, None] - mean[None, :])
    pair = m[:, None] * m[None, :] * \
        (1.0 - jnp.eye(mean.shape[0], dtype=tl_emb.dtype))
    push = (jax.nn.relu(margin - diff) * pair).sum() / \
        jnp.maximum(n * (n - 1.0), 1.0)
    push = jnp.where(n > 1, push, 0.0)
    return pull_weight * pull, push_weight * push


def isr_p_weights(cls_prob_at_label, decoded_iou, pos_mask, labels,
                  num_classes, k=2.0, bias=0.0):
    """PISA importance-based sample reweighting (ISR-P), dense masked form.

    Mirrors reference losses/pisa_loss.py isr_p: positives are ranked per
    class by decoded-box IoU (IoU hierarchical local rank collapsed to the
    per-class rank; the local/global split degenerates to per-class rank for
    the dense form), importance = 1 - rank/n_cls_pos, weight =
    bias + (1 - bias) * importance^k, then renormalized so the weighted
    positive count is preserved.

    Args:
        cls_prob_at_label: (P,) unused in the rank (kept for parity hooks).
        decoded_iou: (P,) IoU of decoded pred vs its target.
        pos_mask: (P,) bool.
        labels: (P,) int.
    Returns (P,) weights (1 for negatives).
    """
    p = decoded_iou.shape[0]
    onehot = jax.nn.one_hot(labels, num_classes + 1)[:, :num_classes]
    onehot = onehot * pos_mask[:, None]
    iou_m = jnp.where(pos_mask, decoded_iou, -1.0)
    # rank within class: number of same-class positives with larger IoU
    same_cls = (labels[:, None] == labels[None, :]) & pos_mask[None, :] \
        & pos_mask[:, None]
    rank = (same_cls & (iou_m[None, :] > iou_m[:, None])).sum(axis=1)
    n_cls = jnp.maximum(same_cls.sum(axis=1).astype(jnp.float32), 1.0)
    importance = 1.0 - rank.astype(jnp.float32) / n_cls
    w = bias + (1.0 - bias) * jnp.power(importance, k)
    # renormalize: sum of pos weights == num pos
    num_pos = jnp.maximum(pos_mask.sum().astype(jnp.float32), 1.0)
    denom = jnp.maximum((w * pos_mask).sum(), 1e-6)
    w = w * num_pos / denom
    return jnp.where(pos_mask, w, 1.0)


def carl_loss(cls_prob_at_label, reg_loss_per_pos, pos_mask, k=1.0,
              bias=0.2, avg_factor=None):
    """Classification-Aware Regression Loss (reference pisa_loss.py carl):
    reg loss of each positive scaled by (bias + (1-bias)*p_cls)^k,
    normalized so the scale factors average to 1 over positives."""
    w = jnp.power(bias + (1.0 - bias) * cls_prob_at_label, k)
    num_pos = jnp.maximum(pos_mask.sum().astype(jnp.float32), 1.0)
    denom = jnp.maximum((w * pos_mask).sum(), 1e-6)
    w = jax.lax.stop_gradient(w * num_pos / denom)
    loss = (reg_loss_per_pos * w * pos_mask).sum()
    if avg_factor is not None:
        loss = loss / jnp.maximum(avg_factor, 1.0)
    return loss
