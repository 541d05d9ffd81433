"""AutoAssign dense head (fully differentiable assignment).

Behavioural mirror of
/root/reference/mmdet/models/dense_heads/autoassign_head.py +
configs/autoassign/autoassign_r50-caffe_fpn_1x_coco.py: FCOS-style towers
with an objectness branch; a learnable per-class center prior
(mean/sigma (C, 2), gaussian over stride-normalized offsets, zeroed
outside the gt, :40-134); positive loss = BCE of the
confidence-reweighted (w ~ exp(3 p_pos) * prior) joint confidence per gt
(w=0.25, avg = total gts); negative loss = focal-style logits^2 BCE toward
zero where the (point, gt-label) weight inside gts is
1 - minmax-normalized 1/(1-iou) (w=0.75, avg = sum of prior weights);
center loss = mean_img (num_gt / sum prior) * 0.75. GIoU(5.0) supplies the
reg_loss inside p_loc = exp(-reg_loss).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import giou_loss
from ...structures.boxes import bbox_overlaps, distance2bbox
from ..layers import ConvModule, Scale, bias_init_prob, torch_pad
from .fcos_head import FCOSPointContext

EPS = 1e-12


class AutoAssignHeadNet(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    strides = (8, 16, 32, 64, 128)

    @nn.compact
    def __call__(self, feats):
        cls_convs = [ConvModule(self.feat_channels, 3, norm='gn',
                                name=f'cls_conv_{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm='gn',
                                name=f'reg_conv_{i}')
                     for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init_prob(0.01), name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        conv_obj = nn.Conv(1, (3, 3), padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_objectness')
        scales = [Scale(1.0, name=f'scale_{i}')
                  for i in range(self.num_levels)]
        # learnable center prior (autoassign_head.py:46-47)
        mean = self.param('center_mean', nn.initializers.zeros,
                          (self.num_classes, 2), jnp.float32)
        sigma = self.param('center_sigma', nn.initializers.ones,
                           (self.num_classes, 2), jnp.float32)
        cls_out, reg_out, obj_out = [], [], []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for conv in cls_convs:
                cf = conv(cf)
            for conv in reg_convs:
                rf = conv(rf)
            cls_out.append(conv_cls(cf))
            obj_out.append(conv_obj(rf))
            reg = jax.nn.relu(
                scales[lvl](conv_reg(rf)).astype(jnp.float32))
            reg_out.append(reg * self.strides[lvl])
        return cls_out, reg_out, obj_out, (mean, sigma)


def autoassign_loss(ctx: FCOSPointContext, cls_flat, reg_flat, obj_flat,
                    center_mean, center_sigma, gt, num_classes,
                    pos_w=0.25, neg_w=0.75, center_w=0.75,
                    bbox_loss_weight=5.0):
    """cls (B,P,C) logits; reg (B,P,4) distances; obj (B,P) logits."""
    b, p, c = cls_flat.shape
    points = jnp.asarray(ctx.points)
    strides = jnp.asarray(ctx.strides)

    def single(cls_s, reg_d, obj_s, gt_b, gt_l, gt_m):
        g = gt_b.shape[0]
        l_ = points[:, None, 0] - gt_b[None, :, 0]
        t_ = points[:, None, 1] - gt_b[None, :, 1]
        r_ = gt_b[None, :, 2] - points[:, None, 0]
        b_ = gt_b[None, :, 3] - points[:, None, 1]
        inside = (jnp.minimum(jnp.minimum(l_, r_), jnp.minimum(t_, b_)) > 0)
        inside = inside & gt_m[None, :]

        # center prior (P, G)
        gc = jnp.stack([(gt_b[:, 0] + gt_b[:, 2]) / 2,
                        (gt_b[:, 1] + gt_b[:, 3]) / 2], -1)   # (G, 2)
        mu = center_mean[gt_l]                                # (G, 2)
        sg = center_sigma[gt_l]
        d = (points[:, None] - gc[None]) / strides[:, None, None] - mu[None]
        prior = jnp.exp(-d ** 2 / (2 * sg[None] ** 2)).prod(-1)
        prior = jnp.where(inside, prior, 0.0)

        # decoded preds vs per-gt targets
        decoded = distance2bbox(points, reg_d)                # (P, 4)
        reg_loss = jax.vmap(
            lambda gt1: giou_loss(decoded, jnp.broadcast_to(gt1,
                                                            decoded.shape),
                                  reduction='none'),
            out_axes=1)(gt_b) * bbox_loss_weight              # (P, G)
        with_iou = jax.lax.stop_gradient(
            jax.vmap(lambda gt1: bbox_overlaps(
                decoded, gt1[None], is_aligned=False)[:, 0],
                out_axes=1)(gt_b))                            # (P, G)
        ious_max = jnp.where(gt_m[None, :], with_iou, 0.0).max(
            axis=1, keepdims=True)
        ious = jnp.where(inside, jnp.broadcast_to(ious_max, inside.shape),
                         0.0)

        joint = jax.nn.sigmoid(cls_s) * jax.nn.sigmoid(obj_s)[:, None]
        p_cls = joint[:, gt_l.clip(0, c - 1)]                 # (P, G)
        p_loc = jnp.exp(-reg_loss)
        p_pos = p_cls * p_loc

        # positive loss per gt
        cw = jnp.exp(p_pos * 3) * prior
        cw = cw / jnp.clip(cw.sum(axis=0, keepdims=True), EPS, None)
        bag = (p_pos * cw).sum(axis=0)                        # (G,)
        pos = -jnp.log(jnp.clip(bag, EPS, 1.0))
        pos_loss = (pos * gt_m).sum() * pos_w

        # negative weights: 1 - normalized 1/(1-iou) inside each gt
        f = 1.0 / jnp.clip(1.0 - ious, EPS, None)             # (P, G)
        fm = jnp.where(inside, f, jnp.inf)
        fmin = jnp.where(inside.any(0), fm.min(axis=0), 0.0)
        fmx = jnp.where(inside, f, -jnp.inf)
        fmax = jnp.where(inside.any(0), fmx.max(axis=0), 1.0)
        fn = (f - fmin[None]) / jnp.clip(fmax[None] - fmin[None] + EPS,
                                         EPS, None) + EPS
        fn = jnp.clip(fn, 0.0, None)
        # scatter min over gts per (point, class): weight = min(1 - fn)
        onehot = jax.nn.one_hot(gt_l.clip(0, c - 1), c)       # (G, C)
        neg_w_pg = jnp.where(inside, 1.0 - fn, 1.0)           # (P, G)
        # for each (p, class): min over gts with that label
        pgc = jnp.where(inside[..., None] * onehot[None] > 0,
                        neg_w_pg[..., None], 1.0)             # (P, G, C)
        p_neg_weight = pgc.min(axis=1)                        # (P, C)

        logits = joint * p_neg_weight
        neg = logits ** 2 * -jnp.log(jnp.clip(1.0 - logits, EPS, 1.0))
        neg_loss = neg.sum() * neg_w

        n_gt = gt_m.sum().astype(jnp.float32)
        prior_sum = prior.sum()
        center = jnp.where(inside.any(), n_gt / jnp.clip(prior_sum, EPS,
                                                         None), 0.0)
        return pos_loss, neg_loss, prior_sum, n_gt, center

    pos_l, neg_l, prior_s, n_gt, center_l = jax.vmap(single)(
        cls_flat, reg_flat, obj_flat, gt.bboxes, gt.labels, gt.mask)
    total_gt = jnp.maximum(n_gt.sum(), 1.0)
    loss_pos = pos_l.sum() / total_gt
    loss_neg = neg_l.sum() / jnp.maximum(prior_s.sum(), 1.0)
    loss_center = center_l.mean() * center_w
    return dict(loss_pos=loss_pos, loss_neg=loss_neg,
                loss_center=loss_center)
