"""Guided Anchoring (GA) kit: location/shape prediction + feature
adaption + masked inference.

Behavioural mirror of
/root/reference/mmdet/models/dense_heads/guided_anchor_head.py (+
ga_rpn_head.py defaults): per level a 1x1 *loc* conv predicts anchor
existence (focal loss on center-region targets: the sigma_center(=0.25)
region of each gt at its scale-assigned level is positive and the
sigma_ignore(=0.5) ring is ignored, anchor_target's ga_loc_targets), a
1x1 *shape* conv predicts (dw, dh) with anchor wh = sigma * stride *
exp(d) (sigma=8 octave scale); a *feature adaption* deform conv whose
offsets derive from the shape prediction re-aligns the features; the
shape loss is the bounded-IoU of the predicted-shape anchor against the
best-matching gt (approximated over the 9 octave anchors,
ga_shape_targets); inference keeps only locations with loc prob >
loc_filter_thr — the mmcv MaskedConv2d path, realized with
ops.masked_conv2d semantics (dense conv x mask).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import bounded_iou_loss, sigmoid_focal_loss
from ...ops.deform_conv import deform_conv2d
from ...structures.boxes import bbox_overlaps
from ..layers import bias_init_prob, torch_pad

# train_cfg center_ratio / ignore_ratio — every reference GA config uses
# 0.2 / 0.5 (configs/guided_anchoring/*: center_ratio=0.2, ignore_ratio=0.5;
# guided_anchor_head.py:421-426 r1=(1-center)/2 keeps the central `ratio`
# fraction of the gt box)
SIGMA_CENTER = 0.2
SIGMA_IGNORE = 0.5
OCTAVE_SCALE = 8.0


class GAFeatureAdaption(nn.Module):
    """1x1 on the (detached) shape pred -> 3x3 deform-conv offsets."""
    features: int

    @nn.compact
    def __call__(self, x, shape_pred):
        off = nn.Conv(9 * 2, (1, 1),
                      kernel_init=nn.initializers.normal(0.1),
                      use_bias=False, name='conv_offset')(
            jax.lax.stop_gradient(shape_pred)).astype(jnp.float32)
        b, h, w, _ = off.shape
        offsets = off.reshape(b, h, w, 9, 2)
        weight = self.param('kernel', nn.initializers.normal(0.01),
                            (3, 3, x.shape[-1], self.features),
                            jnp.float32)

        def single(xi, oi):
            return deform_conv2d(xi.astype(jnp.float32), oi[:, :, None],
                                 weight, stride=1, padding=1)

        return nn.relu(jax.vmap(single)(x, offsets))


class GARPNHeadNet(nn.Module):
    """GA-RPN: shared 3x3 conv, loc/shape branches, adapted cls/reg."""
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(self.feat_channels, (3, 3),
                       padding=[torch_pad(3)] * 2,
                       kernel_init=nn.initializers.normal(0.01),
                       name='rpn_conv')
        loc_conv = nn.Conv(1, (1, 1),
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init_prob(0.01),
                           name='conv_loc')
        shape_conv = nn.Conv(2, (1, 1),
                             kernel_init=nn.initializers.normal(0.01),
                             name='conv_shape')
        adaption = GAFeatureAdaption(self.feat_channels,
                                     name='feature_adaption')
        cls_conv = nn.Conv(1, (1, 1),
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_cls')
        reg_conv = nn.Conv(4, (1, 1),
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        locs, shapes, clss, regs = [], [], [], []
        for x in feats:
            y = nn.relu(conv(x))
            loc = loc_conv(y).astype(jnp.float32)
            shp = shape_conv(y).astype(jnp.float32)
            adapted = adaption(y, shp)
            locs.append(loc)
            shapes.append(shp)
            clss.append(cls_conv(adapted).astype(jnp.float32))
            regs.append(reg_conv(adapted).astype(jnp.float32))
        return locs, shapes, clss, regs


def approx_wh_factors(octave_scale=8.0, scales_per_octave=3,
                      ratios=(0.5, 1.0, 2.0)):
    """(A, 2) per-stride (w, h) multipliers of the approx anchor set
    (mmdet AnchorGenerator convention: w = s/sqrt(r), h = s*sqrt(r))."""
    out = []
    for i in range(scales_per_octave):
        s = octave_scale * 2 ** (i / scales_per_octave)
        for r in ratios:
            out.append((s / np.sqrt(r), s * np.sqrt(r)))
    return np.asarray(out, np.float32)


def ga_loc_targets(points, strides, num_level_points, gt_bboxes, gt_mask,
                   featmap_strides=(8, 16, 32, 64, 128),
                   octave_scale=OCTAVE_SCALE,
                   sigma_center=SIGMA_CENTER, sigma_ignore=SIGMA_IGNORE):
    """Dense (P,) loc labels: 1 positive, 0 negative, -1 ignore.

    Reference ga_loc_targets: each gt is routed to the level whose stride
    matches its scale (log2 of sqrt area / 8); the sigma_center box is
    positive there, the sigma_ignore box is ignored there AND the
    sigma_center region is ignored on the two adjacent levels.
    """
    scale = jnp.sqrt(jnp.clip(
        (gt_bboxes[:, 2] - gt_bboxes[:, 0]) *
        (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 1.0, None))
    target_lvl = jnp.clip(
        jnp.floor(jnp.log2(scale / octave_scale / featmap_strides[0]
                           ) + 0.5),
        0, len(featmap_strides) - 1).astype(jnp.int32)
    lvl_of_point = jnp.asarray(np.repeat(
        np.arange(len(num_level_points)), num_level_points))

    def region(scale_f):
        cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
        cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
        hw = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * scale_f / 2
        hh = (gt_bboxes[:, 3] - gt_bboxes[:, 1]) * scale_f / 2
        inside = ((points[:, None, 0] >= (cx - hw)[None]) &
                  (points[:, None, 0] <= (cx + hw)[None]) &
                  (points[:, None, 1] >= (cy - hh)[None]) &
                  (points[:, None, 1] <= (cy + hh)[None]))
        return inside & gt_mask[None, :]

    in_center = region(sigma_center)
    in_ignore = region(sigma_ignore)
    same_lvl = lvl_of_point[:, None] == target_lvl[None, :]
    adj_lvl = jnp.abs(lvl_of_point[:, None] - target_lvl[None, :]) == 1
    pos = (in_center & same_lvl).any(axis=1)
    # the sigma_ignore region is zero-weighted on the gt's own level AND
    # on the two adjacent levels (guided_anchor_head.py:459-488: the
    # ignore_map painted at r2 on lvl +-1)
    ign = (in_ignore & (same_lvl | adj_lvl)).any(axis=1)
    labels = jnp.where(pos, 1, jnp.where(ign, -1, 0))
    return labels.astype(jnp.int32)


def ga_shape_targets(points, stride_per_point, gt_bboxes, gt_mask,
                     approx_whs=None, octave_scale=OCTAVE_SCALE):
    """Best-gt assignment for the shape branch (ApproxMaxIoUAssigner):
    per location the max IoU over the approx anchor set (``approx_whs``
    (w, h) stride multipliers, e.g. the 9 octave anchors for GA-RetinaNet)
    against each gt; default is the single square octave anchor."""
    if approx_whs is None:
        approx_whs = np.asarray([[octave_scale, octave_scale]], np.float32)
    iou = None
    for fw, fh in approx_whs:  # small static loop (<= 9 approx anchors)
        hw_ = stride_per_point * float(fw) / 2
        hh_ = stride_per_point * float(fh) / 2
        approx = jnp.stack([points[:, 0] - hw_, points[:, 1] - hh_,
                            points[:, 0] + hw_, points[:, 1] + hh_], -1)
        i = bbox_overlaps(approx, gt_bboxes)
        iou = i if iou is None else jnp.maximum(iou, i)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best = iou.argmax(axis=1)
    pos = iou.max(axis=1) > 0.3
    return best, pos


def ga_losses(points, strides, num_level_points, loc_flat, shape_flat,
              gt, loc_weight=1.0, shape_weight=0.2,
              featmap_strides=(8, 16, 32, 64, 128),
              octave_scale=OCTAVE_SCALE, approx_whs=None):
    """loc (B,P) logits; shape (B,P,2). Returns GA's loc+shape losses."""

    def single(loc_i, shp_i, gt_b, gt_m):
        labels = ga_loc_targets(points, strides, num_level_points, gt_b,
                                gt_m, featmap_strides=featmap_strides,
                                octave_scale=octave_scale)
        # reference weighting (guided_anchor_head.py:489-499): positives 1,
        # ignore regions 0, plain negatives 0.1; normalized by
        # total_cells / 200, not num_pos
        w = jnp.where(labels == 1, 1.0,
                      jnp.where(labels == -1, 0.0, 0.1))
        avg = jnp.asarray(labels.shape[0] / 200.0, jnp.float32)
        lloc = sigmoid_focal_loss(
            loc_i[:, None], jnp.where(labels == 1, 0, 1),
            weight=w, avg_factor=avg)
        best, pos = ga_shape_targets(points, strides, gt_b, gt_m,
                                     approx_whs=approx_whs,
                                     octave_scale=octave_scale)
        wh = octave_scale * strides[:, None] * jnp.exp(
            jnp.clip(shp_i, -8.0, 8.0))
        pred_boxes = jnp.stack(
            [points[:, 0] - wh[:, 0] / 2, points[:, 1] - wh[:, 1] / 2,
             points[:, 0] + wh[:, 0] / 2, points[:, 1] + wh[:, 1] / 2],
            -1)
        lb = bounded_iou_loss(pred_boxes, gt_b[best],
                              reduction='none').sum(-1)
        n_sp = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        lshape = (lb * pos).sum() / n_sp
        return lloc, lshape

    lloc, lshape = jax.vmap(single)(loc_flat, shape_flat, gt.bboxes,
                                    gt.mask)
    return dict(loss_loc=loc_weight * lloc.mean(),
                loss_shape=shape_weight * lshape.mean())


def guided_anchors(points, stride_per_point, shape_flat,
                   octave_scale=OCTAVE_SCALE):
    """(P, 4) anchors from shape predictions: center = point, wh =
    sigma * stride * exp(shape) (guided_anchor_head.py anchor shapes)."""
    wh = octave_scale * stride_per_point[:, None] * jnp.exp(
        jnp.clip(shape_flat, -8.0, 8.0))
    return jnp.stack(
        [points[:, 0] - wh[:, 0] / 2, points[:, 1] - wh[:, 1] / 2,
         points[:, 0] + wh[:, 0] / 2, points[:, 1] + wh[:, 1] / 2], -1)


def ga_rpn_loss(points, strides, num_level_points, loc_flat, shape_flat,
                cls_flat, reg_flat, gt, rng, anchor_coder, cfg,
                featmap_strides=(4, 8, 16, 32, 64)):
    """Full GA-RPN training loss (ga_rpn_head.py loss): the GA pair
    (loc focal + shape bounded-IoU, ga_losses) plus the usual RPN
    objectness/regression pair computed against the GUIDED anchors
    (detached shape preds) with MaxIoU(0.7/0.3) + RandomSampler(256).

    cls_flat (B, P) logits; reg_flat (B, P, 4); cfg: RPNTrainConfig.
    """
    from ...losses import (binary_cross_entropy_with_logits,
                           smooth_l1_loss)
    from ...task.max_iou import max_iou_assign
    from ...task.samplers import random_sample

    losses = ga_losses(points, strides, num_level_points, loc_flat,
                       shape_flat, gt, featmap_strides=featmap_strides)
    anchors_b = jax.vmap(
        lambda s: guided_anchors(points, strides,
                                 jax.lax.stop_gradient(s)))(shape_flat)
    b = cls_flat.shape[0]
    rngs = jax.random.split(rng, b)

    def single(anchors, cls_i, reg_i, gt_b, gt_l, gt_m, key):
        res = max_iou_assign(anchors, gt_b, jnp.zeros_like(gt_l), gt_m,
                             pos_iou_thr=cfg.pos_iou_thr,
                             neg_iou_thr=cfg.neg_iou_thr,
                             min_pos_iou=cfg.min_pos_iou,
                             match_low_quality=True)
        neg_mask = (~res.pos_mask) & (res.labels != -2)
        sample = random_sample(key, res.pos_mask, neg_mask,
                               num=cfg.num_samples,
                               pos_fraction=cfg.pos_fraction)
        sel_w = sample.valid.astype(jnp.float32)
        n_sampled = jnp.maximum(sel_w.sum(), 1.0)
        tgt = jnp.where(sample.is_pos, 1.0, 0.0)
        bce = binary_cross_entropy_with_logits(cls_i[sample.idx], tgt)
        loss_cls = (bce * sel_w).sum() / n_sampled
        pos_w = (sample.is_pos & sample.valid).astype(jnp.float32)
        deltas_t = anchor_coder.encode(anchors[sample.idx],
                                       gt_b[res.gt_idx[sample.idx]])
        deltas_t = jnp.nan_to_num(deltas_t, nan=0.0, posinf=0.0,
                                  neginf=0.0)
        sl1 = smooth_l1_loss(reg_i[sample.idx], deltas_t,
                             reduction='none').sum(-1)
        loss_bbox = (sl1 * pos_w).sum() / n_sampled
        return loss_cls, loss_bbox

    lc, lb = jax.vmap(single)(anchors_b, cls_flat, reg_flat, gt.bboxes,
                              gt.labels, gt.mask, rngs)
    losses['loss_rpn_cls'] = lc.mean()
    losses['loss_rpn_bbox'] = lb.mean()
    return losses


def ga_rpn_proposals(points, strides, num_level_points, loc_flat,
                     shape_flat, cls_flat, reg_flat, img_shapes,
                     anchor_coder, cfg, loc_filter_thr=0.01):
    """Guided proposals (ga_rpn_head.py get_results_single): objectness
    is masked where loc prob <= loc_filter_thr (the MaskedConv path made
    dense), per-level top-k -> decode against guided anchors -> NMS.
    cfg: ProposalConfig. Returns (B, max_per_img, 4) + scores + mask.
    """
    from ...ops import nms_select
    slices = np.concatenate([[0], np.cumsum(num_level_points)])

    def single(loc_i, shape_i, cls_i, reg_i, img_shape):
        anchors = guided_anchors(points, strides, shape_i)
        keep_loc = jax.nn.sigmoid(loc_i) > loc_filter_thr
        scores = jnp.where(keep_loc, jax.nn.sigmoid(cls_i), 0.0)
        boxes_all, scores_all, lvl_all = [], [], []
        for lvl in range(len(num_level_points)):
            lo, hi = int(slices[lvl]), int(slices[lvl + 1])
            k = min(cfg.nms_pre, hi - lo)
            top_s, top_idx = jax.lax.top_k(scores[lo:hi], k)
            boxes = anchor_coder.decode(anchors[lo:hi][top_idx],
                                        reg_i[lo:hi][top_idx],
                                        max_shape=img_shape)
            boxes_all.append(boxes)
            scores_all.append(top_s)
            lvl_all.append(jnp.full((k,), lvl, jnp.int32))
        boxes = jnp.concatenate(boxes_all)
        sc = jnp.concatenate(scores_all)
        lvls = jnp.concatenate(lvl_all)
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        valid = (sc > 0) & (w > cfg.min_bbox_size) & (h > cfg.min_bbox_size)
        ob, os_, _, om = nms_select(boxes, sc, lvls, cfg.iou_threshold,
                                    cfg.max_per_img, valid_mask=valid)
        return ob, os_, om

    return jax.vmap(single)(loc_flat, shape_flat, cls_flat, reg_flat,
                            img_shapes)


# ---------------------------------------------------------------------------
# GA-RetinaNet (ga_retina_head.py): retina towers + GA loc/shape branches,
# per-branch feature adaption, guided-anchor focal/SmoothL1 losses
# ---------------------------------------------------------------------------
RETINA_OCTAVE_SCALE = 4.0  # square_anchor_generator scales=[4]


class GARetinaHeadNet(nn.Module):
    """Guided-Anchor RetinaNet head (ga_retina_head.py:52-120): 4-conv
    cls/reg towers; conv_loc (1ch 1x1) off the cls tower, conv_shape
    (2ch 1x1) off the reg tower; separate feature adaption per branch;
    3x3 retina_cls/retina_reg over the adapted features (the MaskedConv2d
    inference path is realized densely — masking happens in predict)."""
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4

    @nn.compact
    def __call__(self, feats):
        convs_cls = [
            nn.Conv(self.feat_channels, (3, 3), padding=[torch_pad(3)] * 2,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f'cls_conv_{i}')
            for i in range(self.stacked_convs)
        ]
        convs_reg = [
            nn.Conv(self.feat_channels, (3, 3), padding=[torch_pad(3)] * 2,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f'reg_conv_{i}')
            for i in range(self.stacked_convs)
        ]
        conv_loc = nn.Conv(1, (1, 1),
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init_prob(0.01), name='conv_loc')
        conv_shape = nn.Conv(2, (1, 1),
                             kernel_init=nn.initializers.normal(0.01),
                             name='conv_shape')
        adaption_cls = GAFeatureAdaption(self.feat_channels,
                                         name='feature_adaption_cls')
        adaption_reg = GAFeatureAdaption(self.feat_channels,
                                         name='feature_adaption_reg')
        retina_cls = nn.Conv(self.num_classes, (3, 3),
                             padding=[torch_pad(3)] * 2,
                             kernel_init=nn.initializers.normal(0.01),
                             bias_init=bias_init_prob(0.01),
                             name='retina_cls')
        retina_reg = nn.Conv(4, (3, 3), padding=[torch_pad(3)] * 2,
                             kernel_init=nn.initializers.normal(0.01),
                             name='retina_reg')
        locs, shapes, clss, regs = [], [], [], []
        for x in feats:
            c = x
            r = x
            for conv in convs_cls:
                c = nn.relu(conv(c))
            for conv in convs_reg:
                r = nn.relu(conv(r))
            loc = conv_loc(c).astype(jnp.float32)
            shp = conv_shape(r).astype(jnp.float32)
            locs.append(loc)
            shapes.append(shp)
            clss.append(retina_cls(adaption_cls(c, shp)).astype(
                jnp.float32))
            regs.append(retina_reg(adaption_reg(r, shp)).astype(
                jnp.float32))
        return locs, shapes, clss, regs


def ga_retina_loss(points, strides, num_level_points, loc_flat, shape_flat,
                   cls_flat, reg_flat, gt, img_shapes, num_classes, coder,
                   pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0,
                   smooth_l1_beta=0.04,
                   featmap_strides=(8, 16, 32, 64, 128)):
    """GA-RetinaNet training loss (ga-retinanet_r50_fpn_1x config): the GA
    pair over the retina approx set (octave 4, 3 scales x 3 ratios,
    loss_shape weight 1.0) plus dense focal cls + SmoothL1(beta=.04) reg
    computed against the GUIDED anchors with MaxIoU(0.5/0.5/min 0.0),
    normalized by num_pos (no sampling — retina is dense)."""
    from ...losses import sigmoid_focal_loss as focal
    from ...losses.smooth_l1 import smooth_l1_loss
    from ...task.max_iou import max_iou_assign

    losses = ga_losses(points, strides, num_level_points, loc_flat,
                       shape_flat, gt, shape_weight=1.0,
                       featmap_strides=featmap_strides,
                       octave_scale=RETINA_OCTAVE_SCALE,
                       approx_whs=approx_wh_factors(RETINA_OCTAVE_SCALE))
    anchors_b = jax.vmap(
        lambda s: guided_anchors(points, strides,
                                 jax.lax.stop_gradient(s),
                                 octave_scale=RETINA_OCTAVE_SCALE)
    )(shape_flat)

    def single(anchors, cls_i, reg_i, gt_b, gt_l, gt_m):
        res = max_iou_assign(anchors, gt_b, gt_l, gt_m,
                             pos_iou_thr=pos_iou_thr,
                             neg_iou_thr=neg_iou_thr,
                             min_pos_iou=min_pos_iou)
        labels = jnp.where(res.pos_mask, res.labels, num_classes)
        ignore = res.labels == -2
        w = 1.0 - ignore.astype(jnp.float32)
        n_pos = jnp.maximum(res.pos_mask.sum().astype(jnp.float32), 1.0)
        loss_cls = focal(cls_i, labels, weight=w, avg_factor=n_pos)
        deltas_t = coder.encode(anchors, gt_b[res.gt_idx])
        deltas_t = jnp.nan_to_num(deltas_t, nan=0.0, posinf=0.0,
                                  neginf=0.0)
        sl1 = smooth_l1_loss(reg_i, deltas_t, beta=smooth_l1_beta,
                             reduction='none').sum(-1)
        loss_bbox = (sl1 * res.pos_mask).sum() / n_pos
        return loss_cls, loss_bbox

    lc, lb = jax.vmap(single)(anchors_b, cls_flat, reg_flat, gt.bboxes,
                              gt.labels, gt.mask)
    losses['loss_cls'] = lc.mean()
    losses['loss_bbox'] = lb.mean()
    return losses


def ga_retina_predict(points, strides, num_level_points, loc_flat,
                      shape_flat, cls_flat, reg_flat, meta, coder, cfg,
                      num_classes, loc_filter_thr=0.01, rescale=True):
    """GA-RetinaNet inference: guided anchors from shape preds, scores
    masked where loc prob <= loc_filter_thr (MaskedConv2d made dense),
    per-level top-k -> DeltaXYWH decode -> class NMS."""
    from ...ops import cap_candidates, filter_scores_and_topk, nms_select
    from ...structures import DetResults
    from ...structures.boxes import scale_boxes
    slices = np.concatenate([[0], np.cumsum(num_level_points)])

    def single(loc_i, shp_i, cls_i, reg_i, img_shape, scale_factor):
        anchors = guided_anchors(points, strides, shp_i,
                                 octave_scale=RETINA_OCTAVE_SCALE)
        keep = jax.nn.sigmoid(loc_i) > loc_filter_thr
        scores = jax.nn.sigmoid(cls_i) * keep[:, None]
        boxes_all, scores_all, labels_all, mask_all = [], [], [], []
        for lvl in range(len(num_level_points)):
            lo, hi = int(slices[lvl]), int(slices[lvl + 1])
            n_l = hi - lo
            k = min(cfg.nms_pre, n_l * num_classes) if cfg.nms_pre > 0 \
                else n_l * num_classes
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores[lo:hi], cfg.score_thr, k)
            boxes = coder.decode(anchors[lo:hi][top_idx],
                                 reg_i[lo:hi][top_idx],
                                 max_shape=img_shape)
            boxes_all.append(boxes)
            scores_all.append(top_s)
            labels_all.append(top_lab)
            mask_all.append(mask)
        boxes = jnp.concatenate(boxes_all)
        sc = jnp.concatenate(scores_all)
        labels = jnp.concatenate(labels_all)
        valid = jnp.concatenate(mask_all)
        sc, valid, boxes, labels = cap_candidates(
            sc, valid, cfg.pre_nms_total, boxes, labels)
        if rescale:
            boxes = scale_boxes(boxes, 1.0 / scale_factor)
        ob, os_, ol, om = nms_select(boxes, sc, labels, cfg.iou_threshold,
                                     cfg.max_per_img, valid_mask=valid)
        return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

    return jax.vmap(single)(loc_flat, shape_flat, cls_flat, reg_flat,
                            meta.img_shape, meta.scale_factor)
