"""CenterNetUpdateHead (CenterNet2's improved CenterNet over FPN).

Behavioural mirror of
/root/reference/mmdet/models/dense_heads/centernet_update_head.py +
losses/gaussian_focal_loss.py gaussian_focal_loss_with_pos_inds +
configs/centernet/centernet-update_r50-caffe_fpn_ms-1x_coco.py:

- FCOS-style GN towers, conv_cls/conv_reg + per-level Scale; the reg
  branch is clamp(scale(reg), min=0) in FEATURE units at train time
  (x stride only at inference) (`forward_single` :139-163).
- Dense targets (`_get_targets_single` :335-404): per point the gaussian
  heatmap exp(-||p-c||^2 / r) with r = clamp(delta^2*2*area, min_radius^2),
  delta=(1-ovr)/(1+ovr), peak forced at the discretized center; the reg
  target picks the gt with minimal weighted distance among points that are
  inside the gt, within one stride of the discretized center (3x3) and
  inside the level's range crit = ||wh||/2.
- Adaptive cls positives (`add_cls_pos_inds` :406-484): for every gt and
  every level the 3x3 cells around the discretized center are candidates;
  a candidate becomes a positive if its (unweighted) GIoU loss is below
  min(kth-smallest, more_pos_thresh), the in-range center forced in.
- Loss: gaussian focal with explicit pos indices (pos 0.25 / neg 0.75),
  GIoU x2 on reg positives, both /num_pos.

TPU deltas: per-image python loops -> vmap; variable-length pos_inds ->
a dense (P, C) positive COUNT map (duplicates preserved by scatter-add);
per-class heatmap min -> segment_max of exp(-dist) over gt labels.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses.iou_loss import giou_loss
from ...structures.boxes import distance2bbox
from ..layers import ConvModule, Scale, bias_init_prob, torch_pad

STRIDES = (8, 16, 32, 64, 128)
REGRESS_RANGES = ((0, 80), (64, 160), (128, 320), (256, 640),
                  (512, 100000000))
INF = 1e9


class CenterNetUpdateHeadNet(nn.Module):
    """Towers like FCOS but no centerness; reg = relu(scale(reg))."""
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
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
        scales = [Scale(1.0, name=f'scale_{i}')
                  for i in range(self.num_levels)]
        cls_out, reg_out = [], []
        for lvl, x in enumerate(feats):
            cf = x
            rf = x
            for conv in cls_convs:
                cf = conv(cf)
            for conv in reg_convs:
                rf = conv(rf)
            cls_out.append(conv_cls(cf))
            reg_out.append(jnp.maximum(
                scales[lvl](conv_reg(rf)).astype(jnp.float32), 0.0))
        return cls_out, reg_out


@dataclass(frozen=True)
class CNUPointContext:
    image_shape: Tuple[int, int]
    featmap_sizes: Tuple[Tuple[int, int], ...]
    num_level_points: Tuple[int, ...]
    points: np.ndarray   # (P, 2)
    strides: np.ndarray  # (P,)
    ranges: np.ndarray   # (P, 2)

    @staticmethod
    def build(image_shape):
        sizes = [(math.ceil(image_shape[0] / s),
                  math.ceil(image_shape[1] / s)) for s in STRIDES]
        pts, strides, ranges, counts = [], [], [], []
        for (h, w), s, rng in zip(sizes, STRIDES, REGRESS_RANGES):
            xs = (np.arange(w, dtype=np.float32) + 0.5) * s
            ys = (np.arange(h, dtype=np.float32) + 0.5) * s
            gx, gy = np.meshgrid(xs, ys)
            p = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
            pts.append(p)
            strides.append(np.full(len(p), s, np.float32))
            ranges.append(np.tile(np.asarray(rng, np.float32), (len(p), 1)))
            counts.append(len(p))
        return CNUPointContext(
            image_shape=tuple(image_shape), featmap_sizes=tuple(sizes),
            num_level_points=tuple(counts), points=np.concatenate(pts),
            strides=np.concatenate(strides), ranges=np.concatenate(ranges))


def cnu_targets(ctx: CNUPointContext, gt, num_classes, hm_min_radius=4,
                hm_min_overlap=0.8):
    """Dense per-image targets. Returns (heatmap (B,P,C),
    bbox_targets (B,P,4) feature units, reg_pos (B,P))."""
    points = jnp.asarray(ctx.points)
    strides = jnp.asarray(ctx.strides)
    ranges = jnp.asarray(ctx.ranges)
    delta = (1 - hm_min_overlap) / (1 + hm_min_overlap)

    def single(gt_b, gt_l, gt_m):
        # (P, G, 4) ltrb
        l = points[:, None, 0] - gt_b[None, :, 0]
        t = points[:, None, 1] - gt_b[None, :, 1]
        r = gt_b[None, :, 2] - points[:, None, 0]
        b = gt_b[None, :, 3] - points[:, None, 1]
        tgt = jnp.stack([l, t, r, b], -1)
        inside_gt = tgt.min(-1) > 0
        centers = (gt_b[:, :2] + gt_b[:, 2:]) / 2  # (G, 2)
        # discretized center per point's stride (trunc toward 0 like .int())
        cd = (jnp.trunc(centers[None] / strides[:, None, None]) *
              strides[:, None, None] + strides[:, None, None] / 2)
        dist = points[:, None] - cd  # (P, G, 2)
        in_c3x3 = ((jnp.abs(dist[..., 0]) <= strides[:, None]) &
                   (jnp.abs(dist[..., 1]) <= strides[:, None]))
        wh = tgt[..., :2] + tgt[..., 2:]
        crit = jnp.sqrt((wh ** 2).sum(-1)) / 2
        in_range = (crit >= ranges[:, None, 0]) & (crit <= ranges[:, None, 1])
        reg_mask = inside_gt & in_c3x3 & in_range & gt_m[None]

        peak = (dist ** 2).sum(-1) == 0
        wd = ((points[:, None] - centers[None]) ** 2).sum(-1)
        wd = jnp.where(peak, 0.0, wd)
        areas = (gt_b[:, 2] - gt_b[:, 0]) * (gt_b[:, 3] - gt_b[:, 1])
        radius = jnp.maximum(delta ** 2 * 2 * areas,
                             float(hm_min_radius) ** 2)
        wd = wd / radius[None]

        bbox_wd = jnp.where(reg_mask, wd, INF)
        min_dist = bbox_wd.min(1)
        min_idx = bbox_wd.argmin(1)
        bt = jnp.take_along_axis(tgt, min_idx[:, None, None].repeat(4, 2),
                                 axis=1)[:, 0] / strides[:, None]
        reg_pos = min_dist < INF

        # heatmap: per class max of exp(-wd) over that class's gts
        hm_g = jnp.where(gt_m[None], jnp.exp(-wd), 0.0)  # (P, G)
        hm = jax.ops.segment_max(hm_g.T,
                                 jnp.clip(gt_l, 0, num_classes - 1),
                                 num_segments=num_classes)
        hm = jnp.maximum(hm, 0.0).T  # (P, C); empty segments -> -inf -> 0
        hm = jnp.where(hm < 1e-4, 0.0, hm)
        return hm, bt, reg_pos

    return jax.vmap(single)(gt.bboxes, gt.labels, gt.mask)


def cnu_pos_counts(ctx: CNUPointContext, reg_flat, gt, num_classes,
                   more_pos_thresh=0.2, more_pos_topk=9):
    """Adaptive cls positives as a dense (B, P, C) count map + num_pos.

    reg_flat: (B, P, 4) feature-unit predictions (stop-gradiented by the
    caller — the reference runs add_cls_pos_inds under no_grad)."""
    points = jnp.asarray(ctx.points)
    sizes = np.asarray(ctx.featmap_sizes, np.int64)  # (L, 2) h, w
    level_offset = np.concatenate(
        [[0], np.cumsum(ctx.num_level_points)])[:-1]  # (L,)
    strides_l = np.asarray(STRIDES, np.float32)
    ranges_l = np.asarray(REGRESS_RANGES, np.float32)
    L = len(STRIDES)
    K = 9
    dx = jnp.asarray([-1, 0, 1, -1, 0, 1, -1, 0, 1], jnp.float32)
    dy = jnp.asarray([-1, -1, -1, 0, 0, 0, 1, 1, 1], jnp.float32)
    P = points.shape[0]

    def single(reg_i, gt_b, gt_l, gt_m):
        g = gt_b.shape[0]
        centers = (gt_b[:, :2] + gt_b[:, 2:]) / 2  # (G, 2)
        st = jnp.asarray(strides_l)[None, :]  # (1, L)
        cix = jnp.floor(centers[:, None, 0] / st).astype(jnp.int32)
        ciy = jnp.floor(centers[:, None, 1] / st).astype(jnp.int32)
        cdx = cix.astype(jnp.float32) * st + st // 2
        cdy = ciy.astype(jnp.float32) * st + st // 2
        # (G, L, 4) ltrb of the discretized center
        bt = jnp.stack([cdx - gt_b[:, None, 0], cdy - gt_b[:, None, 1],
                        gt_b[:, None, 2] - cdx, gt_b[:, None, 3] - cdy],
                       -1)
        whs = bt[..., :2] + bt[..., 2:]
        crit = jnp.sqrt((whs ** 2).sum(-1)) / 2
        in_range = ((crit >= ranges_l[None, :, 0]) &
                    (crit <= ranges_l[None, :, 1]) &
                    (bt.min(-1) >= 0) & gt_m[:, None])  # (G, L)
        ws = jnp.asarray(sizes[:, 1])[None, :, None]  # (1, L, 1)
        hs = jnp.asarray(sizes[:, 0])[None, :, None]
        x9 = cix[..., None] + dx[None, None].astype(jnp.int32)
        y9 = ciy[..., None] + dy[None, None].astype(jnp.int32)
        idx = (jnp.asarray(level_offset)[None, :, None] + y9 * ws + x9)
        in_bounds = (x9 >= 0) & (x9 < ws) & (y9 >= 0) & (y9 < hs)
        # candidate targets: center target shifted by (dx, dy) cells
        bt9 = (bt / jnp.asarray(strides_l)[None, :, None])[:, :, None, :] \
            .repeat(K, 2)
        bt9 = bt9.at[..., 0].add(dx[None, None])
        bt9 = bt9.at[..., 1].add(dy[None, None])
        bt9 = bt9.at[..., 2].add(-dx[None, None])
        bt9 = bt9.at[..., 3].add(-dy[None, None])
        mask9 = in_bounds & (bt9.min(-1) >= 0) & gt_m[:, None, None]
        idx = jnp.where(mask9, idx, 0).astype(jnp.int32)  # (G, L, K)

        cand_pts = points[idx.reshape(-1)]
        cand_pred = reg_i[idx.reshape(-1)]
        cand_tgt = jnp.clip(bt9.reshape(-1, 4), 0.0, None)
        dec_p = distance2bbox(cand_pts, cand_pred)
        dec_t = distance2bbox(cand_pts, cand_tgt)
        loss9 = giou_loss(dec_p, dec_t,
                          reduction='none').reshape(g, L, K)
        loss9 = jnp.where(mask9, loss9, INF)
        # the in-range discretized center (k=4) is forced positive
        loss9 = loss9.at[:, :, 4].set(
            jnp.where(in_range, 0.0, loss9[:, :, 4]))
        flat = loss9.reshape(g, L * K)
        kth = jnp.sort(flat, axis=1)[:, more_pos_topk - 1]
        thr = jnp.minimum(kth, more_pos_thresh)
        new_pos = flat < thr[:, None]  # (G, L*K)
        counts = jnp.zeros((P * num_classes,), jnp.float32)
        flat_idx = (idx.reshape(g, L * K) * num_classes +
                    jnp.clip(gt_l, 0, num_classes - 1)[:, None])
        counts = counts.at[flat_idx.reshape(-1)].add(
            new_pos.reshape(-1).astype(jnp.float32))
        return counts.reshape(P, num_classes), new_pos.sum()

    counts, n = jax.vmap(single)(reg_flat, gt.bboxes, gt.labels, gt.mask)
    return counts, n.sum()


def cnu_loss(ctx: CNUPointContext, cls_flat, reg_flat, gt, num_classes,
             pos_weight=0.25, neg_weight=0.75, bbox_weight=2.0,
             alpha=2.0, gamma=4.0, sigmoid_clamp=1e-4,
             soft_weight_on_reg=False):
    """cls_flat (B, P, C) logits; reg_flat (B, P, 4) feature units."""
    heatmap, bbox_t, reg_pos = cnu_targets(ctx, gt, num_classes)
    counts, num_pos_cls = cnu_pos_counts(
        ctx, jax.lax.stop_gradient(reg_flat), gt, num_classes)
    p = jnp.clip(jax.nn.sigmoid(cls_flat), sigmoid_clamp,
                 1 - sigmoid_clamp)
    eps = 1e-12
    pos_term = -jnp.log(p + eps) * (1 - p) ** alpha
    neg_term = -jnp.log(1 - p + eps) * p ** alpha * \
        (1 - heatmap) ** gamma
    avg_cls = jnp.maximum(num_pos_cls.astype(jnp.float32), 1.0)
    loss_cls = (pos_weight * (counts * pos_term).sum() +
                neg_weight * neg_term.sum()) / avg_cls

    points = jnp.asarray(ctx.points)
    w_map = heatmap.max(-1) if soft_weight_on_reg else \
        jnp.ones(reg_pos.shape, jnp.float32)
    w = w_map * reg_pos
    avg_bbox = jnp.maximum(w.sum(), 1.0)
    dec_p = distance2bbox(points[None].repeat(reg_flat.shape[0], 0)
                          .reshape(-1, 2), reg_flat.reshape(-1, 4))
    dec_t = distance2bbox(points[None].repeat(reg_flat.shape[0], 0)
                          .reshape(-1, 2),
                          jnp.clip(bbox_t.reshape(-1, 4), 0.0, None))
    g = giou_loss(dec_p, dec_t, reduction='none')
    loss_bbox = bbox_weight * (g * w.reshape(-1)).sum() / avg_bbox
    return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)


def cnu_predict(ctx: CNUPointContext, cls_lvl, reg_lvl, meta, cfg,
                num_classes, rescale=True):
    """Standard dense sigmoid predict (inherited base-head protocol):
    reg x stride, distance2bbox, per-level top-k, class NMS."""
    from ...ops import cap_candidates, filter_scores_and_topk, nms_select
    from ...structures import DetResults
    from ...structures.boxes import scale_boxes
    b = cls_lvl[0].shape[0]
    slices = np.concatenate([[0], np.cumsum(ctx.num_level_points)])
    points = jnp.asarray(ctx.points)

    def single(cls_by_lvl, reg_by_lvl, img_shape, scale_factor):
        boxes_all, scores_all, labels_all, mask_all = [], [], [], []
        for lvl in range(len(cls_by_lvl)):
            lo, hi = int(slices[lvl]), int(slices[lvl + 1])
            n_l = hi - lo
            scores = jax.nn.sigmoid(cls_by_lvl[lvl].reshape(
                n_l, num_classes))
            k = min(cfg.nms_pre, n_l * num_classes) if cfg.nms_pre > 0 \
                else n_l * num_classes
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, k)
            dist = reg_by_lvl[lvl].reshape(n_l, 4)[top_idx] * STRIDES[lvl]
            boxes = distance2bbox(points[lo:hi][top_idx], dist,
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

    cls_b = [m.reshape(b, -1, num_classes) for m in cls_lvl]
    reg_b = [m.reshape(b, -1, 4) for m in reg_lvl]
    return jax.vmap(single)(cls_b, reg_b, meta.img_shape,
                            meta.scale_factor)
