"""CondInst: conditional-convolution instance segmentation on FCOS.

Behavioural mirror of /root/reference/mmdet/models/detectors/condinst.py +
dense_heads/condinst_head.py + configs/condinst/*: the FCOS bbox head
grows a controller branch predicting 169 dynamic-conv parameters per
location ((8+2)->8->8->1 1x1 convs: weights 80/64/8 + biases 8/8/1,
:905-927); a MaskFeatModule fuses P3-P5 into an 8-channel stride-8 mask
feature (:715-837); each positive location's parameters run its dynamic
conv over [rel_coords, mask_feats] (rel coords normalized by
8 * location_stride, :928-1150) and the stride-4 upsampled logits take a
dice loss against the gt instance mask. FCOS targets use center sampling
(radius 1.5) around the MASK CENTROID when masks are present (:276-360).

Static-shape conversions: positives for the mask branch are capped at
``max_masks_to_train`` via top-k centerness (the reference random-samples
over the cap); gt masks paste from box-normalized crops (solov2 kit).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import (binary_cross_entropy_with_logits, dice_loss,
                       iou_loss, sigmoid_focal_loss)
from ..backbones.resnet import ResNet
from ..heads.fcos_head import (FCOSHeadNet, FCOSPointContext,
                               centerness_target, fcos_predict)
from ..heads.gfl_head import GFLTestConfig
from ..layers import ConvModule, cast_compute_params, torch_pad
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor
from .solov2 import paste_crop

WEIGHT_NUMS = (80, 64, 8)
BIAS_NUMS = (8, 8, 1)
NUM_PARAMS = sum(WEIGHT_NUMS) + sum(BIAS_NUMS)  # 169
MASK_CH = 8
SOI = 8.0  # size_of_interest factor


class MaskFeatModule(nn.Module):
    feat_channels: int = 128
    out_channels: int = MASK_CH
    start_level: int = 0
    num_levels: int = 3

    @nn.compact
    def __call__(self, feats):
        target = feats[self.start_level].shape[-3:-1]
        acc = None
        for i in range(self.num_levels):
            x = ConvModule(self.feat_channels, 3, norm=None,
                           name=f'conv_lvl{i}')(feats[i])
            x = jax.image.resize(
                x, x.shape[:-3] + (target[0], target[1], x.shape[-1]),
                method='bilinear')
            acc = x if acc is None else acc + x
        for i in range(3):
            acc = ConvModule(self.feat_channels, 3, norm=None,
                             name=f'conv_out{i}')(acc)
        return nn.Conv(self.out_channels, (1, 1),
                       name='projection')(acc).astype(jnp.float32)


class CondInstHeadNet(FCOSHeadNet):
    """FCOS head + controller branch on the reg tower."""
    num_params: int = NUM_PARAMS

    @nn.compact
    def __call__(self, feats):
        cls_convs = [ConvModule(self.feat_channels, 3, norm='gn',
                                name=f'cls_conv_{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm='gn',
                                name=f'reg_conv_{i}')
                     for i in range(self.stacked_convs)]
        from ..layers import Scale, bias_init_prob
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init_prob(0.01), name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        conv_ctr = nn.Conv(1, (3, 3), padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_centerness')
        conv_ctrl = nn.Conv(self.num_params, (3, 3),
                            padding=[torch_pad(3)] * 2,
                            kernel_init=nn.initializers.normal(0.01),
                            name='controller')
        scales = [Scale(1.0, name=f'scale_{i}')
                  for i in range(self.num_levels)]
        cls_out, reg_out, ctr_out, prm_out = [], [], [], []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for conv in cls_convs:
                cf = conv(cf)
            for conv in reg_convs:
                rf = conv(rf)
            cls_out.append(conv_cls(cf))
            ctr_out.append(conv_ctr(rf))
            prm_out.append(conv_ctrl(rf).astype(jnp.float32))
            reg_out.append(
                jnp.exp(scales[lvl](conv_reg(rf)).astype(jnp.float32)))
        return cls_out, reg_out, ctr_out, prm_out


class CondInstNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth,
                               compute_dtype=self.compute_dtype)
        in_ch = {18: (64, 128, 256, 512)}.get(self.depth,
                                              (256, 512, 1024, 2048))
        self.neck = FPN(in_channels=in_ch, out_channels=256, start_level=1,
                        add_extra_convs='on_output',
                        relu_before_extra_convs=True, num_outs=5)
        self.bbox_head = CondInstHeadNet(num_classes=self.num_classes)
        self.mask_feat = MaskFeatModule()

    def extract_feat(self, images):
        return self.neck(self.backbone(images))

    def head_forward(self, feats):
        return self.bbox_head(feats)

    def mask_forward(self, feats):
        return self.mask_feat(feats)

    def __call__(self, images):
        feats = self.extract_feat(images)
        return self.bbox_head(feats), self.mask_feat(feats)


def dynamic_mask_forward(params, mask_feats, points, strides, mask_hw):
    """params (K, 169); mask_feats (h, w, 8) stride-8; points/strides (K,).

    Returns (K, 2h, 2w) stride-4 mask logits (aligned 2x upsample).
    """
    h, w = mask_feats.shape[:2]
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * 8.0
    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * 8.0
    grid = jnp.stack(jnp.meshgrid(gx, gy), axis=-1)          # (h, w, 2)

    def single(p, pt, st):
        rel = (pt[None, None] - grid) / (SOI * st)           # (h, w, 2)
        x = jnp.concatenate([rel, mask_feats], axis=-1) \
            .reshape(-1, MASK_CH + 2)                        # (hw, 10)
        o = 0
        sizes = list(WEIGHT_NUMS) + list(BIAS_NUMS)
        splits = []
        for s in sizes:
            splits.append(jax.lax.dynamic_slice(p, (o,), (s,)))
            o += s
        w1 = splits[0].reshape(MASK_CH + 2, MASK_CH)
        w2 = splits[1].reshape(MASK_CH, MASK_CH)
        w3 = splits[2].reshape(MASK_CH, 1)
        b1, b2, b3 = splits[3], splits[4], splits[5]
        x = jax.nn.relu(x @ w1 + b1)
        x = jax.nn.relu(x @ w2 + b2)
        x = (x @ w3 + b3).reshape(h, w)
        return jax.image.resize(x, (h * 2, w * 2), method='bilinear')

    return jax.vmap(single)(params, points, strides)


@dataclass
class CondInstDetector:
    num_classes: int = 80
    depth: int = 50
    max_masks_to_train: int = 64
    mask_loss_weight: float = 1.0
    center_sample_radius: float = 1.5
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.6))

    def __post_init__(self):
        self.net = CondInstNet(num_classes=self.num_classes,
                               depth=self.depth,
                               compute_dtype=self.compute_dtype)
        self._ctx_cache: Dict[Tuple[int, int], FCOSPointContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def point_context(self, image_shape) -> FCOSPointContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = FCOSPointContext.build(key)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images))

    def _targets(self, ctx, gt):
        """FCOS targets with center sampling around mask centroids."""
        points = jnp.asarray(ctx.points)
        ranges = jnp.asarray(ctx.ranges)
        strides = jnp.asarray(ctx.strides)
        INF = 1e8

        def single(gt_b, gt_l, gt_m, gt_crops):
            l_ = points[:, None, 0] - gt_b[None, :, 0]
            t_ = points[:, None, 1] - gt_b[None, :, 1]
            r_ = gt_b[None, :, 2] - points[:, None, 0]
            b_ = gt_b[None, :, 3] - points[:, None, 1]
            ltrb = jnp.stack([l_, t_, r_, b_], axis=-1)
            inside = ltrb.min(axis=-1) > 0
            # mask-centroid center sampling (:315-333)
            if gt_crops is not None:
                r = gt_crops.shape[-1]
                xs = (jnp.arange(r, dtype=jnp.float32) + 0.5) / r
                m = gt_crops.astype(jnp.float32)
                m00 = jnp.clip(m.sum((-1, -2)), 1e-6, None)
                cx_n = (m * xs[None, None, :]).sum((-1, -2)) / m00
                cy_n = (m * xs[None, :, None]).sum((-1, -2)) / m00
                cx = gt_b[:, 0] + cx_n * (gt_b[:, 2] - gt_b[:, 0])
                cy = gt_b[:, 1] + cy_n * (gt_b[:, 3] - gt_b[:, 1])
            else:
                cx = (gt_b[:, 0] + gt_b[:, 2]) / 2
                cy = (gt_b[:, 1] + gt_b[:, 3]) / 2
            rad = strides[:, None] * self.center_sample_radius
            cb_x1 = jnp.maximum(cx[None] - rad, gt_b[None, :, 0])
            cb_y1 = jnp.maximum(cy[None] - rad, gt_b[None, :, 1])
            cb_x2 = jnp.minimum(cx[None] + rad, gt_b[None, :, 2])
            cb_y2 = jnp.minimum(cy[None] + rad, gt_b[None, :, 3])
            in_center = ((points[:, None, 0] > cb_x1) &
                         (points[:, None, 0] < cb_x2) &
                         (points[:, None, 1] > cb_y1) &
                         (points[:, None, 1] < cb_y2))
            max_dist = ltrb.max(axis=-1)
            in_range = (max_dist >= ranges[:, None, 0]) & \
                       (max_dist <= ranges[:, None, 1])
            cand = inside & in_center & in_range & gt_m[None, :]
            areas = (gt_b[:, 2] - gt_b[:, 0]) * (gt_b[:, 3] - gt_b[:, 1])
            areas_b = jnp.where(cand, areas[None, :], INF)
            gidx = areas_b.argmin(axis=1)
            pos = areas_b.min(axis=1) < INF
            labels = jnp.where(pos, gt_l[gidx], self.num_classes)
            p_idx = jnp.arange(points.shape[0])
            return labels.astype(jnp.int32), ltrb[p_idx, gidx], pos, gidx

        if gt.masks is None:
            return jax.vmap(
                lambda b_, l_, m_: single(b_, l_, m_, None))(
                gt.bboxes, gt.labels, gt.mask)
        return jax.vmap(single)(gt.bboxes, gt.labels, gt.mask, gt.masks)

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.point_context(images.shape[1:3])
        v = cast_compute_params(variables, self.compute_dtype)
        feats = self.net.apply(v, self.preprocessor(images),
                               method='extract_feat')
        (cls_lvl, reg_lvl, ctr_lvl, prm_lvl) = self.net.apply(
            v, feats, method='head_forward')
        mask_feats = self.net.apply(v, feats, method='mask_forward')
        b = images.shape[0]
        c = self.num_classes
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, c) for m in cls_lvl], axis=1) \
            .astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        ctr_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in ctr_lvl], axis=1).astype(jnp.float32)
        prm_flat = jnp.concatenate(
            [m.reshape(b, -1, NUM_PARAMS) for m in prm_lvl], axis=1)

        labels, ltrb_t, pos, gidx = self._targets(ctx, batch['gt'])
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        loss_cls = sigmoid_focal_loss(
            cls_flat.reshape(-1, c), labels.reshape(-1),
            avg_factor=num_pos)
        points = jnp.asarray(ctx.points)[None]
        from ...structures import distance2bbox
        decoded = distance2bbox(points, reg_flat)
        decoded_t = distance2bbox(points, ltrb_t)
        ctr_t = jnp.where(pos, centerness_target(ltrb_t), 0.0)
        denom = jnp.maximum(ctr_t.sum(), 1e-6)
        lb = iou_loss(decoded.reshape(-1, 4), decoded_t.reshape(-1, 4),
                      mode='log', reduction='none')
        loss_bbox = (lb * ctr_t.reshape(-1)).sum() / denom
        ctr_bce = binary_cross_entropy_with_logits(ctr_flat, ctr_t)
        loss_centerness = (ctr_bce * pos).sum() / num_pos

        # ---- mask branch on capped positives ----
        strides_pt = jnp.asarray(ctx.strides)
        k = self.max_masks_to_train
        gt = batch['gt']
        fh, fw = mask_feats.shape[1:3]

        def single(prm_i, pos_i, gidx_i, ctr_i, mfeat, gt_b, gt_m,
                   gt_crops):
            score = jnp.where(pos_i, ctr_i, -jnp.inf)
            top, idx = jax.lax.top_k(score, k)
            sel_valid = top > -jnp.inf
            params = prm_i[idx]
            pts = jnp.asarray(ctx.points)[idx]
            sts = strides_pt[idx]
            logits = dynamic_mask_forward(params, mfeat, pts, sts,
                                          (fh, fw))   # (k, 2fh, 2fw)
            sel_g = gidx_i[idx]
            # gt masks pasted to the stride-4 frame
            tgt = jax.vmap(
                lambda g: paste_crop(gt_crops[g], gt_b[g], fh * 2, fw * 2,
                                     4))(sel_g)
            d = dice_loss(jax.nn.sigmoid(logits).reshape(k, -1),
                          tgt.reshape(k, -1), activate=False,
                          reduction='none')
            w = sel_valid & gt_m[sel_g]
            return (d * w).sum(), w.sum().astype(jnp.float32)

        dl, dn = jax.vmap(single)(prm_flat, pos, gidx, ctr_flat,
                                  mask_feats, gt.bboxes, gt.mask, gt.masks)
        loss_mask = self.mask_loss_weight * dl.sum() / \
            jnp.maximum(dn.sum(), 1.0)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_centerness=loss_centerness, loss_mask=loss_mask)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.point_context(images.shape[1:3])
        v = cast_compute_params(variables, self.compute_dtype)
        feats = self.net.apply(v, self.preprocessor(images),
                               method='extract_feat')
        (cls_lvl, reg_lvl, ctr_lvl, prm_lvl) = self.net.apply(
            v, feats, method='head_forward')
        mask_feats = self.net.apply(v, feats, method='mask_forward')
        cls_lvl = [m.astype(jnp.float32) for m in cls_lvl]
        reg_lvl = [m.astype(jnp.float32) for m in reg_lvl]
        ctr_lvl = [m.astype(jnp.float32) for m in ctr_lvl]
        res = fcos_predict(ctx, cls_lvl, reg_lvl, ctr_lvl, batch['meta'],
                           self.test_cfg, num_classes=self.num_classes,
                           rescale=rescale)
        # dynamic masks for the kept detections: re-locate each detection's
        # source point by matching its (unscaled) box is impractical; the
        # reference keeps the positive location through decoding. We run
        # the mask branch on the top nms_pre locations and gather by the
        # NMS keep indices is equally dynamic — instead, recompute params
        # at the detection centers' nearest stride-8 location (the
        # documented static approximation).
        b = images.shape[0]
        d = res.bboxes.shape[1]
        prm_flat = jnp.concatenate(
            [m.reshape(b, -1, NUM_PARAMS) for m in prm_lvl], axis=1)
        points = jnp.asarray(ctx.points)
        strides_pt = jnp.asarray(ctx.strides)
        fh, fw = mask_feats.shape[1:3]

        def single(boxes, prm_i, mfeat, scale_factor):
            if rescale:
                sx, sy = scale_factor[0], scale_factor[1]
            else:
                sx = sy = 1.0
            cx = (boxes[:, 0] + boxes[:, 2]) / 2 * sx
            cy = (boxes[:, 1] + boxes[:, 3]) / 2 * sy
            d2 = (points[None, :, 0] - cx[:, None]) ** 2 + \
                 (points[None, :, 1] - cy[:, None]) ** 2
            nearest = d2.argmin(axis=1)
            params = prm_i[nearest]
            logits = dynamic_mask_forward(params, mfeat, points[nearest],
                                          strides_pt[nearest], (fh, fw))
            return jax.nn.sigmoid(logits)

        masks = jax.vmap(single)(res.bboxes, prm_flat, mask_feats,
                                 batch['meta'].scale_factor)
        return res, masks
