"""YOLACT: real-time instance segmentation with prototype masks.

Behavioural mirror of /root/reference/mmdet/models/detectors/yolact.py +
dense_heads/yolact_head.py + configs/yolact/yolact_r50_1xb8-55e_coco.py:
- RetinaNet-style head with ONE shared tower conv (num_head_convs=1),
  3 anchors/cell (octave scale 3, ratios .5/1/2), softmax CE cls with
  3:1 OHEM negatives, SmoothL1(1.5) boxes;
- a ProtoNet on P3 (3 convs -> 2x bilinear -> conv -> 1x1) producing 32
  prototypes at stride 4; per-anchor 32 tanh coefficients; instance mask
  = sigmoid(protos . coeffs), cropped to the gt box, BCE normalized by
  the gt box area, weight 6.125 (:736-912; positives capped at
  ``max_masks_to_train``=100);
- an auxiliary semantic conv on P3 (BCE vs the per-class union of gt
  masks, weight 1, yolact_head.py segm branch);
- inference assembles prototypes for the kept detections (fast-NMS in
  the reference; the shared class-aware NMS kernel here).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import binary_cross_entropy_with_logits, cross_entropy_int
from ...task import AnchorGenerator
from ...task.coder import DeltaXYWHBBoxCoder
from ...task.max_iou import max_iou_assign
from ..backbones.resnet import ResNet
from ..heads.gfl_head import AnchorContext, GFLTestConfig
from ..heads.retina_head import retina_predict
from ..layers import ConvModule, cast_compute_params, torch_pad
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor
from .solov2 import paste_crop

NUM_PROTOS = 32


def yolact_anchor_generator():
    return AnchorGenerator(strides=(8, 16, 32, 64, 128),
                           ratios=(0.5, 1.0, 2.0), octave_base_scale=3,
                           scales_per_octave=1)


class ProtoNet(nn.Module):
    feat_channels: int = 256

    @nn.compact
    def __call__(self, p3):
        x = p3
        for i in range(3):
            x = ConvModule(self.feat_channels, 3, norm=None,
                           name=f'conv{i}')(x)
        h, w = x.shape[-3] * 2, x.shape[-2] * 2
        x = jax.image.resize(x, x.shape[:-3] + (h, w, x.shape[-1]),
                             method='bilinear')
        x = ConvModule(self.feat_channels, 3, norm=None, name='conv3')(x)
        x = nn.relu(nn.Conv(NUM_PROTOS, (1, 1), name='proto_out')(x))
        return x.astype(jnp.float32)


class YOLACTHeadNet(nn.Module):
    num_classes: int
    num_base_anchors: int = 3
    feat_channels: int = 256
    num_head_convs: int = 1

    @nn.compact
    def __call__(self, feats):
        convs = [ConvModule(self.feat_channels, 3, norm=None,
                            name=f'head_conv_{i}')
                 for i in range(self.num_head_convs)]
        a = self.num_base_anchors
        conv_cls = nn.Conv(a * (self.num_classes + 1), (3, 3),
                           padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_cls')
        conv_reg = nn.Conv(a * 4, (3, 3), padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.normal(0.01),
                           name='conv_reg')
        conv_coeff = nn.Conv(a * NUM_PROTOS, (3, 3),
                             padding=[torch_pad(3)] * 2,
                             kernel_init=nn.initializers.normal(0.01),
                             name='conv_coeff')
        cls_out, reg_out, coeff_out = [], [], []
        for x in feats:
            f = x
            for conv in convs:
                f = conv(f)
            cls_out.append(conv_cls(f))
            reg_out.append(conv_reg(f).astype(jnp.float32))
            coeff_out.append(jnp.tanh(
                conv_coeff(f).astype(jnp.float32)))
        return cls_out, reg_out, coeff_out


class YOLACTNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth,
                               compute_dtype=self.compute_dtype)
        in_ch = {18: (64, 128, 256, 512)}.get(self.depth,
                                              (256, 512, 1024, 2048))
        self.neck = FPN(in_channels=in_ch, out_channels=256, start_level=1,
                        add_extra_convs='on_input', num_outs=5)
        self.bbox_head = YOLACTHeadNet(num_classes=self.num_classes)
        self.protonet = ProtoNet()
        self.segm_conv = nn.Conv(self.num_classes, (1, 1),
                                 name='segm_conv')

    def extract_feat(self, images):
        return self.neck(self.backbone(images))

    def head_forward(self, feats):
        return self.bbox_head(feats)

    def proto_forward(self, feats):
        return self.protonet(feats[0])

    def segm_forward(self, feats):
        return self.segm_conv(feats[0]).astype(jnp.float32)

    def __call__(self, images):
        feats = self.extract_feat(images)
        return (self.bbox_head(feats), self.protonet(feats[0]),
                self.segm_conv(feats[0]))


@dataclass
class YOLACTDetector:
    num_classes: int = 80
    depth: int = 50
    max_masks_to_train: int = 100
    mask_loss_weight: float = 6.125
    bbox_loss_weight: float = 1.5
    neg_pos_ratio: int = 3
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.5,
                                              score_thr=0.05))

    def __post_init__(self):
        self.net = YOLACTNet(num_classes=self.num_classes,
                             depth=self.depth,
                             compute_dtype=self.compute_dtype)
        self.anchor_generator = yolact_anchor_generator()
        self.coder = DeltaXYWHBBoxCoder(target_stds=(0.1, 0.1, 0.2, 0.2))
        self._ctx_cache: Dict[Tuple[int, int], AnchorContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def anchor_context(self, image_shape) -> AnchorContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = AnchorContext.build(
                key, self.anchor_generator)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images))

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        v = cast_compute_params(variables, self.compute_dtype)
        feats = self.net.apply(v, self.preprocessor(images),
                               method='extract_feat')
        cls_lvl, reg_lvl, coeff_lvl = self.net.apply(v, feats,
                                                     method='head_forward')
        protos = self.net.apply(v, feats, method='proto_forward')
        segm = self.net.apply(v, feats, method='segm_forward')
        b = images.shape[0]
        cp1 = self.num_classes + 1
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, cp1) for m in cls_lvl], axis=1) \
            .astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        coeff_flat = jnp.concatenate(
            [m.reshape(b, -1, NUM_PROTOS) for m in coeff_lvl], axis=1)
        anchors = jnp.asarray(ctx.anchors)
        gt = batch['gt']
        ph, pw = protos.shape[1:3]
        k = self.max_masks_to_train

        def single(cls_s, deltas, coeffs, proto, seg, gt_b, gt_l, gt_m,
                   gt_crops, rng_i):
            res = max_iou_assign(anchors, gt_b, gt_l, gt_m,
                                 pos_iou_thr=0.5, neg_iou_thr=0.4,
                                 min_pos_iou=0.0)
            pos = res.pos_mask
            labels = jnp.where(pos, res.labels, self.num_classes)
            # softmax CE + OHEM 3:1 hard negatives (use_ohem)
            ce = cross_entropy_int(cls_s, labels)
            n_pos = pos.sum()
            n_neg = jnp.minimum(self.neg_pos_ratio * n_pos,
                                (~pos).sum())
            neg_ce = jnp.where(~pos & (res.labels != -2), ce, -jnp.inf)
            thresh = jax.lax.top_k(
                neg_ce, min(neg_ce.shape[0], 4096))[0]
            kth = thresh[jnp.clip(n_neg - 1, 0, thresh.shape[0] - 1)]
            neg_sel = neg_ce >= jnp.where(n_neg > 0, kth, jnp.inf)
            loss_cls = (ce * (pos | neg_sel)).sum()
            # box
            t = self.coder.encode(anchors, gt_b[res.gt_idx])
            t = jnp.nan_to_num(t, nan=0.0, posinf=0.0, neginf=0.0)
            err = jnp.abs(deltas - t)
            sl1 = jnp.where(err < 1.0, 0.5 * err * err, err - 0.5)
            loss_bbox = self.bbox_loss_weight * \
                (sl1.sum(-1) * pos).sum()
            # mask branch on capped positives
            score = jnp.where(pos, res.max_overlaps, -jnp.inf)
            top, idx = jax.lax.top_k(score, k)
            sel_ok = top > -jnp.inf
            sel_g = res.gt_idx[idx]
            m_coeff = coeffs[idx]                        # (k, 32)
            m_logits = jnp.einsum('hwp,kp->khw', proto, m_coeff)
            tgt = jax.vmap(
                lambda g: paste_crop(gt_crops[g], gt_b[g], ph, pw, 4)
            )(sel_g)
            bce = binary_cross_entropy_with_logits(m_logits, tgt)
            # crop to the gt box in the proto frame; normalize by box area
            ys = (jnp.arange(ph, dtype=jnp.float32) + 0.5) * 4
            xs = (jnp.arange(pw, dtype=jnp.float32) + 0.5) * 4
            box = gt_b[sel_g]
            inside = ((xs[None, None, :] >= box[:, 0, None, None]) &
                      (xs[None, None, :] <= box[:, 2, None, None]) &
                      (ys[None, :, None] >= box[:, 1, None, None]) &
                      (ys[None, :, None] <= box[:, 3, None, None]))
            area = jnp.clip((box[:, 2] - box[:, 0]) *
                            (box[:, 3] - box[:, 1]) / 16.0, 1.0, None)
            per = (bce * inside).sum((-1, -2)) / area
            w = sel_ok & gt_m[sel_g]
            loss_mask = self.mask_loss_weight * (per * w).sum()
            # semantic aux: per-class union of gt masks at the segm stride
            sh, sw = seg.shape[:2]
            sem_t = jnp.zeros((sh, sw, self.num_classes), jnp.float32)

            def body(j, acc):
                m_j = paste_crop(gt_crops[j], gt_b[j], sh, sw, 8)
                m_j = jnp.where(gt_m[j], m_j, 0.0)
                lab = jnp.clip(gt_l[j], 0, self.num_classes - 1)
                return acc.at[:, :, lab].max(m_j)

            sem_t = jax.lax.fori_loop(0, gt_b.shape[0], body, sem_t)
            # reference loss_segm avg_factor = num_imgs*mask_h*mask_w
            # (yolact_head.py:770,789-792): the class axis is NOT in the
            # denominator
            loss_segm = binary_cross_entropy_with_logits(
                seg, sem_t).sum() / (sh * sw)
            return (loss_cls, loss_bbox, loss_mask, loss_segm,
                    pos.sum().astype(jnp.float32), w.sum())

        rngs = jax.random.split(jax.random.PRNGKey(0), b)
        lc, lb2, lm, ls, n_pos, n_sel = jax.vmap(single)(
            cls_flat, reg_flat, coeff_flat, protos, segm, gt.bboxes,
            gt.labels, gt.mask, gt.masks, rngs)
        # reference normalization is batch-global (yolact_head.py:198
        # avg_factor from get_targets for cls/bbox; :771-817 total_pos
        # for the mask branch), not a per-image mean
        denom = jnp.maximum(n_pos.sum(), 1.0)
        return dict(loss_cls=lc.sum() / denom,
                    loss_bbox=lb2.sum() / denom,
                    loss_mask=lm.sum() / jnp.maximum(n_sel.sum(), 1.0),
                    loss_segm=ls.mean())

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        v = cast_compute_params(variables, self.compute_dtype)
        feats = self.net.apply(v, self.preprocessor(images),
                               method='extract_feat')
        cls_lvl, reg_lvl, coeff_lvl = self.net.apply(v, feats,
                                                     method='head_forward')
        protos = self.net.apply(v, feats, method='proto_forward')
        b = images.shape[0]
        # softmax foreground probs, re-expressed as logits so the shared
        # sigmoid-based predict path recovers exactly these probabilities
        def fg_logits(m):
            p = jax.nn.softmax(
                m.reshape(m.shape[0], m.shape[1], m.shape[2], -1,
                          self.num_classes + 1).astype(jnp.float32),
                axis=-1)[..., :self.num_classes]
            p = jnp.clip(p, 1e-6, 1 - 1e-6)
            return jnp.log(p / (1 - p)).reshape(
                m.shape[0], m.shape[1], m.shape[2], -1)

        cls_fg = [fg_logits(m) for m in cls_lvl]
        reg_lvl = [m.astype(jnp.float32) for m in reg_lvl]
        res = retina_predict(ctx, cls_fg, reg_lvl, batch['meta'],
                             self.coder, self.test_cfg,
                             num_classes=self.num_classes, rescale=rescale)
        # coefficients of the kept detections via nearest anchor center
        coeff_flat = jnp.concatenate(
            [m.reshape(b, -1, NUM_PROTOS) for m in coeff_lvl], axis=1)
        centers = jnp.asarray(
            (ctx.anchors[:, :2] + ctx.anchors[:, 2:]) / 2.0)

        def single(boxes, coeffs, proto, scale_factor):
            if rescale:
                sx, sy = scale_factor[0], scale_factor[1]
            else:
                sx = sy = 1.0
            cx = (boxes[:, 0] + boxes[:, 2]) / 2 * sx
            cy = (boxes[:, 1] + boxes[:, 3]) / 2 * sy
            d2 = (centers[None, :, 0] - cx[:, None]) ** 2 + \
                 (centers[None, :, 1] - cy[:, None]) ** 2
            nearest = d2.argmin(axis=1)
            m = jnp.einsum('hwp,kp->khw', proto, coeffs[nearest])
            return jax.nn.sigmoid(m)

        masks = jax.vmap(single)(res.bboxes, coeff_flat, protos,
                                 batch['meta'].scale_factor)
        return res, masks
