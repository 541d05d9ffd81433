"""RTMDet-Ins: instance-segmentation RTMDet with dynamic-conv mask heads.

Behavioural mirror of
/root/reference/mmdet/models/dense_heads/rtmdet_ins_head.py +
configs/rtmdet/rtmdet-ins_s_8xb32-300e_coco.py: the RTMDet box head plus
(i) a kernel branch predicting 169 dynamic-conv parameters per location
(:61-109: 3 dyconv layers over 8 prototypes + 2 rel-coord channels ->
weight/bias sizes 80/64/8 + 8/8/1), (ii) a MaskFeatModule fusing the 3
neck levels into an 8-channel stride-8 prototype map (:756-817), and
(iii) a DiceLoss (w=2.0, eps=5e-6, avg=num_pos) between each positive's
dynamic-conv mask (upsampled x2 to the stride-4 frame, :640-657) and the
gt mask sampled on the stride-4 grid (:648-651). Assignment/cls/box
losses are RTMDet's (DynamicSoftLabel + QFL-soft + GIoU, rtmdet.py).
Prediction runs NMS on boxes, then the kept detections' kernels generate
masks, thresholded at mask_thr_binary (:483-510).

TPU deltas: positives for the mask loss are capped at
``max_masks_to_train`` per image via top assign-metric (the reference
trains on ALL positives; the cap is the house CondInst convention), gt
masks paste from box-normalized crops, and prediction tracks each kept
detection's kernel/prior exactly through the static top-k + NMS pipeline
(no nearest-point re-location).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..layers import cast_compute_params
from ...losses import dice_loss
from ...ops import filter_scores_and_topk
from ...ops.nms import batched_nms_mask
from ...structures import DetResults, distance2bbox
from ...structures.boxes import scale_boxes
from ..backbones.csp_darknet import ConvBNSiLU
from ..heads.gfl_head import GFLTestConfig
from ..layers import torch_pad
from ..preprocessor import Preprocessor
from .rtmdet import CSPNeXt, CSPNeXtPAFPN, RTMDetHeadNet, rtmdet_flat_loss
from .solov2 import paste_crop
from .yolox import YOLOXContext

# dyconv parameter layout (rtmdet_ins_head.py:66-82): 8 prototypes + 2
# coords -> 10x8, 8x8, 8x1 weights and 8, 8, 1 biases = 169 params
NUM_PROTOTYPES = 8
DYCONV_CH = 8
WEIGHT_NUMS = ((NUM_PROTOTYPES + 2) * DYCONV_CH, DYCONV_CH * DYCONV_CH,
               DYCONV_CH)
BIAS_NUMS = (DYCONV_CH, DYCONV_CH, 1)
NUM_GEN_PARAMS = sum(WEIGHT_NUMS) + sum(BIAS_NUMS)  # 169


class RTMDetInsHeadNet(nn.Module):
    """RTMDet head + kernel branch (shared conv kernels, per-level BN)."""
    num_classes: int
    feat_channels: int = 128
    stacked_convs: int = 2
    num_levels: int = 3

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cls_lvl, reg_lvl = RTMDetHeadNet(
            num_classes=self.num_classes, feat_channels=self.feat_channels,
            stacked_convs=self.stacked_convs, name='det')(feats, train)
        kernel_convs = [nn.Conv(self.feat_channels, (3, 3),
                                padding=[torch_pad(3)] * 2, use_bias=False,
                                name=f'kernel_conv_{j}')
                        for j in range(self.stacked_convs)]
        rtm_kernel = nn.Conv(NUM_GEN_PARAMS, (1, 1), name='rtm_kernel')
        krn_lvl = []
        for i, x in enumerate(feats):
            kf = x
            for j in range(self.stacked_convs):
                kf = nn.silu(nn.BatchNorm(use_running_average=not train,
                                          momentum=0.97, epsilon=1e-3,
                                          name=f'kernel_bn_{i}_{j}')(
                    kernel_convs[j](kf)))
            krn_lvl.append(rtm_kernel(kf).astype(jnp.float32))
        return cls_lvl, reg_lvl, krn_lvl


class MaskFeatModule(nn.Module):
    """Fuse the 3 neck levels into an 8-channel stride-8 prototype map
    (rtmdet_ins_head.py:756-817: 1x1 fusion + 4x [3x3 conv+BN+SiLU] +
    1x1 projection)."""
    feat_channels: int = 128
    stacked_convs: int = 4
    num_prototypes: int = NUM_PROTOTYPES

    @nn.compact
    def __call__(self, feats, train: bool = False):
        h, w = feats[0].shape[-3:-1]
        # F.interpolate(mode='bilinear', align_corners=False) ==
        # jax.image.resize 'bilinear' (half-pixel centers)
        fused = [feats[0]] + [
            jax.image.resize(f, f.shape[:-3] + (h, w, f.shape[-1]),
                             method='bilinear') for f in feats[1:]]
        x = nn.Conv(feats[0].shape[-1], (1, 1), name='fusion_conv')(
            jnp.concatenate(fused, axis=-1))
        for i in range(self.stacked_convs):
            x = ConvBNSiLU(self.feat_channels, 3,
                           name=f'conv{i}')(x, train)
        return nn.Conv(self.num_prototypes, (1, 1),
                       name='projection')(x).astype(jnp.float32)


class RTMDetInsNet(nn.Module):
    num_classes: int
    compute_dtype: Any = jnp.float32
    deepen: float = 0.33  # rtmdet-s ladder; see rtmdet.RTMDetNet
    widen: float = 0.5

    def setup(self):
        self.backbone = CSPNeXt(deepen=self.deepen, widen=self.widen,
                                compute_dtype=self.compute_dtype)
        self.neck = CSPNeXtPAFPN(
            num_csp_blocks=max(round(3 * self.deepen), 1))
        head_ch = max(int(256 * self.widen), 16)
        self.bbox_head = RTMDetInsHeadNet(num_classes=self.num_classes,
                                          feat_channels=head_ch)
        self.mask_head = MaskFeatModule(feat_channels=head_ch)

    def __call__(self, images, train: bool = False):
        levels = self.neck(self.backbone(images, train), train)
        cls_lvl, reg_lvl, krn_lvl = self.bbox_head(levels, train)
        mask_feat = self.mask_head(levels, train)
        return cls_lvl, reg_lvl, krn_lvl, mask_feat


def dynamic_mask_forward(params, mask_feat, points, strides):
    """params (K, 169); mask_feat (h, w, 8) stride-8; points (K, 2),
    strides (K,). Returns (K, 2h, 2w) stride-4 mask logits.

    Mirrors _mask_predict_by_feat_single (rtmdet_ins_head.py:542-589):
    rel coords = (prior - grid)/(stride*8) stacked onto the prototypes,
    three 1x1 dynamic convs (relu between), then the x2 bilinear upsample
    of loss_mask_by_feat (:640-646).
    """
    h, w = mask_feat.shape[:2]
    # level-0 grid priors with the YOLOXContext (+0.5) center convention
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * 8.0
    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * 8.0
    grid = jnp.stack(jnp.meshgrid(gx, gy), axis=-1)  # (h, w, 2)

    def single(p, pt, st):
        rel = (pt[None, None] - grid) / (st * 8.0)  # (h, w, 2)
        x = jnp.concatenate([rel, mask_feat], axis=-1) \
            .reshape(-1, NUM_PROTOTYPES + 2)
        o = 0
        splits = []
        for s in list(WEIGHT_NUMS) + list(BIAS_NUMS):
            splits.append(jax.lax.dynamic_slice(p, (o,), (s,)))
            o += s
        w1 = splits[0].reshape(NUM_PROTOTYPES + 2, DYCONV_CH)
        w2 = splits[1].reshape(DYCONV_CH, DYCONV_CH)
        w3 = splits[2].reshape(DYCONV_CH, 1)
        x = jax.nn.relu(x @ w1 + splits[3])
        x = jax.nn.relu(x @ w2 + splits[4])
        x = (x @ w3 + splits[5]).reshape(h, w)
        return jax.image.resize(x, (h * 2, w * 2), method='bilinear')

    return jax.vmap(single)(params, points, strides)


@dataclass
class RTMDetInsDetector:
    num_classes: int = 80
    compute_dtype: Any = jnp.float32
    max_masks_to_train: int = 48
    mask_loss_weight: float = 2.0
    mask_thr_binary: float = 0.5
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(score_thr=0.05,
                                              iou_threshold=0.6))
    deepen: float = 0.33  # rtmdet-s; see rtmdet.RTMDetNet size ladder
    widen: float = 0.5

    def __post_init__(self):
        self.net = RTMDetInsNet(num_classes=self.num_classes,
                                deepen=self.deepen, widen=self.widen,
                                compute_dtype=self.compute_dtype)
        self._ctx_cache: Dict[Tuple[int, int], YOLOXContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.loss_and_state_jit = jax.jit(self.loss_and_state)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def context(self, image_shape):
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = YOLOXContext.build(key)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images))

    def _flatten(self, ctx, cls_lvl, reg_lvl, krn_lvl):
        b = cls_lvl[0].shape[0]
        cls = jnp.concatenate(
            [m.reshape(b, -1, self.num_classes) for m in cls_lvl],
            axis=1).astype(jnp.float32)
        reg = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        krn = jnp.concatenate(
            [m.reshape(b, -1, NUM_GEN_PARAMS) for m in krn_lvl], axis=1)
        pts = jnp.asarray(ctx.points)[None]
        strides = jnp.asarray(ctx.strides)[None, :, None]
        boxes = distance2bbox(pts, jax.nn.relu(reg) * strides)
        return cls, boxes, krn

    def loss_and_state(self, variables, batch, teacher_variables=None):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        (cls_lvl, reg_lvl, krn_lvl, mask_feat), new_state = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images), train=True,
            mutable=['batch_stats'])
        cls, boxes, krn = self._flatten(ctx, cls_lvl, reg_lvl, krn_lvl)
        losses = rtmdet_flat_loss(ctx, cls, boxes, batch['gt'],
                                  self.num_classes)
        # the mask branch re-states the assignment (stop-gradient); under
        # jit XLA CSEs it with rtmdet_flat_loss's call, so it costs nothing
        losses['loss_mask'] = self._mask_loss(ctx, cls, boxes, krn,
                                              mask_feat, batch['gt'])
        consts = {k: v for k, v in variables.items() if k != 'params'}
        consts['batch_stats'] = new_state['batch_stats']
        return losses, consts

    def loss(self, variables, batch):
        return self.loss_and_state(variables, batch)[0]

    def _mask_loss(self, ctx, cls, boxes, krn, mask_feat, gt):
        from .rtmdet import dynamic_soft_label_assign
        pts = jnp.asarray(ctx.points)
        strides = jnp.asarray(ctx.strides)
        k = min(self.max_masks_to_train, pts.shape[0])
        fh, fw = mask_feat.shape[1:3]

        if gt.masks is None:
            return jnp.zeros(())

        def single(cls_i, boxes_i, krn_i, mfeat, gt_b, gt_l, gt_m,
                   gt_crops):
            probs = jax.nn.sigmoid(jax.lax.stop_gradient(cls_i))
            pos, gt_idx, _ = dynamic_soft_label_assign(
                pts, strides, jax.lax.stop_gradient(boxes_i), probs,
                gt_b, gt_l, gt_m)
            from ...structures.boxes import bbox_overlaps
            metric = jnp.where(pos, bbox_overlaps(
                jax.lax.stop_gradient(boxes_i), gt_b[gt_idx],
                is_aligned=True), -jnp.inf)
            top, idx = jax.lax.top_k(metric, k)
            sel_valid = top > -jnp.inf
            logits = dynamic_mask_forward(krn_i[idx], mfeat, pts[idx],
                                          strides[idx])  # (k, 2fh, 2fw)
            sel_g = gt_idx[idx]
            tgt = jax.vmap(
                lambda g: paste_crop(gt_crops[g], gt_b[g], fh * 2, fw * 2,
                                     4))(sel_g)
            d = dice_loss(logits.reshape(k, -1), tgt.reshape(k, -1),
                          eps=5e-6, reduction='none')
            w = sel_valid & gt_m[sel_g]
            return (d * w).sum(), w.sum().astype(jnp.float32)

        dl, dn = jax.vmap(single)(cls, boxes, krn, mask_feat, gt.bboxes,
                                  gt.labels, gt.mask, gt.masks)
        return self.mask_loss_weight * dl.sum() / jnp.maximum(dn.sum(), 1.0)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.context(images.shape[1:3])
        cls_lvl, reg_lvl, krn_lvl, mask_feat = self.forward_raw(
            variables, images)
        cls, boxes, krn = self._flatten(ctx, cls_lvl, reg_lvl, krn_lvl)
        pts = jnp.asarray(ctx.points)
        strides = jnp.asarray(ctx.strides)
        cfg = self.test_cfg

        def single(c_i, b_i, k_i, mfeat, img_shape, scale_factor):
            scores = jax.nn.sigmoid(c_i)
            kk = min(cfg.nms_pre, scores.shape[0] * scores.shape[1])
            top_s, top_lab, top_idx, mask = filter_scores_and_topk(
                scores, cfg.score_thr, kk)
            sel = b_i[top_idx]
            h, w = img_shape[0], img_shape[1]
            sel = jnp.clip(sel, 0,
                           jnp.stack([w, h, w, h]).astype(sel.dtype))
            keep = batched_nms_mask(sel, top_s, top_lab,
                                    cfg.iou_threshold, mask)
            kept_scores = jnp.where(keep, top_s, -jnp.inf)
            out_s, oi = jax.lax.top_k(kept_scores, cfg.max_per_img)
            out_mask = out_s > -jnp.inf
            out_s = jnp.where(out_mask, out_s, 0.0)
            out_boxes = jnp.where(out_mask[:, None], sel[oi], 0.0)
            out_lab = jnp.where(out_mask, top_lab[oi], 0)
            src = top_idx[oi]  # original prior index of each detection
            logits = dynamic_mask_forward(k_i[src], mfeat, pts[src],
                                          strides[src])  # (D, 2fh, 2fw)
            masks = jax.nn.sigmoid(logits)
            if rescale:
                out_boxes = scale_boxes(out_boxes, 1.0 / scale_factor)
            return (DetResults(bboxes=out_boxes, scores=out_s,
                               labels=out_lab, mask=out_mask), masks)

        return jax.vmap(single)(cls, boxes, krn, mask_feat,
                                batch['meta'].img_shape,
                                batch['meta'].scale_factor)
