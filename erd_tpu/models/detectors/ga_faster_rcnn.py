"""GA-Faster R-CNN and GA-RPN: guided-anchoring two-stage assemblies.

Behavioural mirror of
/root/reference/configs/guided_anchoring/ga-faster-rcnn_r50_fpn_1x_coco.py
+ ga-rpn_r50_fpn_1x_coco.py over
mmdet/models/dense_heads/ga_rpn_head.py: the RPN is replaced by GARPNHead
— per location a loc branch (anchor existence, focal loss on
center-region targets), a shape branch (dw,dh with anchor wh =
8*stride*exp(d), bounded-IoU loss) feeding a deform-conv feature
adaption, then 1-anchor objectness/regression trained against the GUIDED
anchors with MaxIoU(0.7/0.3)+RandomSampler(256); proposals decode the
guided anchors with target_stds (0.07,0.07,0.11,0.11) after masking
objectness where loc prob <= loc_filter_thr(0.01), keep max 300/img; the
R-CNN stage uses tighter stds (0.05,0.05,0.1,0.1). GARPNDetector is the
proposal-only variant (ga-rpn config): predict returns the proposals as
class-0 detections.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.roi_align import multilevel_roi_align
from ...structures import DetResults
from ...task.coder import DeltaXYWHBBoxCoder
from ..backbones.resnet import ResNet
from ..heads.bbox_head import (RCNNTrainConfig, Shared2FCBBoxHead,
                               rcnn_loss, rcnn_predict_single,
                               rcnn_sample_single)
from ..heads.gfl_head import GFLTestConfig
from ..heads.guided_anchor_head import (GARPNHeadNet, ga_rpn_loss,
                                        ga_rpn_proposals)
from ..heads.rpn_head import ProposalConfig, RPNTrainConfig
from ..layers import cast_compute_params
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor

GA_STRIDES = (4, 8, 16, 32, 64)


@dataclass(frozen=True)
class GAPointContext:
    """Static per-level center-point grid for the GA branches."""
    image_shape: Tuple[int, int]
    num_level_points: Tuple[int, ...]
    points: np.ndarray   # (P, 2)
    strides: np.ndarray  # (P,)

    @staticmethod
    def build(image_shape, strides=GA_STRIDES):
        pts, st, counts = [], [], []
        for s in strides:
            h = math.ceil(image_shape[0] / s)
            w = math.ceil(image_shape[1] / s)
            xs = (np.arange(w, dtype=np.float32) + 0.5) * s
            ys = (np.arange(h, dtype=np.float32) + 0.5) * s
            gx, gy = np.meshgrid(xs, ys)
            p = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
            pts.append(p)
            st.append(np.full(len(p), s, np.float32))
            counts.append(len(p))
        return GAPointContext(
            image_shape=tuple(image_shape), num_level_points=tuple(counts),
            points=np.concatenate(pts), strides=np.concatenate(st))


class GAFasterRCNNNet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth,
                               compute_dtype=self.compute_dtype)
        in_ch = {18: (64, 128, 256, 512), 34: (64, 128, 256, 512)}.get(
            self.depth, (256, 512, 1024, 2048))
        self.neck = FPN(in_channels=in_ch, out_channels=256, start_level=0,
                        add_extra_convs='', num_outs=5)
        self.rpn_head = GARPNHeadNet()
        self.bbox_head = Shared2FCBBoxHead(num_classes=self.num_classes)

    def extract_feat(self, images):
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi_forward(self, roi_feats):
        return self.bbox_head(roi_feats)

    def __call__(self, images):
        feats = self.extract_feat(images)
        rpn_out = self.rpn_head(feats)
        dummy = jnp.zeros((4, 7, 7, feats[0].shape[-1]), feats[0].dtype)
        head_out = self.bbox_head(dummy)
        return rpn_out, head_out


@dataclass
class GAFasterRCNNDetector:
    num_classes: int = 80
    depth: int = 50
    loc_filter_thr: float = 0.01
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    rpn_train_cfg: RPNTrainConfig = field(default_factory=RPNTrainConfig)
    rcnn_train_cfg: RCNNTrainConfig = field(
        default_factory=RCNNTrainConfig)
    proposal_cfg_train: ProposalConfig = field(
        default_factory=lambda: ProposalConfig(nms_pre=2000,
                                               max_per_img=300))
    proposal_cfg_test: ProposalConfig = field(
        default_factory=lambda: ProposalConfig(nms_pre=1000,
                                               max_per_img=300))
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.5))

    def __post_init__(self):
        self.net = GAFasterRCNNNet(num_classes=self.num_classes,
                                   depth=self.depth,
                                   compute_dtype=self.compute_dtype)
        # anchor_coder refines the guided anchor into the proposal;
        # rcnn_coder uses GA-Faster's tightened stds.
        self.anchor_coder = DeltaXYWHBBoxCoder(
            target_stds=(0.07, 0.07, 0.11, 0.11))
        self.rcnn_coder = DeltaXYWHBBoxCoder(
            target_stds=(0.05, 0.05, 0.1, 0.1))
        self._ctx_cache: Dict[Tuple[int, int], GAPointContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def point_context(self, image_shape) -> GAPointContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = GAPointContext.build(key)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images))

    def _rpn_flat(self, variables, images):
        v = cast_compute_params(variables, self.compute_dtype)
        feats = self.net.apply(v, self.preprocessor(images),
                               method='extract_feat')
        locs, shapes, clss, regs = self.net.apply(v, feats, method='rpn')
        b = images.shape[0]
        loc = jnp.concatenate([m.reshape(b, -1) for m in locs], axis=1)
        shp = jnp.concatenate([m.reshape(b, -1, 2) for m in shapes],
                              axis=1)
        cls = jnp.concatenate([m.reshape(b, -1) for m in clss], axis=1)
        reg = jnp.concatenate([m.reshape(b, -1, 4) for m in regs], axis=1)
        return feats, loc, shp, cls, reg

    def loss(self, variables, batch):
        images = batch['images']
        b = images.shape[0]
        ctx = self.point_context(images.shape[1:3])
        feats, loc, shp, cls, reg = self._rpn_flat(variables, images)
        points = jnp.asarray(ctx.points)
        strides = jnp.asarray(ctx.strides)
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 batch['meta'].img_id.sum())
        losses = ga_rpn_loss(points, strides, ctx.num_level_points, loc,
                             shp, cls, reg, batch['gt'], rng,
                             self.anchor_coder, self.rpn_train_cfg,
                             featmap_strides=GA_STRIDES)
        prop_boxes, _, prop_mask = ga_rpn_proposals(
            points, strides, ctx.num_level_points,
            jax.lax.stop_gradient(loc), jax.lax.stop_gradient(shp),
            jax.lax.stop_gradient(cls), jax.lax.stop_gradient(reg),
            batch['meta'].img_shape, self.anchor_coder,
            self.proposal_cfg_train, self.loc_filter_thr)
        rngs = jax.random.split(jax.random.fold_in(rng, 1), b)
        samples = jax.vmap(
            lambda k, p, pm, gb, gl, gm: rcnn_sample_single(
                k, p, pm, gb, gl, gm, self.num_classes, self.rcnn_coder,
                self.rcnn_train_cfg)
        )(rngs, prop_boxes, prop_mask, batch['gt'].bboxes,
          batch['gt'].labels, batch['gt'].mask)
        roi_feats = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          samples.rois)
        s = samples.rois.shape[1]
        cls_logits, reg_preds = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            roi_feats.reshape(b * s, 7, 7, -1), method='roi_forward')
        rcnn_losses, _ = rcnn_loss(cls_logits.astype(jnp.float32),
                                   reg_preds.astype(jnp.float32),
                                   samples, self.num_classes,
                                   self.rcnn_train_cfg)
        losses['loss_cls'] = rcnn_losses['loss_cls']
        losses['loss_bbox'] = rcnn_losses['loss_bbox']
        return losses

    def _proposals(self, variables, batch):
        images = batch['images']
        ctx = self.point_context(images.shape[1:3])
        feats, loc, shp, cls, reg = self._rpn_flat(variables, images)
        prop = ga_rpn_proposals(
            jnp.asarray(ctx.points), jnp.asarray(ctx.strides),
            ctx.num_level_points, loc.astype(jnp.float32),
            shp.astype(jnp.float32), cls.astype(jnp.float32),
            reg.astype(jnp.float32), batch['meta'].img_shape,
            self.anchor_coder, self.proposal_cfg_test,
            self.loc_filter_thr)
        return feats, prop

    def predict(self, variables, batch, rescale=True):
        feats, (prop_boxes, _, prop_mask) = self._proposals(variables,
                                                            batch)
        b, p = prop_boxes.shape[:2]
        roi_feats = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          prop_boxes)
        cls_logits, reg_preds = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            roi_feats.reshape(b * p, 7, 7, -1), method='roi_forward')
        cls_logits = cls_logits.astype(jnp.float32).reshape(b, p, -1)
        reg_preds = reg_preds.astype(jnp.float32).reshape(b, p, -1)

        def single(cl, rg, rois, rmask, img_shape, scale_factor):
            ob, os_, ol, om = rcnn_predict_single(
                cl, rg, rois, rmask, img_shape, scale_factor,
                self.num_classes, self.rcnn_coder, self.test_cfg,
                rescale=rescale)
            return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

        return jax.vmap(single)(cls_logits, reg_preds, prop_boxes,
                                prop_mask, batch['meta'].img_shape,
                                batch['meta'].scale_factor)


@dataclass
class GARPNDetector(GAFasterRCNNDetector):
    """Proposal-only GA-RPN (ga-rpn_r50_fpn_1x): predictions ARE the
    guided proposals, reported as class-0 detections (mmdet's RPN
    evaluation protocol, proposal_fast AR)."""

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.point_context(images.shape[1:3])
        _, loc, shp, cls, reg = self._rpn_flat(variables, images)
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 batch['meta'].img_id.sum())
        return ga_rpn_loss(jnp.asarray(ctx.points),
                           jnp.asarray(ctx.strides),
                           ctx.num_level_points, loc, shp, cls, reg,
                           batch['gt'], rng, self.anchor_coder,
                           self.rpn_train_cfg, featmap_strides=GA_STRIDES)

    def predict(self, variables, batch, rescale=True):
        _, (boxes, scores, mask) = self._proposals(variables, batch)

        from ...structures.boxes import scale_boxes

        def single(bx, sc, m, scale_factor):
            if rescale:
                bx = scale_boxes(bx, 1.0 / scale_factor)
            return DetResults(bboxes=bx, scores=sc,
                              labels=jnp.zeros(sc.shape, jnp.int32),
                              mask=m)

        return jax.vmap(single)(boxes, scores, mask,
                                batch['meta'].scale_factor)
