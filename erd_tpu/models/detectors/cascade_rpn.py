"""Cascade RPN detectors: standalone proposal network + Faster R-CNN.

Behavioural mirror of configs/cascade_rpn/*: see
erd_tpu/models/heads/cascade_rpn_head.py for the two-stage refinement.
The Faster variant (cascade-rpn_faster-rcnn_r50-caffe_fpn_1x) weights
both RPN stages by rpn_weight=0.7, tightens the R-CNN coder stds to
(0.04, 0.04, 0.08, 0.08) and raises the cls loss weight to 1.5.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roi_align import multilevel_roi_align
from ...structures import DetResults
from ...structures.boxes import scale_boxes
from ...task.coder import DeltaXYWHBBoxCoder
from ..backbones.resnet import ResNet
from ..heads.bbox_head import (RCNNTrainConfig, Shared2FCBBoxHead,
                               rcnn_loss, rcnn_predict_single,
                               rcnn_sample_single)
from ..heads.cascade_rpn_head import (STAGE1_CODER, CascadeRPNNet,
                                      anchor_offsets, cascade_rpn_loss,
                                      cascade_rpn_proposals,
                                      square_anchors)
from ..heads.gfl_head import GFLTestConfig
from ..heads.rpn_head import ProposalConfig
from ..layers import cast_compute_params
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor
from .ga_faster_rcnn import GA_STRIDES, GAPointContext


class CascadeRPNFasterNet(nn.Module):
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
        self.rpn = CascadeRPNNet()
        self.bbox_head = Shared2FCBBoxHead(num_classes=self.num_classes)

    def extract_feat(self, images):
        return self.neck(self.backbone(images))

    def rpn_stage1(self, feats):
        return self.rpn.stage1(feats)

    def rpn_stage2(self, feats, offsets):
        return self.rpn.stage2(feats, offsets)

    def roi_forward(self, roi_feats):
        return self.bbox_head(roi_feats)

    def __call__(self, images):
        feats = self.extract_feat(images)
        rpn_out = self.rpn(feats)
        dummy = jnp.zeros((4, 7, 7, feats[0].shape[-1]), feats[0].dtype)
        head_out = self.bbox_head(dummy)
        return rpn_out, head_out


@dataclass
class CascadeRPNFasterRCNNDetector:
    num_classes: int = 80
    depth: int = 50
    rpn_weight: float = 0.7
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    rcnn_train_cfg: RCNNTrainConfig = field(
        default_factory=lambda: RCNNTrainConfig(cls_weight=1.5))
    proposal_cfg_train: ProposalConfig = field(
        default_factory=lambda: ProposalConfig(nms_pre=2000,
                                               max_per_img=300,
                                               iou_threshold=0.8))
    proposal_cfg_test: ProposalConfig = field(
        default_factory=lambda: ProposalConfig(nms_pre=1000,
                                               max_per_img=300,
                                               iou_threshold=0.8))
    test_cfg: GFLTestConfig = field(
        default_factory=lambda: GFLTestConfig(iou_threshold=0.5))

    def __post_init__(self):
        self.net = CascadeRPNFasterNet(num_classes=self.num_classes,
                                       depth=self.depth,
                                       compute_dtype=self.compute_dtype)
        self.rcnn_coder = DeltaXYWHBBoxCoder(
            target_stds=(0.04, 0.04, 0.08, 0.08))
        self._ctx_cache: Dict[Tuple[int, int], GAPointContext] = {}
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def point_context(self, image_shape) -> GAPointContext:
        key = tuple(int(v) for v in image_shape)
        if key not in self._ctx_cache:
            self._ctx_cache[key] = GAPointContext.build(key, GA_STRIDES)
        return self._ctx_cache[key]

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images))

    def _rpn_both_stages(self, variables, images, ctx):
        """Run stage 1, derive refined-anchor offsets, run stage 2."""
        v = cast_compute_params(variables, self.compute_dtype)
        feats = self.net.apply(v, self.preprocessor(images),
                               method='extract_feat')
        bridged, reg1 = self.net.apply(v, feats, method='rpn_stage1')
        b = images.shape[0]
        reg1_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg1], axis=1)
        points = jnp.asarray(ctx.points)
        strides = jnp.asarray(ctx.strides)
        anchors1 = square_anchors(points, strides)
        refined = jax.vmap(
            lambda r: STAGE1_CODER.decode(anchors1,
                                          jax.lax.stop_gradient(r))
        )(reg1_flat)
        offs = jax.vmap(
            lambda a: anchor_offsets(a, points, strides))(refined)
        # split flat offsets back into per-level maps
        offsets, lo = [], 0
        for f, n in zip(bridged, ctx.num_level_points):
            offsets.append(offs[:, lo:lo + n].reshape(
                b, f.shape[1], f.shape[2], 9, 2))
            lo += n
        cls2, reg2 = self.net.apply(v, bridged, offsets,
                                    method='rpn_stage2')
        cls2_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in cls2], axis=1)
        reg2_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg2], axis=1)
        return feats, reg1_flat, cls2_flat, reg2_flat

    def _rpn_losses(self, ctx, reg1, cls2, reg2, batch, rng):
        losses = cascade_rpn_loss(
            jnp.asarray(ctx.points), jnp.asarray(ctx.strides),
            ctx.num_level_points, reg1, cls2, reg2, batch['gt'], rng,
            GA_STRIDES, loss_weight=10.0 * self.rpn_weight)
        losses['loss_rpn_cls'] = self.rpn_weight * losses['loss_rpn_cls']
        return losses

    def _proposals(self, ctx, reg1, cls2, reg2, img_shapes, cfg):
        return cascade_rpn_proposals(
            jnp.asarray(ctx.points), jnp.asarray(ctx.strides),
            ctx.num_level_points, jax.lax.stop_gradient(reg1),
            jax.lax.stop_gradient(cls2), jax.lax.stop_gradient(reg2),
            img_shapes, cfg)

    def loss(self, variables, batch):
        images = batch['images']
        b = images.shape[0]
        ctx = self.point_context(images.shape[1:3])
        feats, reg1, cls2, reg2 = self._rpn_both_stages(variables, images,
                                                        ctx)
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 batch['meta'].img_id.sum())
        losses = self._rpn_losses(ctx, reg1, cls2, reg2, batch, rng)
        prop_boxes, _, prop_mask = self._proposals(
            ctx, reg1, cls2, reg2, batch['meta'].img_shape,
            self.proposal_cfg_train)
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

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.point_context(images.shape[1:3])
        feats, reg1, cls2, reg2 = self._rpn_both_stages(variables, images,
                                                        ctx)
        prop_boxes, _, prop_mask = self._proposals(
            ctx, reg1, cls2, reg2, batch['meta'].img_shape,
            self.proposal_cfg_test)
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
class CascadeRPNDetector(CascadeRPNFasterRCNNDetector):
    """Standalone proposal network (cascade-rpn_r50-caffe_fpn_1x):
    rpn_weight 1.0, up to 2000 proposals, predictions are the proposals
    as class-0 detections."""
    rpn_weight: float = 1.0
    proposal_cfg_test: ProposalConfig = field(
        default_factory=lambda: ProposalConfig(nms_pre=2000,
                                               max_per_img=1000,
                                               iou_threshold=0.8))

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.point_context(images.shape[1:3])
        _, reg1, cls2, reg2 = self._rpn_both_stages(variables, images,
                                                    ctx)
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 batch['meta'].img_id.sum())
        return self._rpn_losses(ctx, reg1, cls2, reg2, batch, rng)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        ctx = self.point_context(images.shape[1:3])
        _, reg1, cls2, reg2 = self._rpn_both_stages(variables, images,
                                                    ctx)
        boxes, scores, mask = self._proposals(
            ctx, reg1, cls2, reg2, batch['meta'].img_shape,
            self.proposal_cfg_test)

        def single(bx, sc, m, scale_factor):
            if rescale:
                bx = scale_boxes(bx, 1.0 / scale_factor)
            return DetResults(bboxes=bx, scores=sc,
                              labels=jnp.zeros(sc.shape, jnp.int32),
                              mask=m)

        return jax.vmap(single)(boxes, scores, mask,
                                batch['meta'].scale_factor)
