"""Cascade Mask R-CNN: the 3-stage cascade box path + a mask head per stage.

Behavioural mirror of /root/reference/mmdet/models/roi_heads/cascade_roi_head.py
with mask heads configured (configs/cascade_rcnn/cascade-mask-rcnn_r50_fpn_1x_
coco.py): each stage trains its own FCNMaskHead on that stage's sampled RoIs
(cascade_roi_head.py mask_loss_and_target per stage, stage loss weights
1/0.5/0.25), and at inference the three mask heads run on the final refined
detections and their sigmoid probabilities are averaged
(cascade_roi_head.py predict_mask: ``merged_masks`` mean over stages).

Unlike HTC (htc.py) there is no mask information flow between stages and no
semantic branch — the per-stage mask heads are independent plain FCN heads.

TPU design: identical static-shape layout to MaskRCNNDetector — fixed-size
sampled RoI sets per stage, gt masks as fixed-size box-normalized crops, the
whole 3-stage box+mask cascade is one jitted program.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...data.masks import crop_resize_mask
from ...ops.roi_align import multilevel_roi_align
from ...structures.boxes import scale_boxes
from ..heads.bbox_head import rcnn_loss, rcnn_sample_single
from ..heads.mask_head import FCNMaskHead, mask_loss
from ..heads.rpn_head import rpn_loss, rpn_proposals
from ..layers import cast_compute_params
from .cascade_rcnn import CascadeRCNNDetector, CascadeRCNNNet


class CascadeMaskRCNNNet(CascadeRCNNNet):

    def setup(self):
        super().setup()
        self.mask_heads = [FCNMaskHead(num_classes=self.num_classes,
                                       name=f'mask_head_{i}')
                           for i in range(self.num_stages)]

    def mask_forward_stage(self, stage, roi_feats):
        return self.mask_heads[stage](roi_feats)

    def __call__(self, images):
        rpn_out, outs = super().__call__(images)
        dummy = jnp.zeros((4, 14, 14, 256), jnp.float32)
        mouts = [h(dummy) for h in self.mask_heads]
        return rpn_out, outs, mouts


@dataclass
class CascadeMaskRCNNDetector(CascadeRCNNDetector):
    mask_size: int = 28

    def __post_init__(self):
        super().__post_init__()
        self.net = CascadeMaskRCNNNet(num_classes=self.num_classes,
                                      depth=self.depth,
                                      compute_dtype=self.compute_dtype,
                                      num_stages=self.num_stages)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def _roi14(self, feats, rois):
        return jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r, out_size=14)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32), rois)

    def loss(self, variables, batch):
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        v = cast_compute_params(variables, self.compute_dtype)
        feats, rpn_cls, rpn_reg = self._feats_and_rpn(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in rpn_cls], axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in rpn_reg], axis=1)

        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 batch['meta'].img_id.sum())
        losses = rpn_loss(ctx, cls_flat, reg_flat, batch['gt'],
                          batch['meta'].img_shape, rng, self.rpn_coder,
                          self.rpn_train_cfg)
        prop_boxes, _, prop_mask = rpn_proposals(
            ctx, [jax.lax.stop_gradient(c.astype(jnp.float32))
                  for c in rpn_cls],
            [jax.lax.stop_gradient(r) for r in rpn_reg],
            batch['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_train)

        gt_masks = batch['gt'].masks
        assert gt_masks is not None, \
            'CascadeMaskRCNN training needs gt masks (with_mask=True)'

        for stage in range(self.num_stages):
            coder = self.stage_coders[stage]
            cfg = self.stage_cfgs[stage]
            rngs = jax.random.split(jax.random.fold_in(rng, stage + 1), b)
            samples = jax.vmap(
                lambda k, p, pm, gb, gl, gm: rcnn_sample_single(
                    k, p, pm, gb, gl, gm, self.num_classes, coder, cfg)
            )(rngs, prop_boxes, prop_mask, batch['gt'].bboxes,
              batch['gt'].labels, batch['gt'].mask)

            s = samples.rois.shape[1]
            roi_feats = self._roi_feats(feats, samples.rois)
            cls_logits, reg_preds = self.net.apply(
                v, roi_feats.reshape(b * s, 7, 7, -1), stage,
                method=CascadeMaskRCNNNet.roi_forward_stage)
            cls_logits = cls_logits.astype(jnp.float32)
            reg_preds = reg_preds.astype(jnp.float32)
            stage_losses, _ = rcnn_loss(cls_logits, reg_preds, samples,
                                        self.num_classes, cfg)
            w = self.stage_weights[stage]
            losses[f'loss_cls_s{stage}'] = w * stage_losses['loss_cls']
            losses[f'loss_bbox_s{stage}'] = w * stage_losses['loss_bbox']

            roi14 = self._roi14(feats, samples.rois)
            mask_logits = self.net.apply(
                v, stage, roi14.reshape(b * s, 14, 14, -1),
                method=CascadeMaskRCNNNet.mask_forward_stage)

            def targets_single(gm, gb, smp):
                return jax.vmap(
                    lambda gi, roi: crop_resize_mask(
                        gm[gi], gb[gi], roi, self.mask_size)
                )(smp.gt_idx, smp.rois)

            mt = jax.vmap(targets_single)(
                gt_masks, batch['gt'].bboxes, samples)
            losses[f'loss_mask_s{stage}'] = w * mask_loss(
                mask_logits.astype(jnp.float32),
                mt.reshape(b * s, self.mask_size, self.mask_size),
                samples.labels.reshape(-1), samples.is_pos.reshape(-1))

            if stage + 1 < self.num_stages:
                deltas = jax.lax.stop_gradient(reg_preds.reshape(b, s, 4))
                prop_boxes = jax.vmap(
                    lambda r, d, shp: coder.decode(r, d, max_shape=shp)
                )(samples.rois, deltas, batch['meta'].img_shape)
                prop_mask = samples.valid
        return losses

    def predict(self, variables, batch, rescale=True):
        res = super().predict(variables, batch, rescale=rescale)
        v = cast_compute_params(variables, self.compute_dtype)
        images = batch['images']
        feats = self.net.apply(v, self.preprocessor(images),
                               method='extract_feat')
        if rescale:
            rois = jax.vmap(scale_boxes)(res.bboxes,
                                         batch['meta'].scale_factor)
        else:
            rois = res.bboxes
        b, d = rois.shape[:2]
        roi14 = self._roi14(feats, rois).reshape(b * d, 14, 14, -1)
        probs = None
        for stage in range(self.num_stages):
            logits = self.net.apply(v, stage, roi14,
                                    method='mask_forward_stage')
            p = jax.nn.sigmoid(logits.astype(jnp.float32))
            probs = p if probs is None else probs + p
        probs = probs / self.num_stages
        c = probs.shape[-1]
        labels = jnp.clip(res.labels.reshape(-1), 0, c - 1)
        picked = jnp.take_along_axis(
            probs, labels[:, None, None, None], axis=-1)[..., 0]
        masks = picked.reshape(b, d, self.mask_size, self.mask_size)
        return res, masks
