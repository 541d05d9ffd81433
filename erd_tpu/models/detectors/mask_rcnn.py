"""Mask R-CNN: Faster R-CNN + FCN mask branch.

Behavioural mirror of /root/reference/mmdet/models/detectors/mask_rcnn.py +
roi_heads/standard_roi_head.py mask path: 14x14 RoIAlign on positive sampled
RoIs -> FCNMaskHead -> BCE against the target-class 28x28 gt-mask crop; at
inference the mask branch runs on the final detections and returns per-
detection 28x28 probability masks (paste-to-image happens host-side).
Ground-truth masks arrive as fixed-size box-normalized crops
(data/masks.py) so the whole mask path is static-shape.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ...data.masks import crop_resize_mask
from ...ops.roi_align import multilevel_roi_align
from ...structures import DetResults
from ...structures.boxes import scale_boxes
from ..heads.bbox_head import rcnn_loss
from ..heads.mask_head import FCNMaskHead, mask_loss
from .faster_rcnn import FasterRCNNDetector, FasterRCNNNet


class MaskRCNNNet(FasterRCNNNet):

    def setup(self):
        super().setup()
        self.mask_head = FCNMaskHead(num_classes=self.num_classes,
                                     norm=self.head_norm,
                                     conv_ws=self.conv_ws)

    def mask_forward(self, roi_feats):
        return self.mask_head(roi_feats)

    def __call__(self, images):
        rpn_out, head_out = super().__call__(images)
        dummy = jnp.zeros((4, 14, 14, 256), images.dtype
                          if images.dtype != jnp.uint8 else jnp.float32)
        mask_out = self.mask_head(dummy)
        return rpn_out, head_out, mask_out


@dataclass
class MaskRCNNDetector(FasterRCNNDetector):
    mask_size: int = 28
    mask_loss_weight: float = 1.0

    def __post_init__(self):
        super().__post_init__()
        self.net = MaskRCNNNet(num_classes=self.num_classes,
                               depth=self.depth,
                               compute_dtype=self.compute_dtype,
                               **self._backbone_net_kwargs())
        if self.loss_cls == 'seesaw':
            # Trainer detects mutable train state via hasattr
            # (train_loop.py _step_impl) — only seesaw carries one (the
            # cumulative per-class sample counter, a torch buffer in the
            # reference SeesawLoss)
            self.loss_and_state = self._seesaw_loss_and_state
            self.loss_and_state_jit = jax.jit(self.loss_and_state)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        variables = super().init(rng, image_shape, batch_size)
        if self.loss_cls == 'seesaw':
            variables = dict(
                variables,
                seesaw={'cum_samples': jnp.zeros(self.num_classes + 1,
                                                 jnp.float32)})
        return variables

    def _seesaw_loss_and_state(self, variables, batch):
        losses, new_cum = self._loss_impl(variables, batch)
        consts = {k: v for k, v in variables.items() if k != 'params'}
        consts['seesaw'] = {'cum_samples': new_cum}
        return losses, consts

    def _roi_feats(self, variables, feats, rois, out_size=7):
        # signature must stay parent-compatible: FasterRCNNDetector.loss/
        # predict call self._roi_feats(variables, feats, rois) and GRoIE
        # overrides on the same contract
        return jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r, out_size=out_size)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          rois)

    def loss(self, variables, batch):
        return self._loss_impl(variables, batch)[0]

    def _loss_impl(self, variables, batch):
        from ..heads.bbox_head import rcnn_sample_single
        from ..heads.rpn_head import rpn_loss, rpn_proposals
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
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

        rngs = jax.random.split(jax.random.fold_in(rng, 1), b)
        samples = jax.vmap(
            lambda k, p, pm, gb, gl, gm: rcnn_sample_single(
                k, p, pm, gb, gl, gm, self.num_classes, self.rcnn_coder,
                self.rcnn_train_cfg)
        )(rngs, prop_boxes, prop_mask, batch['gt'].bboxes,
          batch['gt'].labels, batch['gt'].mask)

        s = samples.rois.shape[1]
        roi7 = self._roi_feats(variables, feats, samples.rois, 7)
        cls_logits, reg_preds = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), roi7.reshape(b * s, 7, 7, -1),
            method=MaskRCNNNet.roi_forward)
        new_cum = None
        if self.loss_cls == 'seesaw':
            from ..heads.bbox_head import seesaw_rcnn_loss
            rcnn_losses, new_cum = seesaw_rcnn_loss(
                cls_logits.astype(jnp.float32),
                reg_preds.astype(jnp.float32), samples, self.num_classes,
                variables['seesaw']['cum_samples'],
                p=self.seesaw_p, q=self.seesaw_q,
                cfg=self.rcnn_train_cfg)
        else:
            rcnn_losses, _ = rcnn_loss(cls_logits.astype(jnp.float32),
                                       reg_preds.astype(jnp.float32),
                                       samples, self.num_classes,
                                       self.rcnn_train_cfg)
        losses.update(rcnn_losses)

        # ---- mask branch on positive RoIs ----
        roi14 = self._roi_feats(variables, feats, samples.rois, 14)
        mask_logits = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), roi14.reshape(b * s, 14, 14, -1),
            method=MaskRCNNNet.mask_forward).astype(jnp.float32)

        def targets_single(gt_masks, gt_boxes, smp):
            return jax.vmap(
                lambda gi, roi: crop_resize_mask(
                    gt_masks[gi], gt_boxes[gi], roi, self.mask_size)
            )(smp.gt_idx, smp.rois)

        gt_masks = batch['gt'].masks
        assert gt_masks is not None, \
            'MaskRCNN training needs gt masks (dataset with_mask=True)'
        mask_targets = jax.vmap(targets_single)(
            gt_masks, batch['gt'].bboxes, samples)  # (B, S, 28, 28)
        losses['loss_mask'] = self.mask_loss_weight * mask_loss(
            mask_logits, mask_targets.reshape(b * s, self.mask_size,
                                              self.mask_size),
            samples.labels.reshape(-1), samples.is_pos.reshape(-1))
        return losses, new_cum

    def predict(self, variables, batch, rescale=True):
        res = super().predict(variables, batch, rescale=rescale)
        images = batch['images']
        feats = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images),
                               method=MaskRCNNNet.extract_feat)
        # mask branch operates in the network input frame
        if rescale:
            rois = jax.vmap(scale_boxes)(res.bboxes,
                                         batch['meta'].scale_factor)
        else:
            rois = res.bboxes
        b, d = rois.shape[:2]
        roi14 = self._roi_feats(variables, feats, rois, 14)
        mask_logits = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), roi14.reshape(b * d, 14, 14, -1),
            method=MaskRCNNNet.mask_forward).astype(jnp.float32)
        c = mask_logits.shape[-1]
        labels = jnp.clip(res.labels.reshape(-1), 0, c - 1)
        picked = jnp.take_along_axis(
            mask_logits, labels[:, None, None, None], axis=-1)[..., 0]
        masks = jax.nn.sigmoid(picked).reshape(b, d, self.mask_size,
                                               self.mask_size)
        return res, masks
