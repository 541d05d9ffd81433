"""Mask Scoring R-CNN: Mask R-CNN + learned mask-IoU rescoring.

Behavioural mirror of
/root/reference/mmdet/models/detectors/mask_scoring_rcnn.py +
roi_heads/mask_scoring_roi_head.py + mask_heads/maskiou_head.py:
the MaskIoU head consumes the 14x14 mask RoI features concatenated with
the (2x2-maxpooled) sigmoid mask prediction of the target class, runs 4
convs (last stride 2) + 3 fc(1024) + fc(C), and regresses the IoU between
the binarized predicted mask and the full gt mask (L2, weight 0.5, only
where the target IoU > 0, maskiou_head.py:117-248). At inference the
detection score is multiplied by the predicted mask IoU of its class.

Static-shape note: gt masks live as box-normalized 56x56 crops
(data/masks.py), so the "area of the gt OUTSIDE the proposal" in the
reference's area-ratio step is computed in gt-box-normalized coordinates
from the crop itself.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.masks import crop_resize_mask
from ..layers import cast_compute_params, torch_pad
from .mask_rcnn import MaskRCNNDetector, MaskRCNNNet


class MaskIoUHeadNet(nn.Module):
    num_classes: int
    conv_channels: int = 256
    fc_channels: int = 1024

    @nn.compact
    def __call__(self, mask_feat, mask_pred_at_label):
        """mask_feat (R, 14, 14, 256); mask_pred (R, 28, 28) logits."""
        pooled = nn.max_pool(
            jax.nn.sigmoid(mask_pred_at_label)[..., None], (2, 2),
            strides=(2, 2))                              # (R, 14, 14, 1)
        x = jnp.concatenate([mask_feat, pooled], axis=-1)
        for i in range(4):
            stride = 2 if i == 3 else 1
            x = nn.relu(nn.Conv(self.conv_channels, (3, 3),
                                strides=(stride, stride),
                                padding=[torch_pad(3)] * 2,
                                kernel_init=nn.initializers.normal(0.01),
                                name=f'conv{i}')(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(3):
            x = nn.relu(nn.Dense(self.fc_channels, name=f'fc{i}')(x))
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.01),
                        name='fc_mask_iou')(x)


class MaskScoringRCNNNet(MaskRCNNNet):

    def setup(self):
        super().setup()
        self.mask_iou_head = MaskIoUHeadNet(num_classes=self.num_classes)

    def mask_iou_forward(self, mask_feat, mask_pred_at_label):
        return self.mask_iou_head(mask_feat, mask_pred_at_label)

    def __call__(self, images):
        out = super().__call__(images)
        dummy_feat = jnp.zeros((4, 14, 14, 256), jnp.float32)
        dummy_pred = jnp.zeros((4, 28, 28), jnp.float32)
        iou_out = self.mask_iou_head(dummy_feat, dummy_pred)
        return out + (iou_out,)


def mask_iou_targets(mask_logits_at_label, mask_targets, rois, sel_gt,
                     is_pos):
    """IoU of binarized predicted 28x28 masks vs the full gt instance.

    The gt area outside the proposal is recovered with the reference's
    area-ratio trick: full_gt_area = gt_in_box_area / area_ratio, where
    area_ratio is the fraction of the gt box covered by the proposal
    (computed on the box-normalized gt crop coordinates).
    """
    pred = jax.nn.sigmoid(mask_logits_at_label) > 0.5
    gt_in = mask_targets > 0.5
    inter = (pred & gt_in).sum((-1, -2)).astype(jnp.float32)
    pred_area = pred.sum((-1, -2)).astype(jnp.float32)
    gt_in_area = gt_in.sum((-1, -2)).astype(jnp.float32)
    # overlap fraction of the proposal with the gt box (area-ratio proxy)
    ix1 = jnp.maximum(rois[:, 0], sel_gt[:, 0])
    iy1 = jnp.maximum(rois[:, 1], sel_gt[:, 1])
    ix2 = jnp.minimum(rois[:, 2], sel_gt[:, 2])
    iy2 = jnp.minimum(rois[:, 3], sel_gt[:, 3])
    inter_box = jnp.clip(ix2 - ix1, 0, None) * jnp.clip(iy2 - iy1, 0, None)
    gt_area = jnp.clip((sel_gt[:, 2] - sel_gt[:, 0]) *
                       (sel_gt[:, 3] - sel_gt[:, 1]), 1e-6, None)
    ratio = jnp.clip(inter_box / gt_area, 1e-6, 1.0)
    full_gt_area = gt_in_area / ratio
    union = pred_area + full_gt_area - inter
    iou = inter / jnp.clip(union, 1e-6, None)
    return jnp.where(is_pos, iou, 0.0)


@dataclass
class MaskScoringRCNNDetector(MaskRCNNDetector):
    mask_iou_weight: float = 0.5

    def __post_init__(self):
        super().__post_init__()
        self.net = MaskScoringRCNNNet(num_classes=self.num_classes,
                                      depth=self.depth,
                                      compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def loss(self, variables, batch):
        # rebuild the mask-branch intermediates to add the IoU loss
        from ..heads.bbox_head import rcnn_sample_single
        from ..heads.rpn_head import rpn_loss, rpn_proposals
        from ..heads.bbox_head import rcnn_loss
        from ...data.masks import crop_resize_mask
        from ..heads.mask_head import mask_loss
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
            cast_compute_params(variables, self.compute_dtype),
            roi7.reshape(b * s, 7, 7, -1), method='roi_forward')
        rcnn_losses, _ = rcnn_loss(cls_logits.astype(jnp.float32),
                                   reg_preds.astype(jnp.float32), samples,
                                   self.num_classes, self.rcnn_train_cfg)
        losses.update(rcnn_losses)

        roi14 = self._roi_feats(variables, feats, samples.rois, 14)
        roi14_flat = roi14.reshape(b * s, 14, 14, -1)
        mask_logits = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), roi14_flat,
            method='mask_forward').astype(jnp.float32)

        def targets_single(gt_masks, gt_boxes, smp):
            return jax.vmap(
                lambda gi, roi: crop_resize_mask(
                    gt_masks[gi], gt_boxes[gi], roi, self.mask_size)
            )(smp.gt_idx, smp.rois)

        gt_masks = batch['gt'].masks
        mask_targets = jax.vmap(targets_single)(
            gt_masks, batch['gt'].bboxes, samples)
        flat_targets = mask_targets.reshape(b * s, self.mask_size,
                                            self.mask_size)
        flat_labels = samples.labels.reshape(-1)
        flat_pos = samples.is_pos.reshape(-1)
        losses['loss_mask'] = self.mask_loss_weight * mask_loss(
            mask_logits, flat_targets, flat_labels, flat_pos)

        # ---- mask IoU branch ----
        c = mask_logits.shape[-1]
        safe = jnp.clip(flat_labels, 0, c - 1)
        pred_at_label = jnp.take_along_axis(
            mask_logits, safe[:, None, None, None], axis=-1)[..., 0]
        iou_pred = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            roi14_flat.astype(jnp.float32),
            jax.lax.stop_gradient(pred_at_label),
            method='mask_iou_forward').astype(jnp.float32)
        iou_at_label = jnp.take_along_axis(iou_pred, safe[:, None],
                                           axis=1)[:, 0]
        sel_gt = jax.vmap(lambda gb, smp: gb[smp.gt_idx])(
            batch['gt'].bboxes, samples).reshape(b * s, 4)
        tgt = mask_iou_targets(
            jax.lax.stop_gradient(pred_at_label), flat_targets,
            samples.rois.reshape(-1, 4), sel_gt, flat_pos)
        valid = flat_pos & (tgt > 0)
        l2 = jnp.square(iou_at_label - tgt)
        losses['loss_mask_iou'] = self.mask_iou_weight * \
            (l2 * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        return losses

    def predict(self, variables, batch, rescale=True):
        res, masks = super().predict(variables, batch, rescale=rescale)
        images = batch['images']
        feats = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images), method='extract_feat')
        from ...structures.boxes import scale_boxes
        if rescale:
            rois = jax.vmap(scale_boxes)(res.bboxes,
                                         batch['meta'].scale_factor)
        else:
            rois = res.bboxes
        b, d = rois.shape[:2]
        roi14 = self._roi_feats(variables, feats, rois, 14)
        # logits of the predicted class
        logits = jax.lax.stop_gradient(
            jnp.log(jnp.clip(masks, 1e-6, 1 - 1e-6) /
                    (1 - jnp.clip(masks, 1e-6, 1 - 1e-6))))
        iou_pred = self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            roi14.reshape(b * d, 14, 14, -1).astype(jnp.float32),
            logits.reshape(b * d, self.mask_size, self.mask_size),
            method='mask_iou_forward').astype(jnp.float32)
        c = iou_pred.shape[-1]
        labels = jnp.clip(res.labels.reshape(-1), 0, c - 1)
        iou_at = jnp.take_along_axis(iou_pred, labels[:, None],
                                     axis=1)[:, 0].reshape(b, d)
        rescored = res.scores * jnp.clip(iou_at, 0.0, 1.0)
        return res.replace(scores=rescored), masks
