"""HTC (Hybrid Task Cascade), TPU-native.

Behavioural mirror of /root/reference/mmdet/models/detectors/htc.py +
roi_heads/htc_roi_head.py + mask_heads/htc_mask_head.py +
mask_heads/fused_semantic_head.py with the htc_r50_fpn config:

- the Cascade R-CNN 3-stage box path (IoU 0.5/0.6/0.7, stage weights
  1/0.5/0.25) interleaved with a mask stage per cascade stage;
- *mask information flow*: each mask head receives the previous stage's
  pre-logit mask feature through a 1x1 conv and adds it to its own conv
  stack input (htc_mask_head.py / htc_roi_head.py:231-247);
- *semantic fusion*: a FusedSemanticHead predicts a stuff+thing semantic
  map from the FPN (loss weight 0.2) and its stride-8 feature map is
  RoI-aligned and added to both box (7x7) and mask (14x14) RoI features
  (fused_semantic_head.py; htc_roi_head.py:215-229).

The semantic loss engages only when the batch carries ``sem_seg``; the
fusion feature path is always active.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.masks import crop_resize_mask
from ...losses import cross_entropy_int
from ...ops.roi_align import multilevel_roi_align, roi_align
from ..heads.bbox_head import rcnn_loss, rcnn_sample_single
from ..heads.mask_head import mask_loss
from ..heads.rpn_head import rpn_loss, rpn_proposals
from ..layers import cast_compute_params, torch_pad
from .cascade_rcnn import CascadeRCNNDetector, CascadeRCNNNet


class HTCMaskHead(nn.Module):
    """FCN mask head returning (logits, pre-upsample feature); optionally
    fuses the previous stage's feature via a 1x1 conv."""
    num_classes: int
    num_convs: int = 4
    feat_channels: int = 256

    @nn.compact
    def __call__(self, roi_feats, prev_feat=None):
        x = roi_feats
        if prev_feat is not None:
            x = x + nn.Conv(x.shape[-1], (1, 1),
                            name='info_flow_conv')(prev_feat)
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.feat_channels, (3, 3),
                                padding=[torch_pad(3)] * 2,
                                name=f'conv_{i}')(x))
        feat = x
        x = nn.relu(nn.ConvTranspose(self.feat_channels, (2, 2),
                                     strides=(2, 2), name='upsample')(x))
        logits = nn.Conv(self.num_classes, (1, 1), name='conv_logits')(x)
        return logits, feat


class FusedSemanticHead(nn.Module):
    """FPN levels -> stride-8 fused feature + semantic logits
    (fused_semantic_head.py: lateral 1x1s resized to level 1, summed,
    4 convs, then a logit conv and an embedding conv)."""
    semantic_classes: int = 183
    feat_channels: int = 256
    fusion_level: int = 1

    @nn.compact
    def __call__(self, feats):
        target = feats[self.fusion_level].shape[-3:-1]
        acc = None
        for i, f in enumerate(feats):
            y = nn.Conv(self.feat_channels, (1, 1), name=f'lateral_{i}')(f)
            y = jax.image.resize(
                y, y.shape[:-3] + (target[0], target[1], y.shape[-1]),
                method='bilinear')
            acc = y if acc is None else acc + y
        x = acc
        for i in range(4):
            x = nn.relu(nn.Conv(self.feat_channels, (3, 3),
                                padding=[torch_pad(3)] * 2,
                                name=f'conv_{i}')(x))
        logits = nn.Conv(self.semantic_classes, (1, 1),
                         name='conv_logits')(x)
        embedding = nn.relu(nn.Conv(self.feat_channels, (1, 1),
                                    name='conv_embedding')(x))
        return logits.astype(jnp.float32), embedding


class HTCNet(CascadeRCNNNet):
    semantic_classes: int = 183

    def setup(self):
        super().setup()
        self.mask_heads = [HTCMaskHead(num_classes=self.num_classes,
                                       name=f'mask_head_{i}')
                           for i in range(self.num_stages)]
        self.semantic_head = FusedSemanticHead(
            semantic_classes=self.semantic_classes)

    def mask_forward_stage(self, stage, roi_feats, prev_feat=None):
        return self.mask_heads[stage](roi_feats, prev_feat)

    def semantic_forward(self, feats):
        return self.semantic_head(feats)

    def __call__(self, images):
        rpn_out, outs = super().__call__(images)
        feats = self.extract_feat(images)
        sem_logits, sem_feat = self.semantic_head(feats)
        dummy = jnp.zeros((4, 14, 14, 256), jnp.float32)
        prev = None
        mouts = []
        for h in self.mask_heads:
            lg, prev = h(dummy, prev)
            mouts.append(lg)
        return rpn_out, outs, mouts, sem_logits


@dataclass
class HTCDetector(CascadeRCNNDetector):
    mask_size: int = 28
    semantic_classes: int = 183
    semantic_loss_weight: float = 0.2

    def __post_init__(self):
        super().__post_init__()
        self.net = HTCNet(num_classes=self.num_classes, depth=self.depth,
                          compute_dtype=self.compute_dtype,
                          num_stages=self.num_stages,
                          semantic_classes=self.semantic_classes)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def _sem_roi(self, sem_feat, rois, out_size):
        """RoI-align the stride-8 semantic feature (single level)."""
        return jax.vmap(
            lambda f, r: roi_align(f, r, out_size, 1.0 / 8.0, 2)
        )(sem_feat.astype(jnp.float32), rois)

    def loss(self, variables, batch):
        v = cast_compute_params(variables, self.compute_dtype)
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

        sem_logits, sem_feat = self.net.apply(v, feats,
                                              method='semantic_forward')
        sem_target = batch.get('sem_seg')
        if sem_target is not None:
            h, w = sem_logits.shape[1:3]
            tgt = jax.image.resize(sem_target.astype(jnp.float32),
                                   (b, h, w), method='nearest') \
                .astype(jnp.int32)
            valid = (tgt >= 0) & (tgt < self.semantic_classes)
            ce = cross_entropy_int(
                sem_logits.reshape(-1, self.semantic_classes),
                jnp.where(valid, tgt, 0).reshape(-1))
            losses['loss_semantic'] = self.semantic_loss_weight * \
                (ce.reshape(b, h, w) * valid).sum() / \
                jnp.maximum(valid.sum(), 1.0)

        gt_masks = batch['gt'].masks
        prev_feat = None
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
            roi7 = self._roi_feats(feats, samples.rois)
            roi7 = roi7 + self._sem_roi(sem_feat, samples.rois, 7) \
                .astype(roi7.dtype)
            cls_logits, reg_preds = self.net.apply(
                v, roi7.reshape(b * s, 7, 7, -1), stage,
                method='roi_forward_stage')
            cls_logits = cls_logits.astype(jnp.float32)
            reg_preds = reg_preds.astype(jnp.float32)
            stage_losses, _ = rcnn_loss(cls_logits, reg_preds, samples,
                                        self.num_classes, cfg)
            w_s = self.stage_weights[stage]
            losses[f'loss_cls_s{stage}'] = w_s * stage_losses['loss_cls']
            losses[f'loss_bbox_s{stage}'] = w_s * stage_losses['loss_bbox']

            # ---- interleaved mask stage with information flow ----
            if gt_masks is not None:
                roi14 = jax.vmap(
                    lambda f0, f1, f2, f3, r: multilevel_roi_align(
                        [f0, f1, f2, f3], r, out_size=14)
                )(feats[0].astype(jnp.float32),
                  feats[1].astype(jnp.float32),
                  feats[2].astype(jnp.float32),
                  feats[3].astype(jnp.float32), samples.rois)
                roi14 = roi14 + self._sem_roi(sem_feat, samples.rois, 14) \
                    .astype(roi14.dtype)
                mask_logits, prev_feat = self.net.apply(
                    v, stage, roi14.reshape(b * s, 14, 14, -1), prev_feat,
                    method='mask_forward_stage')
                prev_feat = jax.lax.stop_gradient(prev_feat)

                def targets_single(gm, gb, smp):
                    return jax.vmap(
                        lambda gi, roi: crop_resize_mask(
                            gm[gi], gb[gi], roi, self.mask_size)
                    )(smp.gt_idx, smp.rois)

                mt = jax.vmap(targets_single)(
                    gt_masks, batch['gt'].bboxes, samples)
                losses[f'loss_mask_s{stage}'] = w_s * mask_loss(
                    mask_logits.astype(jnp.float32),
                    mt.reshape(b * s, self.mask_size, self.mask_size),
                    samples.labels.reshape(-1),
                    samples.is_pos.reshape(-1))

            if stage + 1 < self.num_stages:
                deltas = jax.lax.stop_gradient(reg_preds.reshape(b, s, 4))
                prop_boxes = jax.vmap(
                    lambda r, d, shp: coder.decode(r, d, max_shape=shp)
                )(samples.rois, deltas, batch['meta'].img_shape)
                prop_mask = samples.valid
        return losses

    def predict(self, variables, batch, rescale=True):
        from ...structures.boxes import scale_boxes
        res = super().predict(variables, batch, rescale=rescale)
        v = cast_compute_params(variables, self.compute_dtype)
        images = batch['images']
        feats = self.net.apply(v, self.preprocessor(images),
                               method='extract_feat')
        _, sem_feat = self.net.apply(v, feats, method='semantic_forward')
        if rescale:
            rois = jax.vmap(scale_boxes)(res.bboxes,
                                         batch['meta'].scale_factor)
        else:
            rois = res.bboxes
        b, d = rois.shape[:2]
        roi14 = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r, out_size=14)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          rois)
        roi14 = roi14 + self._sem_roi(sem_feat, rois, 14) \
            .astype(roi14.dtype)
        roi14_flat = roi14.reshape(b * d, 14, 14, -1)
        # all-stage mask average (htc_roi_head.py test path)
        probs = None
        prev = None
        for stage in range(self.num_stages):
            logits, prev = self.net.apply(
                v, stage, roi14_flat, prev, method='mask_forward_stage')
            p = jax.nn.sigmoid(logits.astype(jnp.float32))
            probs = p if probs is None else probs + p
        probs = probs / self.num_stages
        c = probs.shape[-1]
        labels = jnp.clip(res.labels.reshape(-1), 0, c - 1)
        picked = jnp.take_along_axis(
            probs, labels[:, None, None, None], axis=-1)[..., 0]
        masks = picked.reshape(b, d, self.mask_size, self.mask_size)
        return res, masks
