"""PointRend: point-based mask refinement on Mask R-CNN.

Behavioural mirror of /root/reference/mmdet/models/detectors/point_rend.py
+ roi_heads/point_rend_roi_head.py + mask_heads/coarse_mask_head.py +
mask_heads/mask_point_head.py + configs/point_rend/*:

- a *coarse* mask head (convs + fc) predicts 14x14 class mask logits from
  the 14x14 mask RoI features;
- a *point head* (3-layer MLP over [fine-grained P2 point features,
  coarse point logits], with coarse logits re-concatenated at each fc)
  predicts refined logits at sampled points;
- training samples ``num_points`` per positive RoI by importance: 3x
  oversampled uniform points ranked by coarse uncertainty (-|logit| at
  the target class), top 75% kept + 25% random (mask_point_head.py
  get_roi_rel_points_train); point BCE loss vs the gt mask sampled at the
  same points;
- inference refines the most uncertain points of the upsampled coarse
  mask through ``subdivision_steps`` rounds (point_rend_roi_head.py
  _mask_point_forward_test).
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.masks import crop_resize_mask
from ...ops.roi_align import roi_align
from ...ops.sampling import point_sample
from ..layers import cast_compute_params, torch_pad
from .faster_rcnn import FasterRCNNNet
from .mask_rcnn import MaskRCNNDetector


class CoarseMaskHead(nn.Module):
    num_classes: int
    conv_channels: int = 256
    fc_channels: int = 1024
    out_size: int = 14

    @nn.compact
    def __call__(self, roi_feats):
        """(R, 14, 14, 256) -> (R, 14, 14, C) coarse logits."""
        x = roi_feats
        for i in range(4):
            x = nn.relu(nn.Conv(self.conv_channels, (3, 3),
                                padding=[torch_pad(3)] * 2,
                                name=f'conv{i}')(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(2):
            x = nn.relu(nn.Dense(self.fc_channels, name=f'fc{i}')(x))
        out = nn.Dense(self.out_size * self.out_size * self.num_classes,
                       name='fc_logits')(x)
        return out.reshape(-1, self.out_size, self.out_size,
                           self.num_classes)


class MaskPointHead(nn.Module):
    num_classes: int
    num_fcs: int = 3
    channels: int = 256

    @nn.compact
    def __call__(self, fine_feats, coarse_logits):
        """fine (R, K, 256); coarse (R, K, C) -> (R, K, C) point logits."""
        x = jnp.concatenate([fine_feats, coarse_logits], axis=-1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.channels, name=f'fc{i}')(x))
            x = jnp.concatenate([x, coarse_logits], axis=-1)
        return nn.Dense(self.num_classes, name='fc_logits')(x)


class PointRendNet(FasterRCNNNet):

    def setup(self):
        super().setup()
        self.coarse_mask_head = CoarseMaskHead(num_classes=self.num_classes)
        self.point_head = MaskPointHead(num_classes=self.num_classes)

    def coarse_forward(self, roi_feats):
        return self.coarse_mask_head(roi_feats)

    def point_forward(self, fine_feats, coarse_logits):
        return self.point_head(fine_feats, coarse_logits)

    def __call__(self, images):
        out = super().__call__(images)
        dummy = jnp.zeros((4, 14, 14, 256), jnp.float32)
        co = self.coarse_mask_head(dummy)
        po = self.point_head(jnp.zeros((4, 8, 256), jnp.float32),
                             jnp.zeros((4, 8, self.num_classes),
                                       jnp.float32))
        return out + (co, po)


@dataclass
class PointRendDetector(MaskRCNNDetector):
    num_points: int = 196
    oversample_ratio: int = 3
    importance_frac: float = 0.75
    subdivision_steps: int = 2
    subdivision_points: int = 196

    def __post_init__(self):
        super().__post_init__()
        self.net = PointRendNet(num_classes=self.num_classes,
                                depth=self.depth,
                                compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def _fine_point_feats(self, p2, rois, rel_pts):
        """Sample P2 (stride 4) at roi-relative points.

        p2 (H, W, 256); rois (R, 4); rel_pts (R, K, 2) in [0, 1].
        """
        x = rois[:, None, 0] + rel_pts[..., 0] * \
            (rois[:, None, 2] - rois[:, None, 0])
        y = rois[:, None, 1] + rel_pts[..., 1] * \
            (rois[:, None, 3] - rois[:, None, 1])
        h, w = p2.shape[:2]
        pts = jnp.stack([x / (w * 4.0), y / (h * 4.0)], axis=-1)
        return point_sample(p2, pts)

    def loss(self, variables, batch):
        from ..heads.bbox_head import rcnn_loss, rcnn_sample_single
        from ..heads.rpn_head import rpn_loss, rpn_proposals
        from ...ops.roi_align import multilevel_roi_align
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
            v, roi7.reshape(b * s, 7, 7, -1), method='roi_forward')
        rcnn_losses, _ = rcnn_loss(cls_logits.astype(jnp.float32),
                                   reg_preds.astype(jnp.float32), samples,
                                   self.num_classes, self.rcnn_train_cfg)
        losses.update(rcnn_losses)

        # ---- coarse mask head ----
        roi14 = self._roi_feats(variables, feats, samples.rois, 14)
        coarse = self.net.apply(
            v, roi14.reshape(b * s, 14, 14, -1).astype(jnp.float32),
            method='coarse_forward').astype(jnp.float32)
        labels = samples.labels.reshape(-1)
        is_pos = samples.is_pos.reshape(-1)
        c = coarse.shape[-1]
        safe = jnp.clip(labels, 0, c - 1)
        coarse_at = jnp.take_along_axis(
            coarse, safe[:, None, None, None], axis=-1)[..., 0]

        def targets_single(gm, gb, smp):
            return jax.vmap(
                lambda gi, roi: crop_resize_mask(gm[gi], gb[gi], roi, 14)
            )(smp.gt_idx, smp.rois)

        gt_masks = batch['gt'].masks
        mt14 = jax.vmap(targets_single)(
            gt_masks, batch['gt'].bboxes, samples).reshape(b * s, 14, 14)
        bce = jax.nn.softplus(-coarse_at) * mt14 + \
            jax.nn.softplus(coarse_at) * (1 - mt14)
        n_pos = jnp.maximum(is_pos.sum(), 1.0)
        losses['loss_mask'] = (bce.mean((-1, -2)) * is_pos).sum() / n_pos

        # ---- point head on importance-sampled points ----
        k = self.num_points
        over = k * self.oversample_ratio
        key = jax.random.fold_in(rng, 99)
        rnd = jax.random.uniform(key, (b * s, over, 2))
        unc = -jnp.abs(point_sample_batch(coarse_at, rnd))  # (R, over)
        n_imp = int(k * self.importance_frac)
        _, imp_idx = jax.lax.top_k(unc, n_imp)
        rnd2 = jax.random.uniform(jax.random.fold_in(key, 1),
                                  (b * s, k - n_imp, 2))
        pts = jnp.concatenate(
            [jnp.take_along_axis(rnd, imp_idx[..., None].repeat(2, -1),
                                 axis=1), rnd2], axis=1)   # (R, K, 2)
        coarse_pts = point_sample_batch_nc(coarse, pts)     # (R, K, C)
        rois_flat = samples.rois.reshape(b * s, 4)
        p2 = feats[0].astype(jnp.float32)
        # per image grouping for the P2 sampling
        fine = jax.vmap(
            lambda p2_i, rois_i, pts_i: self._fine_point_feats(
                p2_i, rois_i, pts_i)
        )(p2, samples.rois, pts.reshape(b, s, k, 2)).reshape(b * s, k, -1)
        point_logits = self.net.apply(v, fine, coarse_pts,
                                      method='point_forward') \
            .astype(jnp.float32)
        pt_at = jnp.take_along_axis(point_logits, safe[:, None, None]
                                    .repeat(k, 1), axis=-1)[..., 0]
        tgt_pts = point_sample_batch(mt14, pts)
        tgt_pts = (tgt_pts > 0.5).astype(jnp.float32)
        pbce = jax.nn.softplus(-pt_at) * tgt_pts + \
            jax.nn.softplus(pt_at) * (1 - tgt_pts)
        losses['loss_point'] = (pbce.mean(-1) * is_pos).sum() / n_pos
        return losses

    def predict(self, variables, batch, rescale=True):
        from ...structures.boxes import scale_boxes
        res = super(MaskRCNNDetector, self).predict(variables, batch,
                                                    rescale=rescale)
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
        roi14 = self._roi_feats(variables, feats, rois, 14)
        coarse = self.net.apply(
            v, roi14.reshape(b * d, 14, 14, -1).astype(jnp.float32),
            method='coarse_forward').astype(jnp.float32)
        c = coarse.shape[-1]
        labels = jnp.clip(res.labels.reshape(-1), 0, c - 1)
        logits = jnp.take_along_axis(
            coarse, labels[:, None, None, None], axis=-1)[..., 0]
        p2 = feats[0].astype(jnp.float32)
        rois_b = rois
        size = 14
        for step in range(self.subdivision_steps):
            size = size * 2
            logits = jax.image.resize(
                logits, (b * d, size, size), method='bilinear')
            kk = min(self.subdivision_points, size * size)
            unc = -jnp.abs(logits).reshape(b * d, -1)
            _, idx = jax.lax.top_k(unc, kk)
            yy = (idx // size).astype(jnp.float32)
            xx = (idx % size).astype(jnp.float32)
            pts = jnp.stack([(xx + 0.5) / size, (yy + 0.5) / size],
                            axis=-1)                       # (R, kk, 2)
            coarse_pts = point_sample_batch_nc(coarse, pts)
            fine = jax.vmap(
                lambda p2_i, rois_i, pts_i: self._fine_point_feats(
                    p2_i, rois_i, pts_i)
            )(p2, rois_b, pts.reshape(b, d, kk, 2)).reshape(b * d, kk, -1)
            plog = self.net.apply(v, fine, coarse_pts,
                                  method='point_forward') \
                .astype(jnp.float32)
            pat = jnp.take_along_axis(plog, labels[:, None, None]
                                      .repeat(kk, 1), axis=-1)[..., 0]
            logits = logits.reshape(b * d, -1).at[
                jnp.arange(b * d)[:, None], idx].set(pat) \
                .reshape(b * d, size, size)
        masks = jax.nn.sigmoid(logits).reshape(b, d, size, size)
        return res, masks


def point_sample_batch(maps, pts):
    """maps (R, H, W); pts (R, K, 2) in [0, 1] -> (R, K)."""
    return jax.vmap(
        lambda m, p: point_sample(m[..., None], p)[..., 0])(maps, pts)


def point_sample_batch_nc(maps, pts):
    """maps (R, H, W, C); pts (R, K, 2) -> (R, K, C)."""
    return jax.vmap(point_sample)(maps, pts)
