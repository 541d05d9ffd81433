"""QueryInst: Sparse R-CNN with parallel dynamic mask heads.

Behavioural mirror of /root/reference/mmdet/models/detectors/queryinst.py
+ roi_heads/mask_heads/dynamic_mask_head.py +
configs/queryinst/queryinst_r50_fpn_1x_coco.py: each Sparse R-CNN stage
adds a DynamicMaskHead — the stage's (post-interaction) proposal features
generate DynamicConv parameters that modulate the 14x14 mask RoI
features, followed by 4 convs + a 2x deconv + per-class 1x1 logits; mask
training supervises the Hungarian-matched queries of that stage with
class-picked BCE (the reference uses dice 8.0 + BCE mix via
loss_mask/dice — here DiceLoss(8.0) like the config's loss_dice).
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.masks import crop_resize_mask
from ...losses import dice_loss
from ...ops.roi_align import multilevel_roi_align
from ...structures.boxes import bbox_overlaps, scale_boxes
from ...task.hungarian import hungarian_match
from ..layers import cast_compute_params, torch_pad
from .sparse_rcnn import SparseRCNNDetector, SparseRCNNNet


class DynamicMaskHead(nn.Module):
    num_classes: int
    feat_channels: int = 256

    @nn.compact
    def __call__(self, roi_feat, proposal_feat):
        """roi (R, 14, 14, C); proposal (R, C) -> (R, 28, 28, classes).

        The DynamicConv here keeps the spatial grid (the reference's
        with_proj=False variant): per-query generated in/out 1x1 convs
        modulate every RoI position.
        """
        r = proposal_feat.shape[0]
        cin = roi_feat.shape[-1]
        fc = 64
        params = nn.Dense(cin * fc + fc * cin, name='dynamic_layer')(
            proposal_feat)
        p_in = params[:, :cin * fc].reshape(r, cin, fc)
        p_out = params[:, cin * fc:].reshape(r, fc, cin)
        x = roi_feat.reshape(r, -1, cin)
        x = nn.relu(nn.LayerNorm(name='norm_in')(
            jnp.einsum('rpc,rcf->rpf', x, p_in)))
        x = nn.relu(nn.LayerNorm(name='norm_out')(
            jnp.einsum('rpf,rfo->rpo', x, p_out)))
        x = x.reshape(roi_feat.shape)
        for i in range(4):
            x = nn.relu(nn.Conv(self.feat_channels, (3, 3),
                                padding=[torch_pad(3)] * 2,
                                name=f'conv{i}')(x))
        x = nn.relu(nn.ConvTranspose(self.feat_channels, (2, 2),
                                     strides=(2, 2), name='upsample')(x))
        return nn.Conv(self.num_classes, (1, 1),
                       name='conv_logits')(x).astype(jnp.float32)


class QueryInstNet(SparseRCNNNet):

    def setup(self):
        super().setup()
        self.mask_heads = [DynamicMaskHead(num_classes=self.num_classes,
                                           name=f'mask_head_{i}')
                           for i in range(self.num_stages)]

    def mask_stage(self, i, roi_feat, proposal_feat):
        return self.mask_heads[i](roi_feat, proposal_feat)

    def __call__(self, images):
        outs = super().__call__(images)
        dummy_roi = jnp.zeros((4, 14, 14, 256), jnp.float32)
        dummy_pf = jnp.zeros((4, 256), jnp.float32)
        for h in self.mask_heads:
            h(dummy_roi, dummy_pf)
        return outs


@dataclass
class QueryInstDetector(SparseRCNNDetector):
    mask_size: int = 28
    dice_weight: float = 8.0

    def __post_init__(self):
        super().__post_init__()
        self.net = QueryInstNet(num_classes=self.num_classes,
                                depth=self.depth,
                                num_proposals=self.num_proposals,
                                num_stages=self.num_stages,
                                compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def _run_stages_with_feats(self, variables, images):
        v = cast_compute_params(variables, self.compute_dtype)
        feats = self.net.apply(v, self.preprocessor(images),
                               method='extract_feat')
        feats = [f.astype(jnp.float32) for f in feats]
        b = images.shape[0]
        h, w = images.shape[1], images.shape[2]
        whwh = jnp.asarray([w, h, w, h], jnp.float32)
        init = variables['params']['init_proposal_bboxes']
        cx, cy, bw, bh = init[:, 0], init[:, 1], init[:, 2], init[:, 3]
        boxes = jnp.stack([cx - bw / 2, cy - bh / 2,
                           cx + bw / 2, cy + bh / 2], -1) * whwh[None]
        boxes = jnp.tile(boxes[None], (b, 1, 1))
        pf = jnp.tile(variables['params']['init_proposal_features'][None],
                      (b, 1, 1))
        outs = []
        for i in range(self.num_stages):
            roi = jax.vmap(
                lambda f0, f1, f2, f3, r: multilevel_roi_align(
                    [f0, f1, f2, f3], r)
            )(feats[0], feats[1], feats[2], feats[3], boxes)
            n = boxes.shape[1]
            cls, reg, pf = self.net.apply(
                v, i, roi.reshape(b * n, 7, 7, -1), pf, method='stage')
            new_boxes = self.coder.decode(boxes, reg)
            outs.append((cls, new_boxes, pf, boxes))
            boxes = jax.lax.stop_gradient(new_boxes)
        return outs, whwh, feats, v

    def loss(self, variables, batch):
        images = batch['images']
        gt = batch['gt']
        assert gt.masks is not None, 'QueryInst needs gt mask crops'
        outs, whwh, feats, v = self._run_stages_with_feats(variables,
                                                           images)
        b = images.shape[0]
        losses = {}
        for i, (cls, boxes, pf, in_boxes) in enumerate(outs):
            l = self._stage_loss(cls, boxes, gt, whwh)
            # re-derive the stage's match for mask supervision
            match = self._stage_match(cls, boxes, gt, whwh)
            matched = match >= 0
            safe = jnp.clip(match, 0, gt.labels.shape[1] - 1)
            n = boxes.shape[1]
            det_boxes = jax.lax.stop_gradient(boxes)
            roi14 = jax.vmap(
                lambda f0, f1, f2, f3, r: multilevel_roi_align(
                    [f0, f1, f2, f3], r, out_size=14)
            )(feats[0], feats[1], feats[2], feats[3], det_boxes)
            mask_logits = self.net.apply(
                v, i, roi14.reshape(b * n, 14, 14, -1),
                pf.reshape(b * n, -1), method='mask_stage')
            c = mask_logits.shape[-1]
            lab = jnp.where(matched,
                            jnp.take_along_axis(gt.labels, safe, axis=1),
                            0).reshape(-1)
            picked = jnp.take_along_axis(
                mask_logits, jnp.clip(lab, 0, c - 1)[:, None, None, None],
                axis=-1)[..., 0]
            tgt = jax.vmap(lambda gm, gb, s_i, r_i: jax.vmap(
                lambda g, roi: crop_resize_mask(gm[g], gb[g], roi,
                                                self.mask_size))(s_i, r_i))(
                gt.masks, gt.bboxes, safe, det_boxes)
            d = dice_loss(jax.nn.sigmoid(picked).reshape(b * n, -1),
                          tgt.reshape(b * n, -1), activate=False,
                          reduction='none')
            num_pos = jnp.maximum(matched.sum().astype(jnp.float32), 1.0)
            l['loss_dice'] = self.dice_weight * \
                (d * matched.reshape(-1)).sum() / num_pos
            for k2, v2 in l.items():
                losses[f's{i}.{k2}'] = v2
        return losses

    def _stage_match(self, cls, boxes, gt, whwh):
        b, n, c = cls.shape
        prob = jax.lax.stop_gradient(jax.nn.sigmoid(cls))
        cost_cls = -jnp.take_along_axis(
            prob, jnp.clip(gt.labels, 0, c - 1)[:, None, :].repeat(n, 1),
            axis=2)
        det = jax.lax.stop_gradient(boxes)
        cost_l1 = jnp.abs(det[:, :, None] / whwh -
                          gt.bboxes[:, None, :] / whwh).sum(-1)
        giou = jax.vmap(lambda p, t: bbox_overlaps(p, t, mode='giou'))(
            det, gt.bboxes)
        cost = self.cls_cost * cost_cls + self.l1_cost * cost_l1 + \
            self.giou_cost * (-giou)
        return hungarian_match(cost, gt.mask)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        outs, whwh, feats, v = self._run_stages_with_feats(variables,
                                                           images)
        cls, boxes, pf, _ = outs[-1]
        b, n, c = cls.shape
        scores_all = jax.nn.sigmoid(cls)
        det_boxes = jax.lax.stop_gradient(boxes)
        roi14 = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r, out_size=14)
        )(feats[0], feats[1], feats[2], feats[3], det_boxes)
        mask_logits = self.net.apply(
            v, self.num_stages - 1, roi14.reshape(b * n, 14, 14, -1),
            pf.reshape(b * n, -1), method='mask_stage') \
            .reshape(b, n, self.mask_size, self.mask_size, -1)

        from ...structures import DetResults

        def single(sc, bx, mk, img_shape, scale_factor):
            flat = sc.reshape(-1)
            kk = min(self.max_per_img, flat.shape[0])
            top, idx = jax.lax.top_k(flat, kk)
            qi = idx // c
            labels = (idx % c).astype(jnp.int32)
            box = bx[qi]
            hh, ww = img_shape[0], img_shape[1]
            box = jnp.clip(box, 0, jnp.stack([ww, hh, ww, hh]))
            if rescale:
                box = scale_boxes(box, 1.0 / scale_factor)
            m = jax.nn.sigmoid(jnp.take_along_axis(
                mk[qi], jnp.clip(labels, 0, mk.shape[-1] - 1)
                [:, None, None, None], axis=-1)[..., 0])
            return DetResults(bboxes=box, scores=top, labels=labels,
                              mask=jnp.ones_like(top, bool)), m

        res, masks = jax.vmap(single)(scores_all, det_boxes, mask_logits,
                                      batch['meta'].img_shape,
                                      batch['meta'].scale_factor)
        return res, masks
