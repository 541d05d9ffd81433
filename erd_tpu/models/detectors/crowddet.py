"""CrowdDet: multiple-instance prediction for crowded scenes.

Behavioural mirror of /root/reference/mmdet/models/detectors/crowddet.py +
roi_heads/bbox_heads/multi_instance_bbox_head.py + configs/crowddet/*:
each RoI predicts K=2 instances (two (C+1)-way softmax heads + two 4-delta
heads off a shared 2FC trunk); training assigns every sampled proposal its
TOP-2 overlapping gts and takes the *EMD loss* — the minimum over the two
pairings of summed (CE + SmoothL1) instance losses (emd_loss_1 vs
emd_loss_2, crowddet.py); unmatched second slots regress nothing and
classify background. Inference flattens both predictions (tagged with
their source-proposal id) and runs *set-NMS*: same-proposal pairs never
suppress each other (ops.set_nms_mask).
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...losses import cross_entropy_int
from ...ops import set_nms_mask
from ...ops.misc import cap_candidates
from ...ops.roi_align import multilevel_roi_align
from ...structures import DetResults
from ...structures.boxes import bbox_overlaps, scale_boxes
from ..heads.bbox_head import rcnn_sample_single
from ..heads.rpn_head import rpn_loss, rpn_proposals
from ..layers import cast_compute_params
from .faster_rcnn import FasterRCNNDetector, FasterRCNNNet

K_INST = 2


class MultiInstanceBBoxHead(nn.Module):
    num_classes: int
    fc_dim: int = 1024

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, name='shared_fc0')(x))
        x = nn.relu(nn.Dense(self.fc_dim, name='shared_fc1')(x))
        cls = []
        reg = []
        for k in range(K_INST):
            cls.append(nn.Dense(self.num_classes + 1,
                                kernel_init=nn.initializers.normal(0.01),
                                name=f'fc_cls_{k}')(x))
            reg.append(nn.Dense(4,
                                kernel_init=nn.initializers.normal(0.001),
                                name=f'fc_reg_{k}')(x))
        return jnp.stack(cls, 1), jnp.stack(reg, 1)  # (R, 2, C+1)/(R, 2, 4)


class CrowdDetNet(FasterRCNNNet):

    def setup(self):
        from ..backbones.resnet import ResNet
        from ..heads.rpn_head import RPNHeadNet
        from ..necks.fpn import FPN
        self.backbone = ResNet(depth=self.depth,
                               compute_dtype=self.compute_dtype)
        in_ch = {18: (64, 128, 256, 512)}.get(self.depth,
                                              (256, 512, 1024, 2048))
        self.neck = FPN(in_channels=in_ch, out_channels=256, start_level=0,
                        add_extra_convs='', num_outs=5)
        self.rpn_head = RPNHeadNet()
        self.bbox_head = MultiInstanceBBoxHead(
            num_classes=self.num_classes)


@dataclass
class CrowdDetDetector(FasterRCNNDetector):

    def __post_init__(self):
        super().__post_init__()
        self.net = CrowdDetNet(num_classes=self.num_classes,
                               depth=self.depth,
                               compute_dtype=self.compute_dtype)
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
        rngs = jax.random.split(jax.random.fold_in(rng, 1), b)
        samples = jax.vmap(
            lambda k, p, pm, gb, gl, gm: rcnn_sample_single(
                k, p, pm, gb, gl, gm, self.num_classes, self.rcnn_coder,
                self.rcnn_train_cfg)
        )(rngs, prop_boxes, prop_mask, batch['gt'].bboxes,
          batch['gt'].labels, batch['gt'].mask)
        s = samples.rois.shape[1]
        roi7 = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          samples.rois)
        cls2, reg2 = self.net.apply(
            v, roi7.reshape(b * s, 7, 7, -1), method='roi_forward')
        cls2 = cls2.astype(jnp.float32)   # (R, 2, C+1)
        reg2 = reg2.astype(jnp.float32)   # (R, 2, 4)

        # top-2 gt assignment per RoI
        def tops(rois_i, gb, gl, gm):
            iou = bbox_overlaps(rois_i, gb)
            iou = jnp.where(gm[None, :], iou, -1.0)
            v2, i2 = jax.lax.top_k(iou, min(2, iou.shape[1]))
            return v2, i2

        iou2, gti2 = jax.vmap(tops)(samples.rois, batch['gt'].bboxes,
                                    batch['gt'].labels, batch['gt'].mask)
        iou2 = iou2.reshape(b * s, -1)
        gti2 = gti2.reshape(b * s, -1)
        # gather per-slot gt boxes/labels
        gb_all = batch['gt'].bboxes
        gl_all = batch['gt'].labels
        img_idx = jnp.repeat(jnp.arange(b), s)
        slot_boxes = gb_all[img_idx[:, None], gti2]       # (R, 2, 4)
        slot_labels = gl_all[img_idx[:, None], gti2]      # (R, 2)
        slot_valid = iou2 >= 0.5
        rois_f = samples.rois.reshape(b * s, 4)
        is_pos = samples.is_pos.reshape(-1)
        valid = samples.valid.reshape(-1)

        def inst_loss(cls_k, reg_k, tgt_box, tgt_lab, tgt_on):
            lab = jnp.where(tgt_on, tgt_lab, self.num_classes)
            ce = cross_entropy_int(cls_k, lab)
            deltas = self.rcnn_coder.encode(rois_f, tgt_box)
            deltas = jnp.nan_to_num(deltas, nan=0.0, posinf=0.0,
                                    neginf=0.0)
            err = jnp.abs(reg_k - deltas)
            sl1 = jnp.where(err < 1.0, 0.5 * err * err, err - 0.5).sum(-1)
            return ce + jnp.where(tgt_on, sl1, 0.0)

        # two pairings: (p0->g0, p1->g1) vs (p0->g1, p1->g0)
        lA = inst_loss(cls2[:, 0], reg2[:, 0], slot_boxes[:, 0],
                       slot_labels[:, 0], slot_valid[:, 0]) + \
            inst_loss(cls2[:, 1], reg2[:, 1], slot_boxes[:, 1],
                      slot_labels[:, 1], slot_valid[:, 1])
        lB = inst_loss(cls2[:, 0], reg2[:, 0], slot_boxes[:, 1],
                       slot_labels[:, 1], slot_valid[:, 1]) + \
            inst_loss(cls2[:, 1], reg2[:, 1], slot_boxes[:, 0],
                      slot_labels[:, 0], slot_valid[:, 0])
        emd = jnp.minimum(lA, lB)
        n_valid = jnp.maximum(valid.sum(), 1.0)
        losses['loss_emd'] = (emd * valid).sum() / n_valid
        return losses

    def predict(self, variables, batch, rescale=True):
        v = cast_compute_params(variables, self.compute_dtype)
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        feats, rpn_cls, rpn_reg = self._feats_and_rpn(variables, images)
        prop_boxes, _, prop_mask = rpn_proposals(
            ctx, [c.astype(jnp.float32) for c in rpn_cls],
            [r.astype(jnp.float32) for r in rpn_reg],
            batch['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_test)
        b, p = prop_boxes.shape[:2]
        roi7 = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          prop_boxes)
        cls2, reg2 = self.net.apply(
            v, roi7.reshape(b * p, 7, 7, -1), method='roi_forward')
        cls2 = jax.nn.softmax(cls2.astype(jnp.float32), -1) \
            .reshape(b, p, K_INST, -1)
        reg2 = reg2.astype(jnp.float32).reshape(b, p, K_INST, 4)
        cfg = self.test_cfg
        c = self.num_classes

        def single(rois, pm, probs, deltas, img_shape, scale_factor):
            boxes = self.rcnn_coder.decode(
                rois[:, None], deltas, max_shape=img_shape)  # (P, 2, 4)
            fg = probs[..., :c]                              # (P, 2, C)
            best = fg.max(-1)
            lab = fg.argmax(-1).astype(jnp.int32)
            group = jnp.broadcast_to(jnp.arange(rois.shape[0])[:, None],
                                     best.shape)
            flat_s = best.reshape(-1)
            flat_b = boxes.reshape(-1, 4)
            flat_l = lab.reshape(-1)
            flat_g = group.reshape(-1)
            valid = jnp.repeat(pm, K_INST) & (flat_s > cfg.score_thr)
            fs, vmask, fb, fl, fgp = cap_candidates(
                flat_s, valid, cfg.pre_nms_total, flat_b, flat_l, flat_g)
            if rescale:
                fb = scale_boxes(fb, 1.0 / scale_factor)
            keep = set_nms_mask(fb, jnp.where(vmask, fs, -jnp.inf), fgp,
                                cfg.iou_threshold, valid_mask=vmask)
            d = cfg.max_per_img
            sc = jnp.where(keep, fs, -jnp.inf)
            top, idx = jax.lax.top_k(sc, min(d, sc.shape[0]))
            ok = top > -jnp.inf
            return DetResults(bboxes=fb[idx], scores=jnp.where(ok, top, 0),
                              labels=fl[idx], mask=ok)

        return jax.vmap(single)(prop_boxes, prop_mask, cls2, reg2,
                                batch['meta'].img_shape,
                                batch['meta'].scale_factor)
