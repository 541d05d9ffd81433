"""Sparse R-CNN: learnable proposals + iterative dynamic-interaction heads.

Behavioural mirror of /root/reference/mmdet/models/detectors/sparse_rcnn.py
+ dense_heads/embedding_rpn_head.py + roi_heads/sparse_roi_head.py +
roi_heads/bbox_heads/dii_head.py + layers/transformer/utils.py DynamicConv
+ configs/sparse_rcnn/sparse-rcnn_r50_fpn_1x_coco.py:

- EmbeddingRPN: ``num_proposals`` learnable cxcywh boxes (init = the whole
  image) scaled by (w, h, w, h), plus learnable 256-d proposal features.
- 6 cascade stages; each: 7x7 multi-level RoIAlign on the current boxes ->
  DIIHead (proposal self-attention + DynamicConv instance interaction +
  FFN; 1-fc cls / 3-fc reg branches, all LN) -> DeltaXYWH(0.5,0.5,1,1,
  clip_border=False) box update. Boxes are DETACHED between stages
  (sparse_roi_head.py:240-244).
- Per-stage Hungarian assignment (2*focal + 5*whwh-normalized L1 +
  2*giou costs) and per-stage focal(2.0)/L1(5.0)/GIoU(2.0) losses,
  avg = matched count; no NMS at inference — top max_per_img of the final
  sigmoid scores over (proposals x classes).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...losses import giou_loss, sigmoid_focal_loss
from ...ops.roi_align import multilevel_roi_align
from ...structures import DetResults
from ...structures.boxes import bbox_overlaps, scale_boxes
from ...task.coder import DeltaXYWHBBoxCoder
from ...task.hungarian import hungarian_match
from ..backbones.resnet import ResNet
from ..layers import cast_compute_params
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor


class DynamicConv(nn.Module):
    """Per-proposal generated 1x1 convs over the 7x7 RoI grid."""
    in_channels: int = 256
    feat_channels: int = 64
    out_channels: int = 256
    roi_size: int = 7

    @nn.compact
    def __call__(self, param_feat, roi_feat):
        """param_feat (R, C); roi_feat (R, 7, 7, C) -> (R, C)."""
        r = param_feat.shape[0]
        n_in = self.in_channels * self.feat_channels
        params = nn.Dense(n_in + self.feat_channels * self.out_channels,
                          name='dynamic_layer')(param_feat)
        p_in = params[:, :n_in].reshape(r, self.in_channels,
                                        self.feat_channels)
        p_out = params[:, n_in:].reshape(r, self.feat_channels,
                                         self.out_channels)
        x = roi_feat.reshape(r, -1, self.in_channels)   # (R, 49, C)
        x = jnp.einsum('rpc,rcf->rpf', x, p_in)
        x = nn.relu(nn.LayerNorm(name='norm_in')(x))
        x = jnp.einsum('rpf,rfo->rpo', x, p_out)
        x = nn.relu(nn.LayerNorm(name='norm_out')(x))
        x = x.reshape(r, -1)
        x = nn.Dense(self.out_channels, name='fc_layer')(x)
        return nn.relu(nn.LayerNorm(name='fc_norm')(x))


class DIIHead(nn.Module):
    num_classes: int
    in_channels: int = 256
    num_heads: int = 8
    ffn_channels: int = 2048
    num_cls_fcs: int = 1
    num_reg_fcs: int = 3

    @nn.compact
    def __call__(self, roi_feat, proposal_feat):
        """roi_feat (B*N, 7, 7, C); proposal_feat (B, N, C)."""
        b, n, c = proposal_feat.shape
        # proposal self-attention + LN
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=c,
            name='attention')(proposal_feat, proposal_feat)
        pf = nn.LayerNorm(name='attention_norm')(proposal_feat + attn)
        # dynamic instance interaction
        flat = pf.reshape(b * n, c)
        iic = DynamicConv(in_channels=c, name='dynamic_conv')(flat,
                                                              roi_feat)
        obj = nn.LayerNorm(name='iic_norm')(flat + iic)
        # FFN
        y = nn.Dense(self.ffn_channels, name='ffn_fc1')(obj)
        y = nn.Dense(c, name='ffn_fc2')(nn.relu(y))
        obj = nn.LayerNorm(name='ffn_norm')(obj + y)

        cf = obj
        for i in range(self.num_cls_fcs):
            cf = nn.relu(nn.LayerNorm(name=f'cls_ln{i}')(
                nn.Dense(c, use_bias=False, name=f'cls_fc{i}')(cf)))
        rf = obj
        for i in range(self.num_reg_fcs):
            rf = nn.relu(nn.LayerNorm(name=f'reg_ln{i}')(
                nn.Dense(c, use_bias=False, name=f'reg_fc{i}')(rf)))
        cls = nn.Dense(self.num_classes, name='fc_cls')(cf)
        reg = nn.Dense(4, name='fc_reg')(rf)
        return (cls.reshape(b, n, -1).astype(jnp.float32),
                reg.reshape(b, n, 4).astype(jnp.float32),
                obj.reshape(b, n, c))


class SparseRCNNNet(nn.Module):
    num_classes: int
    depth: int = 50
    num_proposals: int = 100
    num_stages: int = 6
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth,
                               compute_dtype=self.compute_dtype)
        in_ch = {18: (64, 128, 256, 512)}.get(self.depth,
                                              (256, 512, 1024, 2048))
        self.neck = FPN(in_channels=in_ch, out_channels=256, start_level=0,
                        add_extra_convs='on_input', num_outs=4)
        self.heads = [DIIHead(num_classes=self.num_classes,
                              name=f'dii_head_{i}')
                      for i in range(self.num_stages)]
        self.init_boxes = self.param(
            'init_proposal_bboxes',
            lambda key, shape: jnp.tile(
                jnp.asarray([0.5, 0.5, 1.0, 1.0]), (shape[0], 1)),
            (self.num_proposals,))
        self.init_feats = self.param(
            'init_proposal_features', nn.initializers.normal(1.0),
            (self.num_proposals, 256))

    def extract_feat(self, images):
        return self.neck(self.backbone(images))

    def stage(self, i, roi_feat, proposal_feat):
        return self.heads[i](roi_feat, proposal_feat)

    def __call__(self, images):
        feats = self.extract_feat(images)
        b = images.shape[0]
        n = self.num_proposals
        dummy_roi = jnp.zeros((b * n, 7, 7, 256), jnp.float32)
        pf = jnp.tile(self.init_feats[None], (b, 1, 1))
        outs = []
        for i in range(self.num_stages):
            cls, reg, pf = self.heads[i](dummy_roi, pf)
            outs.append((cls, reg))
        return outs


@dataclass
class SparseRCNNDetector:
    num_classes: int = 80
    depth: int = 50
    num_proposals: int = 100
    num_stages: int = 6
    max_per_img: int = 100
    cls_cost: float = 2.0
    l1_cost: float = 5.0
    giou_cost: float = 2.0
    cls_weight: float = 2.0
    l1_weight: float = 5.0
    giou_weight: float = 2.0
    compute_dtype: Any = jnp.float32

    def __post_init__(self):
        self.preprocessor = Preprocessor()
        self.net = SparseRCNNNet(num_classes=self.num_classes,
                                 depth=self.depth,
                                 num_proposals=self.num_proposals,
                                 num_stages=self.num_stages,
                                 compute_dtype=self.compute_dtype)
        self.coder = DeltaXYWHBBoxCoder(target_stds=(0.5, 0.5, 1.0, 1.0),
                                        clip_border=False)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype),
            self.preprocessor(images))

    def _run_stages(self, variables, images):
        """Returns per-stage (cls (B,N,C), boxes (B,N,4) absolute)."""
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
            outs.append((cls, new_boxes))
            boxes = jax.lax.stop_gradient(new_boxes)
        return outs, whwh

    def loss(self, variables, batch):
        images = batch['images']
        gt = batch['gt']
        outs, whwh = self._run_stages(variables, images)
        losses = {}
        for i, (cls, boxes) in enumerate(outs):
            l = self._stage_loss(cls, boxes, gt, whwh)
            for k, v in l.items():
                losses[f's{i}.{k}'] = v
        return losses

    def _stage_loss(self, cls, boxes, gt, whwh):
        b, n, c = cls.shape
        prob = jax.nn.sigmoid(jax.lax.stop_gradient(cls))
        cost_cls = -jnp.take_along_axis(
            prob, jnp.clip(gt.labels, 0, c - 1)[:, None, :].repeat(n, 1),
            axis=2)
        det_boxes = jax.lax.stop_gradient(boxes)
        cost_l1 = jnp.abs(det_boxes[:, :, None] / whwh -
                          gt.bboxes[:, None, :] / whwh).sum(-1)
        giou = jax.vmap(lambda p, t: bbox_overlaps(p, t, mode='giou'))(
            det_boxes, gt.bboxes)
        cost = self.cls_cost * cost_cls + self.l1_cost * cost_l1 + \
            self.giou_cost * (-giou)
        match = hungarian_match(cost, gt.mask)     # (B, N) gt idx or -1
        matched = match >= 0
        safe = jnp.clip(match, 0, gt.labels.shape[1] - 1)
        labels = jnp.where(matched,
                           jnp.take_along_axis(gt.labels, safe, axis=1),
                           self.num_classes)
        num_pos = jnp.maximum(matched.sum().astype(jnp.float32), 1.0)
        loss_cls = self.cls_weight * sigmoid_focal_loss(
            cls.reshape(-1, c), labels.reshape(-1), avg_factor=num_pos)
        tgt_boxes = jnp.take_along_axis(
            gt.bboxes, safe[..., None].repeat(4, -1), axis=1)
        l1 = jnp.abs(boxes / whwh - tgt_boxes / whwh).sum(-1)
        loss_l1 = self.l1_weight * (l1 * matched).sum() / num_pos
        gl = jax.vmap(lambda p, t: giou_loss(p, t, reduction='none'))(
            boxes, tgt_boxes)
        loss_giou = self.giou_weight * (gl * matched).sum() / num_pos
        return dict(loss_cls=loss_cls, loss_bbox=loss_l1,
                    loss_giou=loss_giou)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        outs, _ = self._run_stages(variables, images)
        cls, boxes = outs[-1]
        b, n, c = cls.shape
        scores = jax.nn.sigmoid(cls)

        def single(s, bx, img_shape, scale_factor):
            flat = s.reshape(-1)
            k = min(self.max_per_img, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            box = bx[idx // c]
            labels = (idx % c).astype(jnp.int32)
            hh, ww = img_shape[0], img_shape[1]
            box = jnp.clip(box, 0, jnp.stack([ww, hh, ww, hh]))
            if rescale:
                box = scale_boxes(box, 1.0 / scale_factor)
            return DetResults(bboxes=box, scores=top, labels=labels,
                              mask=jnp.ones_like(top, bool))

        return jax.vmap(single)(scores, boxes, batch['meta'].img_shape,
                                batch['meta'].scale_factor)
