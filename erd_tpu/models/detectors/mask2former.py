"""Mask2Former (and MaskFormer via a flag): mask-classification
segmentation with masked attention.

Behavioural mirror of /root/reference/mmdet/models/detectors/mask2former.py
+ dense_heads/mask2former_head.py + maskformer_head.py +
layers/msdeformattn_pixel_decoder.py + configs/mask2former/*:

- pixel decoder: C3-C5 projected to 256 and refined by a 6-layer
  multi-scale deformable encoder; the stride-8 output is fused FPN-style
  with a C2 lateral into stride-4 ``mask_features``;
- transformer decoder: 100 learnable queries, ``num_decoder_layers``(=9)
  layers cycling coarse->fine over the 3 encoded scales; each layer does
  *masked cross-attention* (attention restricted to the foreground of the
  previous layer's mask prediction, falling back to dense attention for
  empty masks, mask2former_head.py), then self-attention and an FFN;
- per-layer heads: softmax cls over C+1 (background weight 0.1) and a
  3-layer mask-embedding MLP dotted with mask_features -> stride-4 mask
  logits; Hungarian matching with cls(2.0) + sampled-point BCE(5.0) +
  dice(5.0) costs and the same loss weights, aux losses on every layer.
- ``masked_attention=False`` + single-scale decoding degenerates to
  MaskFormer's decoder semantics.

Static-shape conversions: point losses sample a fixed K=S*S uniform grid
(the reference importance-samples 12544 random points; deviation
documented), and gt masks paste from box-normalized crops.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...structures import DetResults
from ...task.hungarian import hungarian_match
from ..backbones.resnet import ResNet
from ..heads.deformable_detr_head import DeformableEncoderLayer
from ..layers import cast_compute_params, torch_pad
from ..preprocessor import Preprocessor
from .solov2 import paste_crop


class PixelDecoder(nn.Module):
    embed_dim: int = 256
    num_encoder_layers: int = 6

    @nn.compact
    def __call__(self, feats):
        """feats C2..C5 -> (mask_features stride4, [mem8, mem16, mem32])."""
        c = self.embed_dim
        b = feats[0].shape[0]
        # project C3..C5
        lvls = []
        for i, f in enumerate(feats[1:]):
            y = nn.Conv(c, (1, 1), name=f'input_proj_{i}')(f)
            y = nn.GroupNorm(num_groups=32, name=f'input_gn_{i}')(y)
            lvls.append(y.astype(jnp.float32))
        # deformable encoder over the 3 scales
        refs, pos_embeds = [], []
        for lvl, f in enumerate(lvls):
            h, w = f.shape[1:3]
            ys = (jnp.arange(h) + 0.5) / h
            xs = (jnp.arange(w) + 0.5) / w
            gx, gy = jnp.meshgrid(xs, ys)
            refs.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
            le = self.param(f'level_embed_{lvl}',
                            nn.initializers.normal(1.0), (c,))
            pos_embeds.append(jnp.broadcast_to(le[None, None],
                                               (b, h * w, c)))
        token_refs = jnp.broadcast_to(
            jnp.concatenate(refs)[None],
            (b, sum(r.shape[0] for r in refs), 2))
        pos = jnp.concatenate(pos_embeds, axis=1)
        tokens = jnp.concatenate([f.reshape(b, -1, c) for f in lvls],
                                 axis=1)

        def unflatten(toks):
            outs, start = [], 0
            for f in lvls:
                h, w = f.shape[1:3]
                outs.append(toks[:, start:start + h * w]
                            .reshape(b, h, w, c))
                start += h * w
            return outs

        for i in range(self.num_encoder_layers):
            tokens = DeformableEncoderLayer(
                c, num_levels=3, name=f'encoder_{i}')(
                tokens, unflatten(tokens), token_refs, pos)
        mems = unflatten(tokens)  # strides 8, 16, 32
        # FPN fuse with C2 -> stride-4 mask features
        lat = nn.Conv(c, (1, 1), name='c2_lateral')(feats[0])
        lat = nn.GroupNorm(num_groups=32, name='c2_gn')(lat) \
            .astype(jnp.float32)
        up = jax.image.resize(
            mems[0], mems[0].shape[:1] + (lat.shape[1], lat.shape[2], c),
            method='bilinear')
        y = lat + up
        y = nn.relu(nn.GroupNorm(num_groups=32, name='out_gn')(
            nn.Conv(c, (3, 3), padding=[torch_pad(3)] * 2,
                    name='out_conv')(y)))
        mask_features = nn.Conv(c, (1, 1), name='mask_feature_proj')(y)
        return mask_features.astype(jnp.float32), mems


class Mask2FormerHead(nn.Module):
    num_classes: int
    embed_dim: int = 256
    num_queries: int = 100
    num_decoder_layers: int = 9
    num_heads: int = 8
    ffn_dim: int = 2048
    masked_attention: bool = True

    @nn.compact
    def __call__(self, mask_features, mems):
        c = self.embed_dim
        b = mask_features.shape[0]
        q = self.num_queries
        query = jnp.broadcast_to(
            self.param('query_feat', nn.initializers.normal(1.0),
                       (q, c))[None], (b, q, c))
        query_pos = jnp.broadcast_to(
            self.param('query_embed', nn.initializers.normal(1.0),
                       (q, c))[None], (b, q, c))
        lvl_embeds = [self.param(f'dec_level_embed_{i}',
                                 nn.initializers.normal(1.0), (c,))
                      for i in range(len(mems))]
        cls_head = nn.Dense(self.num_classes + 1, name='cls_head')
        m0 = nn.Dense(c, name='mask_mlp0')
        m1 = nn.Dense(c, name='mask_mlp1')
        m2 = nn.Dense(c, name='mask_mlp2')

        def predict(qry):
            cls = cls_head(qry)                          # (B, Q, C+1)
            emb = m2(nn.relu(m1(nn.relu(m0(qry)))))
            masks = jnp.einsum('bqc,bhwc->bqhw', emb, mask_features)
            return cls.astype(jnp.float32), masks.astype(jnp.float32)

        all_cls, all_masks = [], []
        cls0, masks0 = predict(query)
        all_cls.append(cls0)
        all_masks.append(masks0)
        # decoder: coarse -> fine cycling (mem order here is 8,16,32; the
        # reference cycles 32, 16, 8)
        order = list(range(len(mems)))[::-1]
        for i in range(self.num_decoder_layers):
            lvl = order[i % len(order)]
            mem = mems[lvl]
            hh, ww = mem.shape[1:3]
            kv = mem.reshape(b, -1, c) + lvl_embeds[lvl][None, None]
            attn_mask = None
            if self.masked_attention:
                prev = jax.lax.stop_gradient(all_masks[-1])
                pm = jax.image.resize(prev, (b, q, hh, ww),
                                      method='bilinear')
                fg = (jax.nn.sigmoid(pm) > 0.5).reshape(b, q, hh * ww)
                # empty-mask fallback: attend everywhere
                any_fg = fg.any(axis=-1, keepdims=True)
                fg = jnp.where(any_fg, fg, True)
                attn_mask = fg[:, None]                  # (B, 1, Q, K)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f'cross_attn_{i}')(
                query + query_pos, kv, kv, mask=attn_mask)
            x = nn.LayerNorm(name=f'ca_norm_{i}')(query + y)
            qq = x + query_pos
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f'self_attn_{i}')(qq, qq, x)
            x = nn.LayerNorm(name=f'sa_norm_{i}')(x + y)
            y = nn.Dense(self.ffn_dim, name=f'ffn1_{i}')(x)
            y = nn.Dense(c, name=f'ffn2_{i}')(nn.relu(y))
            query = nn.LayerNorm(name=f'ffn_norm_{i}')(x + y)
            cls_i, masks_i = predict(query)
            all_cls.append(cls_i)
            all_masks.append(masks_i)
        return jnp.stack(all_cls), jnp.stack(all_masks)


class Mask2FormerNet(nn.Module):
    num_classes: int
    depth: int = 50
    num_queries: int = 100
    num_decoder_layers: int = 9
    masked_attention: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        feats = ResNet(depth=self.depth, compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        mask_features, mems = PixelDecoder(name='pixel_decoder')(feats)
        return Mask2FormerHead(
            num_classes=self.num_classes, num_queries=self.num_queries,
            num_decoder_layers=self.num_decoder_layers,
            masked_attention=self.masked_attention, name='head')(
            mask_features, mems)


@dataclass
class Mask2FormerDetector:
    num_classes: int = 80
    depth: int = 50
    num_queries: int = 100
    num_decoder_layers: int = 9
    masked_attention: bool = True
    cls_cost: float = 2.0
    mask_cost: float = 5.0
    dice_cost: float = 5.0
    cls_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    bg_cls_weight: float = 0.1
    point_grid: int = 16  # K = point_grid^2 sampled points per mask
    max_per_img: int = 100
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)

    def __post_init__(self):
        self.net = Mask2FormerNet(
            num_classes=self.num_classes, depth=self.depth,
            num_queries=self.num_queries,
            num_decoder_layers=self.num_decoder_layers,
            masked_attention=self.masked_attention,
            compute_dtype=self.compute_dtype)
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

    def _sample_points(self, masks):
        """(..., H, W) -> (..., K) on the fixed uniform point grid."""
        g = self.point_grid
        h, w = masks.shape[-2:]
        ys = ((jnp.arange(g) + 0.5) / g * h - 0.5).astype(jnp.float32)
        xs = ((jnp.arange(g) + 0.5) / g * w - 0.5).astype(jnp.float32)
        yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)
        return masks[..., yi[:, None], xi[None, :]].reshape(
            masks.shape[:-2] + (g * g,))

    def loss(self, variables, batch):
        images = batch['images']
        gt = batch['gt']
        assert gt.masks is not None, 'Mask2Former needs gt mask crops'
        all_cls, all_masks = self.forward_raw(variables, images)
        b = images.shape[0]
        fh, fw = all_masks.shape[-2:]
        gt_masks4 = jax.vmap(lambda crops, boxes: jax.vmap(
            lambda cr, bx: paste_crop(cr, bx, fh, fw, 4))(crops, boxes))(
            gt.masks, gt.bboxes)                        # (B, G, fh, fw)
        gt_pts = self._sample_points(gt_masks4)          # (B, G, K)

        losses = {}
        for lyr in range(all_cls.shape[0]):
            l = self._layer_loss(all_cls[lyr], all_masks[lyr], gt, gt_pts)
            for k, v in l.items():
                losses[f'd{lyr}.{k}'] = v
        return losses

    def _layer_loss(self, cls, masks, gt, gt_pts):
        b, q, cp1 = cls.shape
        c = cp1 - 1
        k = gt_pts.shape[-1]
        pred_pts = self._sample_points(masks)            # (B, Q, K)
        prob = jax.lax.stop_gradient(jax.nn.softmax(cls, axis=-1))
        cost_cls = -jnp.take_along_axis(
            prob[..., :c], jnp.clip(gt.labels, 0, c - 1)[:, None]
            .repeat(q, 1), axis=2)
        pp = jax.lax.stop_gradient(pred_pts)
        # point BCE cost (mean over points), vs {0,1} targets
        pos_bce = jax.nn.softplus(-pp)                  # -log sigmoid
        neg_bce = jax.nn.softplus(pp)
        cost_mask = (jnp.einsum('bqk,bgk->bqg', pos_bce, gt_pts) +
                     jnp.einsum('bqk,bgk->bqg', neg_bce, 1 - gt_pts)) / k
        ps = jax.nn.sigmoid(pp)
        inter = jnp.einsum('bqk,bgk->bqg', ps, gt_pts)
        den = ps.sum(-1)[:, :, None] + gt_pts.sum(-1)[:, None, :]
        cost_dice = 1 - (2 * inter + 1) / (den + 1)
        cost = self.cls_cost * cost_cls + self.mask_cost * cost_mask + \
            self.dice_cost * cost_dice
        match = hungarian_match(cost, gt.mask)           # (B, Q)
        matched = match >= 0
        safe = jnp.clip(match, 0, gt.labels.shape[1] - 1)
        labels = jnp.where(matched,
                           jnp.take_along_axis(gt.labels, safe, axis=1), c)
        num_pos = jnp.maximum(matched.sum().astype(jnp.float32), 1.0)

        logp = jax.nn.log_softmax(cls, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        wts = jnp.where(labels == c, self.bg_cls_weight, 1.0)
        loss_cls = self.cls_weight * (ce * wts).sum() / wts.sum()

        tgt = jnp.take_along_axis(gt_pts, safe[..., None].repeat(k, -1),
                                  axis=1)                # (B, Q, K)
        bce = jax.nn.softplus(-pred_pts) * tgt + \
            jax.nn.softplus(pred_pts) * (1 - tgt)
        loss_mask = self.mask_weight * \
            (bce.mean(-1) * matched).sum() / num_pos
        s = jax.nn.sigmoid(pred_pts)
        inter2 = (s * tgt).sum(-1)
        dice = 1 - (2 * inter2 + 1) / (s.sum(-1) + tgt.sum(-1) + 1)
        loss_dice = self.dice_weight * (dice * matched).sum() / num_pos
        return dict(loss_cls=loss_cls, loss_mask=loss_mask,
                    loss_dice=loss_dice)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        all_cls, all_masks = self.forward_raw(variables, images)
        cls = all_cls[-1]
        masks = all_masks[-1]
        b, q, cp1 = cls.shape
        c = cp1 - 1
        scores_all = jax.nn.softmax(cls, axis=-1)[..., :c]

        def single(sc, mk, scale_factor):
            flat = sc.reshape(-1)
            kk = min(self.max_per_img, flat.shape[0])
            top, idx = jax.lax.top_k(flat, kk)
            qi = idx // c
            labels = (idx % c).astype(jnp.int32)
            m = jax.nn.sigmoid(mk[qi])                  # (kk, fh, fw)
            binm = m > 0.5
            area = binm.sum((-1, -2)).astype(jnp.float32)
            maskness = (m * binm).sum((-1, -2)) / jnp.maximum(area, 1e-6)
            score = top * maskness
            # boxes from mask extents (stride-4 frame -> image frame)
            fh, fw = m.shape[-2:]
            ys = jnp.arange(fh, dtype=jnp.float32) * 4
            xs = jnp.arange(fw, dtype=jnp.float32) * 4
            big = 1e8
            x1 = jnp.where(binm, xs[None, None, :], big).min((-1, -2))
            y1 = jnp.where(binm, ys[None, :, None], big).min((-1, -2))
            x2 = jnp.where(binm, xs[None, None, :], -big).max((-1, -2))
            y2 = jnp.where(binm, ys[None, :, None], -big).max((-1, -2))
            empty = area == 0
            boxes = jnp.where(empty[:, None], 0.0,
                              jnp.stack([x1, y1, x2 + 4, y2 + 4], -1))
            if rescale:
                sx, sy = scale_factor[0], scale_factor[1]
                boxes = boxes / jnp.stack([sx, sy, sx, sy])[None]
            return DetResults(bboxes=boxes, scores=score, labels=labels,
                              mask=(score > 0.0) & ~empty), m

        res, masks_out = jax.vmap(single)(scores_all, masks,
                                          batch['meta'].scale_factor)
        return res, masks_out
