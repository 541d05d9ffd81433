"""DETR: transformer encoder/decoder, set-prediction head, losses, predict.

Behavioural mirror of /root/reference/mmdet/models/detectors/detr.py +
dense_heads/detr_head.py + the layers/transformer stack with the
detr_r50_8xb2-150e config: C5 -> 1x1 proj to 256; sine positional encoding;
6 post-norm encoder + 6 decoder layers (8 heads, FFN 2048); 100 learned
queries; class FC over C+1 (softmax, background weight 0.1) + 3-layer MLP
box branch in normalized cxcywh; Hungarian matching with
cls(2.0)/L1(5.0)/GIoU(2.0) costs; auxiliary losses from every decoder
layer. Padded-canvas pixels are masked in attention using the per-image
img_shape (the reference's masks from batch padding).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import cross_entropy_int, giou_loss
from ...ops import nms_select  # noqa: F401 (DETR itself is NMS-free)
from ...structures import DetResults
from ...structures.boxes import bbox_overlaps, scale_boxes
from ...task.hungarian import hungarian_match


def sine_positional_encoding(mask, num_feats=128, temperature=10000.0):
    """mask (H, W) bool (True = VALID pixel) -> (H, W, 2*num_feats)."""
    not_mask = mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=0)
    x_embed = jnp.cumsum(not_mask, axis=1)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]),
                       jnp.cos(pos_x[..., 1::2])], axis=-1).reshape(
        mask.shape[0], mask.shape[1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]),
                       jnp.cos(pos_y[..., 1::2])], axis=-1).reshape(
        mask.shape[0], mask.shape[1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class TransformerLayer(nn.Module):
    """Post-norm encoder/decoder layer."""
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    decoder: bool = False

    @nn.compact
    def __call__(self, x, pos, memory=None, memory_pos=None,
                 query_pos=None, mask=None, memory_mask=None):
        # self attention (q = k = x + pos)
        qk_pos = query_pos if self.decoder else pos
        q = x + (qk_pos if qk_pos is not None else 0)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dim,
            name='self_attn')
        y = attn(q, q, x, mask=mask)
        x = nn.LayerNorm(name='norm1')(x + y)
        if self.decoder:
            q = x + (query_pos if query_pos is not None else 0)
            k = memory + (memory_pos if memory_pos is not None else 0)
            cross = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.embed_dim,
                name='cross_attn')
            y = cross(q, k, memory, mask=memory_mask)
            x = nn.LayerNorm(name='norm2')(x + y)
        y = nn.Dense(self.ffn_dim, name='ffn1')(x)
        y = nn.Dense(self.embed_dim, name='ffn2')(nn.relu(y))
        return nn.LayerNorm(name='norm3')(x + y)


class DETRHeadNet(nn.Module):
    """Transformer + class/box branches over projected C5 features."""
    num_classes: int
    embed_dim: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_queries: int = 100
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, feat, valid_mask):
        """feat (B, H, W, C_in); valid_mask (B, H, W) bool.

        Returns (all_cls (L, B, Q, C+1), all_boxes (L, B, Q, 4) cxcywh in
        [0, 1] of the PADDED canvas frame).
        """
        b, h, w, _ = feat.shape
        x = nn.Conv(self.embed_dim, (1, 1), name='input_proj')(feat)
        x = x.reshape(b, h * w, self.embed_dim).astype(jnp.float32)
        pos = jax.vmap(lambda m: sine_positional_encoding(
            m, self.embed_dim // 2))(valid_mask)
        pos = pos.reshape(b, h * w, self.embed_dim)
        kp = valid_mask.reshape(b, h * w)
        enc_mask = kp[:, None, None, :]  # (B, 1, 1, HW) attend-to mask

        for i in range(self.num_encoder_layers):
            x = TransformerLayer(self.embed_dim, self.num_heads,
                                 self.ffn_dim,
                                 name=f'encoder_{i}')(x, pos, mask=enc_mask)

        query_embed = self.param('query_embed',
                                 nn.initializers.normal(1.0),
                                 (self.num_queries, self.embed_dim))
        q = jnp.zeros((b, self.num_queries, self.embed_dim), jnp.float32)
        qpos = jnp.broadcast_to(query_embed[None], q.shape)

        cls_branch = nn.Dense(self.num_classes + 1, name='fc_cls')
        box_branch = [nn.Dense(self.embed_dim, name=f'reg_fc{i}')
                      for i in range(2)] + [nn.Dense(4, name='fc_reg')]

        all_cls, all_boxes = [], []
        for i in range(self.num_decoder_layers):
            q = TransformerLayer(self.embed_dim, self.num_heads,
                                 self.ffn_dim, decoder=True,
                                 name=f'decoder_{i}')(
                q, None, memory=x, memory_pos=pos, query_pos=qpos,
                memory_mask=enc_mask)
            out = nn.LayerNorm(name='post_norm')(q) \
                if i == self.num_decoder_layers - 1 else q
            all_cls.append(cls_branch(out))
            y = out
            for fc in box_branch[:-1]:
                y = nn.relu(fc(y))
            all_boxes.append(jax.nn.sigmoid(box_branch[-1](y)))
        return jnp.stack(all_cls), jnp.stack(all_boxes)


# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class DETRTrainConfig:
    cls_cost: float = 1.0
    l1_cost: float = 5.0
    giou_cost: float = 2.0
    cls_loss_weight: float = 1.0
    l1_loss_weight: float = 5.0
    giou_loss_weight: float = 2.0
    bg_class_weight: float = 0.1


def cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def xyxy_to_cxcywh(b):
    return jnp.stack([(b[..., 0] + b[..., 2]) / 2,
                      (b[..., 1] + b[..., 3]) / 2,
                      b[..., 2] - b[..., 0], b[..., 3] - b[..., 1]], -1)


def detr_loss(all_cls, all_boxes, gt, canvas_hw, num_classes,
              cfg: DETRTrainConfig = DETRTrainConfig()):
    """Hungarian-matched set losses, summed over decoder layers.

    all_cls (L, B, Q, C+1); all_boxes (L, B, Q, 4) normalized cxcywh;
    gt boxes are xyxy in canvas pixels.
    """
    ch, cw = canvas_hw
    norm = jnp.asarray([cw, ch, cw, ch], jnp.float32)
    gt_xyxy_n = gt.bboxes / norm
    gt_cxcywh_n = xyxy_to_cxcywh(gt_xyxy_n)
    num_pos = jnp.maximum(gt.mask.sum().astype(jnp.float32), 1.0)

    losses = {}
    for lyr in range(all_cls.shape[0]):
        cls = all_cls[lyr]
        boxes = all_boxes[lyr]  # (B, Q, 4) cxcywh normalized
        # ---- match costs ----
        prob = jax.nn.softmax(cls, axis=-1)  # (B, Q, C+1)
        cls_cost = -prob[..., :num_classes]  # (B, Q, C); gather per gt
        cost_cls = jnp.take_along_axis(
            cls_cost, gt.labels[:, None, :].repeat(boxes.shape[1], 1),
            axis=2)  # (B, Q, G)
        cost_l1 = jnp.abs(boxes[:, :, None, :] -
                          gt_cxcywh_n[:, None, :, :]).sum(-1)
        giou = bbox_overlaps(cxcywh_to_xyxy(boxes), gt_xyxy_n, mode='giou')
        cost = cfg.cls_cost * cost_cls + cfg.l1_cost * cost_l1 + \
            cfg.giou_cost * (-giou)
        match = hungarian_match(cost, gt.mask)  # (B, Q) gt idx or -1
        matched = match >= 0
        safe = jnp.maximum(match, 0)

        labels = jnp.where(matched,
                           jnp.take_along_axis(gt.labels, safe, axis=1),
                           num_classes)
        cw_vec = jnp.concatenate([jnp.ones((num_classes,)),
                                  jnp.asarray([cfg.bg_class_weight])])
        ce = cross_entropy_int(cls.reshape(-1, num_classes + 1),
                               labels.reshape(-1))
        wts = cw_vec[labels.reshape(-1)]
        loss_cls = cfg.cls_loss_weight * (ce * wts).sum() / wts.sum()

        tgt_cxcywh = jnp.take_along_axis(
            gt_cxcywh_n, safe[..., None].repeat(4, -1), axis=1)
        l1 = jnp.abs(boxes - tgt_cxcywh).sum(-1)
        loss_bbox = cfg.l1_loss_weight * \
            (l1 * matched).sum() / num_pos
        tgt_xyxy = jnp.take_along_axis(
            gt_xyxy_n, safe[..., None].repeat(4, -1), axis=1)
        lg = giou_loss(cxcywh_to_xyxy(boxes).reshape(-1, 4),
                       tgt_xyxy.reshape(-1, 4), reduction='none')
        loss_giou = cfg.giou_loss_weight * \
            (lg * matched.reshape(-1)).sum() / num_pos

        suffix = '' if lyr == all_cls.shape[0] - 1 else f'_aux{lyr}'
        losses[f'loss_cls{suffix}'] = loss_cls
        losses[f'loss_bbox{suffix}'] = loss_bbox
        losses[f'loss_giou{suffix}'] = loss_giou
    return losses


def detr_predict(cls_logits, boxes, meta, canvas_hw, num_classes,
                 max_per_img=100, rescale=True) -> DetResults:
    """Final-layer outputs -> top-100 detections (NMS-free)."""
    ch, cw = canvas_hw

    def single(cl, bx, img_shape, scale_factor):
        prob = jax.nn.softmax(cl, axis=-1)[:, :num_classes]  # (Q, C)
        flat = prob.reshape(-1)
        k = min(max_per_img, flat.shape[0])
        top, idx = jax.lax.top_k(flat, k)
        qidx = idx // num_classes
        labels = (idx % num_classes).astype(jnp.int32)
        norm = jnp.asarray([cw, ch, cw, ch], jnp.float32)
        b_xyxy = cxcywh_to_xyxy(bx[qidx]) * norm
        h, w = img_shape[0], img_shape[1]
        wh_clip = jnp.stack([w, h, w, h]).astype(b_xyxy.dtype)
        b_xyxy = jnp.clip(b_xyxy, 0, wh_clip)
        if rescale:
            b_xyxy = scale_boxes(b_xyxy, 1.0 / scale_factor)
        mask = top > 0
        return DetResults(bboxes=b_xyxy, scores=top, labels=labels,
                          mask=mask)

    return jax.vmap(single)(cls_logits, boxes, meta.img_shape,
                            meta.scale_factor)
