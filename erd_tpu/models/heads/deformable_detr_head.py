"""Deformable DETR: encoder/decoder with multi-scale deformable attention.

Behavioural mirror of the reference's deformable_detr.py +
deformable_detr_head.py (two-stage off, box refinement off — the base
single-stage variant): 4 feature levels (C3-C5 + extra), 6 deformable
encoder layers, 6 decoder layers (self-attn + deformable cross-attn),
300 queries with learned reference points, sigmoid classification
(focal loss), L1+GIoU box losses with Hungarian matching, per-layer
auxiliaries.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import giou_loss, sigmoid_focal_loss
from ...ops.ms_deform_attn import ms_deform_attn_sample
from ...structures.boxes import bbox_overlaps
from ...task.hungarian import hungarian_match
from .detr_head import cxcywh_to_xyxy, xyxy_to_cxcywh


class MSDeformAttnLayer(nn.Module):
    """One deformable attention block (query -> sampled multi-level values)."""
    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4

    @nn.compact
    def __call__(self, query, value_levels_b, ref_points):
        """query (B, Q, C); value_levels_b: list of (B, H, W, C);
        ref_points (B, Q, 2) normalized."""
        b, q, c = query.shape
        hd = c // self.num_heads
        off = nn.Dense(self.num_heads * self.num_levels * self.num_points *
                       2, kernel_init=nn.initializers.zeros,
                       name='sampling_offsets')(query)
        off = off.reshape(b, q, self.num_heads, self.num_levels,
                          self.num_points, 2)
        attn = nn.Dense(self.num_heads * self.num_levels * self.num_points,
                        kernel_init=nn.initializers.zeros,
                        name='attention_weights')(query)
        attn = jax.nn.softmax(
            attn.reshape(b, q, self.num_heads,
                         self.num_levels * self.num_points), axis=-1)
        attn = attn.reshape(b, q, self.num_heads, self.num_levels,
                            self.num_points)
        # one value projection shared across levels
        proj = nn.DenseGeneral((self.num_heads, hd), axis=-1,
                               name='value_proj')
        values = [proj(v) for v in value_levels_b]

        # normalize offsets by level size: loc = ref + off / (W, H)
        shapes = jnp.asarray(
            [[v.shape[2], v.shape[1]] for v in value_levels_b],
            jnp.float32)  # (L, 2) as (W, H)
        locs = ref_points[:, :, None, None, None, :] + \
            off / shapes[None, None, None, :, None, :]

        def single(vals, loc, wts):
            return ms_deform_attn_sample(vals, loc, wts)

        out = jax.vmap(single)(values, locs, attn)  # (B, Q, heads, hd)
        out = out.reshape(b, q, c)
        return nn.Dense(c, name='output_proj')(out)


class DeformableEncoderLayer(nn.Module):
    embed_dim: int = 256
    ffn_dim: int = 1024
    num_levels: int = 4

    @nn.compact
    def __call__(self, tokens, value_levels_b, ref_points, pos):
        y = MSDeformAttnLayer(self.embed_dim, num_levels=self.num_levels,
                              name='self_attn')(
            tokens + pos, value_levels_b, ref_points)
        x = nn.LayerNorm(name='norm1')(tokens + y)
        y = nn.Dense(self.ffn_dim, name='ffn1')(x)
        y = nn.Dense(self.embed_dim, name='ffn2')(nn.relu(y))
        return nn.LayerNorm(name='norm2')(x + y)


class DeformableDecoderLayer(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 1024

    @nn.compact
    def __call__(self, query, query_pos, value_levels_b, ref_points):
        q = query + query_pos
        y = nn.MultiHeadDotProductAttention(num_heads=self.num_heads,
                                            name='self_attn')(q, q, query)
        x = nn.LayerNorm(name='norm1')(query + y)
        y = MSDeformAttnLayer(self.embed_dim, name='cross_attn')(
            x + query_pos, value_levels_b, ref_points)
        x = nn.LayerNorm(name='norm2')(x + y)
        y = nn.Dense(self.ffn_dim, name='ffn1')(x)
        y = nn.Dense(self.embed_dim, name='ffn2')(nn.relu(y))
        return nn.LayerNorm(name='norm3')(x + y)


class DeformableDETRHeadNet(nn.Module):
    num_classes: int
    embed_dim: int = 256
    num_queries: int = 100
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: per-level (B, H_l, W_l, C=embed_dim). Returns
        (all_cls (Lyr, B, Q, num_classes), all_boxes (Lyr, B, Q, 4)
        normalized cxcywh)."""
        b = feats[0].shape[0]
        c = self.embed_dim
        # per-token reference points (center of each cell, normalized)
        refs, pos_embeds = [], []
        for lvl, f in enumerate(feats):
            h, w = f.shape[1:3]
            ys = (jnp.arange(h) + 0.5) / h
            xs = (jnp.arange(w) + 0.5) / w
            gx, gy = jnp.meshgrid(xs, ys)
            refs.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
            lvl_embed = self.param(f'level_embed_{lvl}',
                                   nn.initializers.normal(1.0), (c,))
            pos_embeds.append(jnp.broadcast_to(lvl_embed[None, None],
                                               (b, h * w, c)))
        token_refs = jnp.broadcast_to(
            jnp.concatenate(refs)[None], (b, sum(r.shape[0] for r in refs),
                                          2))
        pos = jnp.concatenate(pos_embeds, axis=1)
        tokens = jnp.concatenate(
            [f.reshape(b, -1, c) for f in feats], axis=1)

        def unflatten(toks):
            outs = []
            start = 0
            for f in feats:
                h, w = f.shape[1:3]
                outs.append(toks[:, start:start + h * w].reshape(
                    b, h, w, c))
                start += h * w
            return outs

        for i in range(self.num_encoder_layers):
            tokens = DeformableEncoderLayer(
                c, name=f'encoder_{i}')(tokens, unflatten(tokens),
                                        token_refs, pos)
        memory_levels = unflatten(tokens)

        qe = self.param('query_embed', nn.initializers.normal(1.0),
                        (self.num_queries, 2 * c))
        query_pos = jnp.broadcast_to(qe[None, :, :c],
                                     (b, self.num_queries, c))
        query = jnp.broadcast_to(qe[None, :, c:],
                                 (b, self.num_queries, c))
        ref = jax.nn.sigmoid(
            nn.Dense(2, name='reference_points')(query_pos))  # (B, Q, 2)

        cls_branch = nn.Dense(self.num_classes, name='fc_cls')
        reg0 = nn.Dense(c, name='reg_fc0')
        reg1 = nn.Dense(c, name='reg_fc1')
        reg2 = nn.Dense(4, name='fc_reg')

        all_cls, all_boxes = [], []
        for i in range(self.num_decoder_layers):
            query = DeformableDecoderLayer(
                c, name=f'decoder_{i}')(query, query_pos, memory_levels,
                                        ref)
            all_cls.append(cls_branch(query))
            y = nn.relu(reg0(query))
            y = nn.relu(reg1(y))
            delta = reg2(y)
            # box center = inverse-sigmoid(ref) + delta, size from delta
            ref_logit = jnp.log(jnp.clip(ref, 1e-6, 1 - 1e-6) /
                                jnp.clip(1 - ref, 1e-6, 1 - 1e-6))
            cxcy = jax.nn.sigmoid(delta[..., :2] + ref_logit)
            wh = jax.nn.sigmoid(delta[..., 2:])
            all_boxes.append(jnp.concatenate([cxcy, wh], axis=-1))
        return jnp.stack(all_cls), jnp.stack(all_boxes)


@dataclass(frozen=True)
class DeformableDETRTrainConfig:
    cls_cost: float = 2.0
    l1_cost: float = 5.0
    giou_cost: float = 2.0
    cls_loss_weight: float = 2.0
    l1_loss_weight: float = 5.0
    giou_loss_weight: float = 2.0


def deformable_detr_loss(all_cls, all_boxes, gt, canvas_hw, num_classes,
                         cfg=DeformableDETRTrainConfig()):
    """Sigmoid-focal set losses with Hungarian matching, per decoder layer."""
    ch, cw = canvas_hw
    norm = jnp.asarray([cw, ch, cw, ch], jnp.float32)
    gt_xyxy_n = gt.bboxes / norm
    gt_cxcywh_n = xyxy_to_cxcywh(gt_xyxy_n)
    num_pos = jnp.maximum(gt.mask.sum().astype(jnp.float32), 1.0)

    losses = {}
    for lyr in range(all_cls.shape[0]):
        cls = all_cls[lyr]
        boxes = all_boxes[lyr]
        prob = jax.nn.sigmoid(cls)
        # focal-style classification cost (reference FocalLossCost)
        alpha, gamma = 0.25, 2.0
        pos_cost = alpha * jnp.power(1 - prob, gamma) * \
            (-jnp.log(jnp.clip(prob, 1e-8, None)))
        neg_cost = (1 - alpha) * jnp.power(prob, gamma) * \
            (-jnp.log(jnp.clip(1 - prob, 1e-8, None)))
        q = boxes.shape[1]
        cost_cls = jnp.take_along_axis(
            pos_cost - neg_cost, gt.labels[:, None, :].repeat(q, 1),
            axis=2)
        cost_l1 = jnp.abs(boxes[:, :, None, :] -
                          gt_cxcywh_n[:, None, :, :]).sum(-1)
        giou = bbox_overlaps(cxcywh_to_xyxy(boxes), gt_xyxy_n, mode='giou')
        cost = cfg.cls_cost * cost_cls + cfg.l1_cost * cost_l1 + \
            cfg.giou_cost * (-giou)
        match = hungarian_match(cost, gt.mask)
        matched = match >= 0
        safe = jnp.maximum(match, 0)

        labels = jnp.where(matched,
                           jnp.take_along_axis(gt.labels, safe, axis=1),
                           num_classes)
        loss_cls = cfg.cls_loss_weight * sigmoid_focal_loss(
            cls.reshape(-1, num_classes), labels.reshape(-1),
            avg_factor=num_pos)

        tgt_c = jnp.take_along_axis(gt_cxcywh_n,
                                    safe[..., None].repeat(4, -1), axis=1)
        l1 = jnp.abs(boxes - tgt_c).sum(-1)
        loss_bbox = cfg.l1_loss_weight * (l1 * matched).sum() / num_pos
        tgt_x = jnp.take_along_axis(gt_xyxy_n,
                                    safe[..., None].repeat(4, -1), axis=1)
        lg = giou_loss(cxcywh_to_xyxy(boxes).reshape(-1, 4),
                       tgt_x.reshape(-1, 4), reduction='none')
        loss_giou = cfg.giou_loss_weight * \
            (lg * matched.reshape(-1)).sum() / num_pos

        sfx = '' if lyr == all_cls.shape[0] - 1 else f'_aux{lyr}'
        losses[f'loss_cls{sfx}'] = loss_cls
        losses[f'loss_bbox{sfx}'] = loss_bbox
        losses[f'loss_giou{sfx}'] = loss_giou
    return losses
