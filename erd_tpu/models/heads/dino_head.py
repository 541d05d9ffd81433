"""DINO head: mixed query selection + box-refining decoder + CDN denoising.

Behavioural mirror of /root/reference/mmdet/models/detectors/dino.py +
dense_heads/dino_head.py + layers/transformer/dino_layers.py
(CdnQueryGenerator) — the reference zoo's strongest detector — rebuilt on
the deformable-attention kit:

  * two-stage "mixed query selection": per-token encoder proposals
    (grid anchors at 0.05 * 2^lvl base size, dino.py
    gen_encoder_output_proposals), top-num_queries tokens by max class
    logit become the initial 4-d reference boxes; decoder CONTENT queries
    stay learned (dino.py pre_decoder).
  * DAB-style box-conditioned decoding: query positions are sine
    embeddings of the 4-d reference boxes; deformable sampling offsets are
    scaled by the reference box size; each layer predicts a delta in
    inverse-sigmoid space and the reference is refined (detached between
    layers, outputs taken before the detach — "look forward twice").
  * contrastive denoising (CDN): per gt, ``dn_groups`` positive+negative
    noised copies ride as extra decoder queries with a block-diagonal
    self-attention mask (matching queries never see dn queries; dn groups
    never see each other). TPU twist: the reference sizes dn groups
    dynamically from the max gt count in the batch; here the layout is
    STATIC — dn_groups x (2 * MAX_GT) slots, invalid gt slots masked out
    of the losses — so one compiled program serves every batch.

Losses: focal cls + L1 + GIoU with Hungarian matching on the matching
queries per decoder layer, the same on the encoder proposals (interm aux),
and known-assignment dn losses (pos slot i == gt i; negatives are
background) per layer.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import giou_loss, sigmoid_focal_loss
from ...structures.boxes import bbox_overlaps
from ...task.hungarian import hungarian_match
from .deformable_detr_head import DeformableEncoderLayer, MSDeformAttnLayer
from .detr_head import cxcywh_to_xyxy, xyxy_to_cxcywh


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def sine_embed_boxes(boxes, num_feats=128, temperature=10000.0):
    """(..., 4) normalized cxcywh -> (..., 2*num_feats) position embedding.

    DAB/DINO coordinate embedding: each of (cx, cy) gets num_feats/1 dims,
    (w, h) get num_feats/2 each, concatenated to embed_dim = 2*num_feats.
    """
    half = num_feats // 2
    dim_t = temperature ** (2 * (np.arange(half) // 2) / half)

    def embed(v, n):
        dt = temperature ** (2 * (jnp.arange(n) // 2) / n)
        pos = v[..., None] * 2 * np.pi / dt
        return jnp.concatenate(
            [jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1)

    del dim_t
    cx = embed(boxes[..., 0], num_feats)
    cy = embed(boxes[..., 1], num_feats)
    w = embed(boxes[..., 2], half)
    h = embed(boxes[..., 3], half)
    return jnp.concatenate([cy, cx, w, h], axis=-1)


class BoxMSDeformAttn(nn.Module):
    """Deformable cross-attention conditioned on 4-d reference boxes:
    sampling location = ref center + offset / num_points * ref_wh / 2."""
    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4

    @nn.compact
    def __call__(self, query, value_levels_b, ref_boxes):
        from ...ops.ms_deform_attn import ms_deform_attn_sample
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
        proj = nn.DenseGeneral((self.num_heads, hd), axis=-1,
                               name='value_proj')
        values = [proj(v) for v in value_levels_b]
        # box-conditioned sampling (deformable_detr 4-d reference form)
        center = ref_boxes[:, :, None, None, None, :2]
        wh = ref_boxes[:, :, None, None, None, 2:]
        locs = center + off / self.num_points * wh * 0.5
        out = jax.vmap(ms_deform_attn_sample)(values, locs, attn)
        return nn.Dense(c, name='output_proj')(out.reshape(b, q, c))


class DINODecoderLayer(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, query, query_pos, value_levels_b, ref_boxes,
                 self_attn_mask):
        q = query + query_pos
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, name='self_attn')(
            q, q, query, mask=self_attn_mask)
        x = nn.LayerNorm(name='norm1')(query + y)
        y = BoxMSDeformAttn(self.embed_dim, name='cross_attn')(
            x + query_pos, value_levels_b, ref_boxes)
        x = nn.LayerNorm(name='norm2')(x + y)
        y = nn.Dense(self.ffn_dim, name='ffn1')(x)
        y = nn.Dense(self.embed_dim, name='ffn2')(nn.relu(y))
        return nn.LayerNorm(name='norm3')(x + y)


class DINOHeadNet(nn.Module):
    num_classes: int
    embed_dim: int = 256
    num_queries: int = 100
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], dn_labels=None,
                 dn_boxes=None, dn_attn_mask=None):
        """feats: per-level (B, H, W, C).

        dn_labels (B, D) int32, dn_boxes (B, D, 4) normalized cxcywh and
        dn_attn_mask (T, T) ride in at train time (CDN); None at inference.

        Returns dict with all_cls/all_boxes (Lyr, B, T, ...), enc_cls,
        enc_boxes, and the matching-query slice offset D.
        """
        b = feats[0].shape[0]
        c = self.embed_dim

        # ---- encoder (shared with deformable DETR) ----
        refs, pos_embeds, proposals = [], [], []
        for lvl, f in enumerate(feats):
            h, w = f.shape[1:3]
            ys = (jnp.arange(h) + 0.5) / h
            xs = (jnp.arange(w) + 0.5) / w
            gx, gy = jnp.meshgrid(xs, ys)
            ctr = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)
            refs.append(ctr)
            scale = 0.05 * (2.0 ** lvl)
            proposals.append(jnp.concatenate(
                [ctr, jnp.full((ctr.shape[0], 2), scale)], axis=-1))
            lvl_embed = self.param(f'level_embed_{lvl}',
                                   nn.initializers.normal(1.0), (c,))
            pos_embeds.append(jnp.broadcast_to(lvl_embed[None, None],
                                               (b, h * w, c)))
        n_tok = sum(r.shape[0] for r in refs)
        token_refs = jnp.broadcast_to(jnp.concatenate(refs)[None],
                                      (b, n_tok, 2))
        proposals = jnp.broadcast_to(jnp.concatenate(proposals)[None],
                                     (b, n_tok, 4))
        pos = jnp.concatenate(pos_embeds, axis=1)
        tokens = jnp.concatenate([f.reshape(b, -1, c) for f in feats],
                                 axis=1)

        def unflatten(toks):
            outs, start = [], 0
            for f in feats:
                h, w = f.shape[1:3]
                outs.append(toks[:, start:start + h * w].reshape(b, h, w,
                                                                 c))
                start += h * w
            return outs

        for i in range(self.num_encoder_layers):
            tokens = DeformableEncoderLayer(
                c, name=f'encoder_{i}')(tokens, unflatten(tokens),
                                        token_refs, pos)
        memory_levels = unflatten(tokens)

        # ---- encoder-output proposals + mixed query selection ----
        mem = nn.LayerNorm(name='enc_output_norm')(
            nn.Dense(c, name='enc_output')(tokens))
        enc_cls = nn.Dense(self.num_classes, name='enc_cls')(mem)
        d0 = nn.Dense(c, name='enc_reg_fc0')
        d1 = nn.Dense(c, name='enc_reg_fc1')
        d2 = nn.Dense(4, name='enc_reg')
        enc_delta = d2(nn.relu(d1(nn.relu(d0(mem)))))
        enc_boxes = jax.nn.sigmoid(enc_delta + inverse_sigmoid(proposals))

        k = min(self.num_queries, n_tok)
        top_scores = enc_cls.max(axis=-1)  # (B, T)
        _, top_idx = jax.lax.top_k(top_scores, k)
        init_ref = jnp.take_along_axis(
            enc_boxes, top_idx[..., None].repeat(4, -1), axis=1)
        init_ref = jax.lax.stop_gradient(init_ref)
        enc_sel_cls = jnp.take_along_axis(
            enc_cls, top_idx[..., None].repeat(self.num_classes, -1),
            axis=1)
        enc_sel_boxes = jnp.take_along_axis(
            enc_boxes, top_idx[..., None].repeat(4, -1), axis=1)

        # content queries are learned (mixed selection, dino.py pre_decoder)
        qe = self.param('query_embed', nn.initializers.normal(1.0),
                        (self.num_queries, c))
        query = jnp.broadcast_to(qe[None, :k], (b, k, c))

        # ---- CDN queries prepended ----
        n_dn = 0
        ref = init_ref
        if dn_labels is not None:
            n_dn = dn_labels.shape[1]
            label_embed = nn.Embed(self.num_classes, c,
                                   name='dn_label_embed')(dn_labels)
            query = jnp.concatenate([label_embed, query], axis=1)
            ref = jnp.concatenate([dn_boxes, init_ref], axis=1)

        mask = None
        if dn_attn_mask is not None:
            # the mask is built for num_dn + num_queries slots, but the
            # matching-query count is capped at the encoder token count
            # (k = min(num_queries, n_tok)); the matching block is
            # homogeneous, so the capped mask is the leading slice
            t = query.shape[1]  # n_dn + k
            mask = dn_attn_mask[:t, :t][None, None]  # (1, 1, T, T)

        cls_branch = nn.Dense(self.num_classes, name='fc_cls')
        r0 = nn.Dense(c, name='reg_fc0')
        r1 = nn.Dense(c, name='reg_fc1')
        r2 = nn.Dense(4, kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name='fc_reg')
        pos_mlp0 = nn.Dense(c, name='ref_pos_fc0')
        pos_mlp1 = nn.Dense(c, name='ref_pos_fc1')

        all_cls, all_boxes = [], []
        for i in range(self.num_decoder_layers):
            qp = pos_mlp1(nn.relu(pos_mlp0(
                sine_embed_boxes(ref, self.embed_dim // 2))))
            query = DINODecoderLayer(
                c, name=f'decoder_{i}')(query, qp, memory_levels, ref,
                                        mask)
            delta = r2(nn.relu(r1(nn.relu(r0(query)))))
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
            all_cls.append(cls_branch(query))
            all_boxes.append(new_ref)  # look-forward-twice: pre-detach
            ref = jax.lax.stop_gradient(new_ref)

        return dict(all_cls=jnp.stack(all_cls),
                    all_boxes=jnp.stack(all_boxes),
                    enc_cls=enc_sel_cls, enc_boxes=enc_sel_boxes,
                    num_dn=n_dn)


# ---------------------------------------------------------------------------
# CDN query generation (static layout)
# ---------------------------------------------------------------------------
def make_dn_queries(rng, gt_boxes_n, gt_labels, gt_mask, num_classes,
                    dn_groups=3, label_noise_scale=0.5,
                    box_noise_scale=1.0):
    """gt boxes (B, G, 4) normalized cxcywh -> dn labels/boxes (B, D, *).

    Layout per group: [G positive slots | G negative slots]; D = 2*G*groups.
    Positives: jittered within half the box extent; negatives: pushed
    between 0.5x and 1x the extent (CdnQueryGenerator semantics with a
    static group count).
    """
    b, g = gt_labels.shape
    d = 2 * g * dn_groups
    r1, r2, r3, r4 = jax.random.split(rng, 4)

    labels = jnp.tile(gt_labels, (1, 2 * dn_groups))  # (B, D)
    flip = jax.random.uniform(r1, (b, d)) < (label_noise_scale * 0.5)
    rand_lab = jax.random.randint(r2, (b, d), 0, num_classes)
    labels = jnp.where(flip, rand_lab, labels).astype(jnp.int32)

    boxes = jnp.tile(gt_boxes_n, (1, 2 * dn_groups, 1))  # (B, D, 4)
    wh = boxes[..., 2:]
    diff = jnp.concatenate([wh / 2, wh], axis=-1)  # (B, D, 4)
    sign = jax.random.randint(r3, (b, d, 4), 0, 2) * 2 - 1
    part = jax.random.uniform(r4, (b, d, 4))
    # negative slots (second G of each group) get part in [1, 2)
    is_neg = (jnp.arange(d) % (2 * g)) >= g
    part = part + is_neg[None, :, None]
    noised = boxes + sign * part * diff * box_noise_scale * 0.5
    noised = jnp.clip(noised, 0.0, 1.0)
    # keep wh positive
    noised = noised.at[..., 2:].set(jnp.clip(noised[..., 2:], 1e-4, 1.0))
    valid = jnp.tile(gt_mask, (1, 2 * dn_groups))
    return labels, noised, valid


def make_dn_attn_mask(num_dn, num_matching, dn_groups):
    """(T, T) bool attention mask (True = may attend). Matching queries
    never see dn; dn groups never see each other."""
    t = num_dn + num_matching
    mask = np.ones((t, t), bool)
    mask[num_dn:, :num_dn] = False
    gsz = num_dn // max(dn_groups, 1)
    for i in range(dn_groups):
        a, bnd = i * gsz, (i + 1) * gsz
        mask[a:bnd, :a] = False
        mask[a:bnd, bnd:num_dn] = False
    return jnp.asarray(mask)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class DINOTrainConfig:
    cls_cost: float = 2.0
    l1_cost: float = 5.0
    giou_cost: float = 2.0
    cls_loss_weight: float = 1.0
    l1_loss_weight: float = 5.0
    giou_loss_weight: float = 2.0
    dn_groups: int = 3
    label_noise_scale: float = 0.5
    box_noise_scale: float = 1.0


def _matching_layer_loss(cls, boxes, gt_xyxy_n, gt_cxcywh_n, gt_labels,
                         gt_mask, num_classes, num_pos, cfg):
    prob = jax.nn.sigmoid(cls)
    alpha, gamma = 0.25, 2.0
    pos_cost = alpha * jnp.power(1 - prob, gamma) * \
        (-jnp.log(jnp.clip(prob, 1e-8, None)))
    neg_cost = (1 - alpha) * jnp.power(prob, gamma) * \
        (-jnp.log(jnp.clip(1 - prob, 1e-8, None)))
    q = boxes.shape[1]
    cost_cls = jnp.take_along_axis(
        pos_cost - neg_cost, gt_labels[:, None, :].repeat(q, 1), axis=2)
    cost_l1 = jnp.abs(boxes[:, :, None, :] -
                      gt_cxcywh_n[:, None, :, :]).sum(-1)
    giou = bbox_overlaps(cxcywh_to_xyxy(boxes), gt_xyxy_n, mode='giou')
    cost = cfg.cls_cost * cost_cls + cfg.l1_cost * cost_l1 + \
        cfg.giou_cost * (-giou)
    match = hungarian_match(cost, gt_mask)
    matched = match >= 0
    safe = jnp.maximum(match, 0)

    labels = jnp.where(matched, jnp.take_along_axis(gt_labels, safe,
                                                    axis=1), num_classes)
    loss_cls = cfg.cls_loss_weight * sigmoid_focal_loss(
        cls.reshape(-1, num_classes), labels.reshape(-1),
        avg_factor=num_pos)
    tgt_c = jnp.take_along_axis(gt_cxcywh_n, safe[..., None].repeat(4, -1),
                                axis=1)
    l1 = jnp.abs(boxes - tgt_c).sum(-1)
    loss_bbox = cfg.l1_loss_weight * (l1 * matched).sum() / num_pos
    tgt_x = jnp.take_along_axis(gt_xyxy_n, safe[..., None].repeat(4, -1),
                                axis=1)
    lg = giou_loss(cxcywh_to_xyxy(boxes).reshape(-1, 4),
                   tgt_x.reshape(-1, 4), reduction='none')
    loss_giou = cfg.giou_loss_weight * \
        (lg * matched.reshape(-1)).sum() / num_pos
    return loss_cls, loss_bbox, loss_giou


def _dn_layer_loss(cls, boxes, gt_xyxy_n, gt_cxcywh_n, gt_labels, dn_valid,
                   num_classes, num_pos, cfg, dn_groups):
    """Known assignment: per group, slot j <-> gt j (pos), negatives = bg."""
    b, d = cls.shape[:2]
    g = gt_labels.shape[1]
    slot = jnp.arange(d)
    in_group = slot % (2 * g)  # position inside a group: [0, 2g)
    is_pos = (in_group < g)[None, :] & dn_valid
    gt_idx = (in_group % g)[None, :].repeat(b, 0)

    labels = jnp.where(is_pos,
                       jnp.take_along_axis(gt_labels, gt_idx, axis=1),
                       num_classes)
    # negatives with invalid gt slots get zero weight via dn_valid
    weight = dn_valid.astype(jnp.float32).reshape(-1)
    denom = jnp.maximum(num_pos * dn_groups, 1.0)
    loss_cls = cfg.cls_loss_weight * sigmoid_focal_loss(
        cls.reshape(-1, num_classes), labels.reshape(-1), weight=weight,
        avg_factor=denom)
    tgt_c = jnp.take_along_axis(gt_cxcywh_n,
                                gt_idx[..., None].repeat(4, -1), axis=1)
    l1 = jnp.abs(boxes - tgt_c).sum(-1)
    loss_bbox = cfg.l1_loss_weight * (l1 * is_pos).sum() / denom
    tgt_x = jnp.take_along_axis(gt_xyxy_n,
                                gt_idx[..., None].repeat(4, -1), axis=1)
    lg = giou_loss(cxcywh_to_xyxy(boxes).reshape(-1, 4),
                   tgt_x.reshape(-1, 4), reduction='none')
    loss_giou = cfg.giou_loss_weight * \
        (lg * is_pos.reshape(-1)).sum() / denom
    return loss_cls, loss_bbox, loss_giou


def dino_loss(outs, gt, canvas_hw, num_classes, cfg=DINOTrainConfig(),
              dn_valid=None):
    ch, cw = canvas_hw
    norm = jnp.asarray([cw, ch, cw, ch], jnp.float32)
    gt_xyxy_n = gt.bboxes / norm
    gt_cxcywh_n = xyxy_to_cxcywh(gt_xyxy_n)
    num_pos = jnp.maximum(gt.mask.sum().astype(jnp.float32), 1.0)
    n_dn = outs['num_dn']

    losses = {}
    n_layers = outs['all_cls'].shape[0]
    for lyr in range(n_layers):
        cls = outs['all_cls'][lyr]
        boxes = outs['all_boxes'][lyr]
        m_cls, m_boxes = cls[:, n_dn:], boxes[:, n_dn:]
        lc, lb, lg = _matching_layer_loss(
            m_cls, m_boxes, gt_xyxy_n, gt_cxcywh_n, gt.labels, gt.mask,
            num_classes, num_pos, cfg)
        sfx = '' if lyr == n_layers - 1 else f'_aux{lyr}'
        losses[f'loss_cls{sfx}'] = lc
        losses[f'loss_bbox{sfx}'] = lb
        losses[f'loss_giou{sfx}'] = lg
        if n_dn:
            dc, db, dg_ = _dn_layer_loss(
                cls[:, :n_dn], boxes[:, :n_dn], gt_xyxy_n, gt_cxcywh_n,
                gt.labels, dn_valid, num_classes, num_pos, cfg,
                cfg.dn_groups)
            losses[f'loss_dn_cls{sfx}'] = dc
            losses[f'loss_dn_bbox{sfx}'] = db
            losses[f'loss_dn_giou{sfx}'] = dg_
    # encoder proposal aux (interm outputs)
    lc, lb, lg = _matching_layer_loss(
        outs['enc_cls'], outs['enc_boxes'], gt_xyxy_n, gt_cxcywh_n,
        gt.labels, gt.mask, num_classes, num_pos, cfg)
    losses['loss_enc_cls'] = lc
    losses['loss_enc_bbox'] = lb
    losses['loss_enc_giou'] = lg
    return losses
