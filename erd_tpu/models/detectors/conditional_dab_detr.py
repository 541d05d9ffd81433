"""Conditional DETR and DAB-DETR (single-scale DETR second generation).

Behavioural mirrors of /root/reference/mmdet/models/detectors/
conditional_detr.py and dab_detr.py (+ their heads and
layers/transformer/conditional_detr_layers.py, dab_detr_layers.py):

  * Conditional DETR: decoder cross-attention splits into content and
    spatial streams — the spatial query is the sine embedding of a
    per-query learned 2-d reference point, modulated by an MLP of the
    content ("conditional spatial query"); attention logits are the sum of
    content@content and spatial@spatial dot products. Boxes decode as
    sigmoid(FFN(content) + inverse_sigmoid(ref)) on the center coords.
    Classification is sigmoid-focal (80-way).
  * DAB-DETR: queries ARE learned 4-d anchor boxes; the spatial query is
    the sine embedding of (cx, cy) modulated by the anchor's (w, h), and
    each decoder layer refines the anchor in inverse-sigmoid space
    (detached between layers).

Both reuse the Hungarian focal+L1+GIoU matching loss from the DINO kit and
the vanilla DETR encoder. Single jitted program, padded-canvas attention
masks, NMS-free top-k prediction.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import cast_compute_params
from ...structures import DetResults
from ...structures.boxes import scale_boxes
from ..backbones.resnet import ResNet
from ..heads.detr_head import (TransformerLayer, cxcywh_to_xyxy,
                               sine_positional_encoding, xyxy_to_cxcywh)
from ..heads.dino_head import (DINOTrainConfig, _matching_layer_loss,
                               inverse_sigmoid, sine_embed_boxes)
from ..preprocessor import Preprocessor


def sine_embed_xy(xy, num_feats=128, temperature=10000.0):
    """(..., 2) normalized (x, y) -> (..., 2*num_feats), DETR ordering
    (y-part first, matching sine_positional_encoding)."""
    import numpy as np
    dim_t = temperature ** (2 * (jnp.arange(num_feats) // 2) / num_feats)
    scale = 2 * np.pi

    def one(v):
        pos = v[..., None] * scale / dim_t
        return jnp.concatenate([jnp.sin(pos[..., 0::2]),
                                jnp.cos(pos[..., 1::2])], axis=-1)

    return jnp.concatenate([one(xy[..., 1]), one(xy[..., 0])], axis=-1)


class CondCrossAttention(nn.Module):
    """Content/spatial-decoupled cross attention (conditional DETR)."""
    embed_dim: int = 256
    num_heads: int = 8

    @nn.compact
    def __call__(self, content_q, spatial_q, memory, memory_pos,
                 key_padding_mask=None):
        """content_q/spatial_q (B, Q, C); memory/memory_pos (B, T, C)."""
        b, q, c = content_q.shape
        t = memory.shape[1]
        h = self.num_heads
        hd = c // h
        qc = nn.Dense(c, name='q_content')(content_q)
        qs = nn.Dense(c, name='q_spatial')(spatial_q)
        kc = nn.Dense(c, name='k_content')(memory)
        ks = nn.Dense(c, name='k_spatial')(memory_pos)
        v = nn.Dense(c, name='v_proj')(memory)

        def heads(x, n):
            return x.reshape(b, n, h, hd)

        # concat along head_dim => logits = qc.kc + qs.ks, scaled by 2*hd
        logits = (jnp.einsum('bqhd,bthd->bhqt', heads(qc, q), heads(kc, t))
                  + jnp.einsum('bqhd,bthd->bhqt', heads(qs, q),
                               heads(ks, t))) / jnp.sqrt(2.0 * hd)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], logits,
                               -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum('bhqt,bthd->bqhd', attn, heads(v, t))
        return nn.Dense(c, name='out_proj')(out.reshape(b, q, c))


class CondDecoderLayer(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, x, query_pos, spatial_q, memory, memory_pos,
                 key_padding_mask=None):
        qk = x + query_pos
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, name='self_attn')(qk, qk, x)
        x = nn.LayerNorm(name='norm1')(x + y)
        y = CondCrossAttention(self.embed_dim, self.num_heads,
                               name='cross_attn')(
            x, spatial_q, memory, memory_pos, key_padding_mask)
        x = nn.LayerNorm(name='norm2')(x + y)
        y = nn.Dense(self.ffn_dim, name='ffn1')(x)
        y = nn.Dense(self.embed_dim, name='ffn2')(nn.relu(y))
        return nn.LayerNorm(name='norm3')(x + y)


class CondDABNet(nn.Module):
    """Shared Conditional/DAB net; ``dab=True`` switches to 4-d anchors."""
    num_classes: int
    depth: int = 50
    num_queries: int = 100
    embed_dim: int = 256
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dab: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, valid_mask):
        c = self.embed_dim
        feats = ResNet(depth=self.depth, out_indices=(3,),
                       compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        feat = feats[0]
        b, h, w, _ = feat.shape
        vm = jax.image.resize(valid_mask.astype(jnp.float32),
                              (b, h, w), 'nearest') > 0.5
        x = nn.Conv(c, (1, 1), name='input_proj')(feat)
        x = x.reshape(b, h * w, c).astype(jnp.float32)
        pos = jax.vmap(lambda m: sine_positional_encoding(m, c // 2))(vm)
        pos = pos.reshape(b, h * w, c)
        kp = vm.reshape(b, h * w)
        enc_mask = kp[:, None, None, :]

        for i in range(self.num_encoder_layers):
            x = TransformerLayer(c, name=f'encoder_{i}')(x, pos,
                                                         mask=enc_mask)

        cls_branch = nn.Dense(self.num_classes, name='fc_cls')
        r0 = nn.Dense(c, name='reg_fc0')
        r1 = nn.Dense(c, name='reg_fc1')
        r2 = nn.Dense(4, kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name='fc_reg')
        pos_t0 = nn.Dense(c, name='pos_transform_fc0')
        pos_t1 = nn.Dense(c, name='pos_transform_fc1')

        if self.dab:
            # queries ARE 4-d anchors (dab_detr.py)
            anchors = self.param('anchor_embed',
                                 nn.initializers.uniform(1.0),
                                 (self.num_queries, 4))
            ref = jnp.broadcast_to(jax.nn.sigmoid(anchors)[None],
                                   (b, self.num_queries, 4))
            query = jnp.zeros((b, self.num_queries, c), jnp.float32)
            wh_mod = nn.Dense(2, name='wh_modulation')
        else:
            qe = self.param('query_embed', nn.initializers.normal(1.0),
                            (self.num_queries, c))
            query_pos_base = jnp.broadcast_to(qe[None],
                                              (b, self.num_queries, c))
            # learned 2-d reference points (conditional_detr_head.py)
            ref2 = jax.nn.sigmoid(
                nn.Dense(2, name='ref_points')(query_pos_base))
            query = jnp.zeros((b, self.num_queries, c), jnp.float32)

        all_cls, all_boxes = [], []
        for i in range(self.num_decoder_layers):
            if self.dab:
                # query pos from the full 4-d anchor embedding
                qp = pos_t1(nn.relu(pos_t0(sine_embed_boxes(ref, c // 2))))
                sq = sine_embed_xy(ref[..., :2], c // 2)
                # modulate by anchor wh (DAB "width/height modulation")
                mod = jax.nn.sigmoid(wh_mod(query)) if i > 0 else \
                    jnp.ones_like(ref[..., :2])
                half = c // 2
                sq = jnp.concatenate(
                    [sq[..., :half] * (mod[..., 1:2] /
                                       jnp.clip(ref[..., 3:4], 1e-3, None)),
                     sq[..., half:] * (mod[..., 0:1] /
                                       jnp.clip(ref[..., 2:3], 1e-3,
                                                None))], axis=-1)
            else:
                qp = query_pos_base
                sq = sine_embed_xy(ref2, c // 2)
            # conditional spatial query: modulate by MLP(content)
            if i > 0 or self.dab:
                t = nn.Dense(c, name=f'cond_t_{i}')(query)
                sq = sq * t
            query = CondDecoderLayer(c, name=f'decoder_{i}')(
                query, qp, sq, x, pos, key_padding_mask=kp)
            out = nn.LayerNorm(name='post_norm')(query) \
                if i == self.num_decoder_layers - 1 else query
            all_cls.append(cls_branch(out))
            delta = r2(nn.relu(r1(nn.relu(r0(out)))))
            if self.dab:
                new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
                all_boxes.append(new_ref)
                ref = jax.lax.stop_gradient(new_ref)
            else:
                ctr = jax.nn.sigmoid(delta[..., :2] +
                                     inverse_sigmoid(ref2))
                wh = jax.nn.sigmoid(delta[..., 2:])
                all_boxes.append(jnp.concatenate([ctr, wh], axis=-1))
        return jnp.stack(all_cls), jnp.stack(all_boxes)


@dataclass
class ConditionalDETRDetector:
    num_classes: int = 80
    depth: int = 50
    num_queries: int = 100
    dab: bool = False
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    train_cfg: DINOTrainConfig = field(default_factory=DINOTrainConfig)
    max_per_img: int = 100

    def __post_init__(self):
        self.net = CondDABNet(num_classes=self.num_classes,
                              depth=self.depth,
                              num_queries=self.num_queries, dab=self.dab,
                              compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def _valid_mask(self, batch):
        images = batch['images']
        b, h, w = images.shape[:3]
        ys = jnp.arange(h)[None, :, None]
        xs = jnp.arange(w)[None, None, :]
        shp = batch['meta'].img_shape
        return (ys < shp[:, 0][:, None, None]) & \
            (xs < shp[:, 1][:, None, None])

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        vm = jnp.ones((batch_size,) + tuple(image_shape), bool)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy), vm)

    def forward_raw(self, variables, images, valid_mask=None):
        if valid_mask is None:
            valid_mask = jnp.ones(images.shape[:3], bool)
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images),
                              valid_mask)

    def loss(self, variables, batch):
        from ..heads.dino_head import DINOTrainConfig  # noqa: F401
        images = batch['images']
        all_cls, all_boxes = self.forward_raw(variables, images,
                                              self._valid_mask(batch))
        gt = batch['gt']
        ch, cw = images.shape[1:3]
        norm = jnp.asarray([cw, ch, cw, ch], jnp.float32)
        gt_xyxy_n = gt.bboxes / norm
        gt_cxcywh_n = xyxy_to_cxcywh(gt_xyxy_n)
        num_pos = jnp.maximum(gt.mask.sum().astype(jnp.float32), 1.0)
        losses = {}
        n_layers = all_cls.shape[0]
        for lyr in range(n_layers):
            lc, lb, lg = _matching_layer_loss(
                all_cls[lyr].astype(jnp.float32),
                all_boxes[lyr].astype(jnp.float32), gt_xyxy_n, gt_cxcywh_n,
                gt.labels, gt.mask, self.num_classes, num_pos,
                self.train_cfg)
            sfx = '' if lyr == n_layers - 1 else f'_aux{lyr}'
            losses[f'loss_cls{sfx}'] = lc
            losses[f'loss_bbox{sfx}'] = lb
            losses[f'loss_giou{sfx}'] = lg
        return losses

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        all_cls, all_boxes = self.forward_raw(variables, images,
                                              self._valid_mask(batch))
        cls = all_cls[-1].astype(jnp.float32)
        boxes = all_boxes[-1].astype(jnp.float32)
        ch, cw = images.shape[1:3]

        def single(cl, bx, img_shape, scale_factor):
            prob = jax.nn.sigmoid(cl)
            flat = prob.reshape(-1)
            k = min(self.max_per_img, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            qidx = idx // self.num_classes
            labels = (idx % self.num_classes).astype(jnp.int32)
            norm = jnp.asarray([cw, ch, cw, ch], jnp.float32)
            b_xyxy = cxcywh_to_xyxy(bx[qidx]) * norm
            h, w = img_shape[0], img_shape[1]
            b_xyxy = jnp.clip(b_xyxy, 0,
                              jnp.stack([w, h, w, h]).astype(b_xyxy.dtype))
            if rescale:
                b_xyxy = scale_boxes(b_xyxy, 1.0 / scale_factor)
            return DetResults(bboxes=b_xyxy, scores=top, labels=labels,
                              mask=top > 0)

        return jax.vmap(single)(cls, boxes, batch['meta'].img_shape,
                                batch['meta'].scale_factor)


@dataclass
class DABDETRDetector(ConditionalDETRDetector):
    dab: bool = True
