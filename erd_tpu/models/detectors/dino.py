"""DINO detector assembly (reference mmdet/models/detectors/dino.py with
the dino-4scale_r50_8xb2-12e config shape: R50 C3-C5 + extra level through
a GN ChannelMapper, 6+6 transformer, 900 queries, CDN denoising).

Train step: CDN noise is drawn in-jit from a PRNG key folded with the
batch's image ids (deterministic, batch-varying); the static dn layout is
dn_groups x 2 x MAX_GT slots. Inference uses the matching queries only —
NMS-free sigmoid top-k, exactly like deformable DETR.
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
from ..heads.detr_head import cxcywh_to_xyxy, xyxy_to_cxcywh
from ..heads.dino_head import (DINOHeadNet, DINOTrainConfig, dino_loss,
                               make_dn_attn_mask, make_dn_queries)
from ..necks.extra_necks import ChannelMapper
from ..preprocessor import Preprocessor


class DINONet(nn.Module):
    num_classes: int
    depth: int = 50
    num_queries: int = 100
    embed_dim: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, dn_labels=None, dn_boxes=None,
                 dn_attn_mask=None):
        feats = ResNet(depth=self.depth, out_indices=(1, 2, 3),
                       compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        in_ch = tuple(f.shape[-1] for f in feats)
        feats = ChannelMapper(in_channels=in_ch,
                              out_channels=self.embed_dim,
                              kernel_size=1, num_outs=4,
                              name='neck')(feats)
        feats = [f.astype(jnp.float32) for f in feats]
        return DINOHeadNet(num_classes=self.num_classes,
                           embed_dim=self.embed_dim,
                           num_queries=self.num_queries,
                           name='bbox_head')(feats, dn_labels, dn_boxes,
                                             dn_attn_mask)


@dataclass
class DINODetector:
    num_classes: int = 80
    depth: int = 50
    num_queries: int = 100
    compute_dtype: Any = jnp.float32
    preprocessor: Preprocessor = field(default_factory=Preprocessor)
    train_cfg: DINOTrainConfig = field(default_factory=DINOTrainConfig)
    max_per_img: int = 100

    def __post_init__(self):
        self.net = DINONet(num_classes=self.num_classes, depth=self.depth,
                           num_queries=self.num_queries,
                           compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def init(self, rng, image_shape=(128, 128), batch_size=1, max_gt=8):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        g = max_gt
        d = 2 * g * self.train_cfg.dn_groups
        dn_labels = jnp.zeros((batch_size, d), jnp.int32)
        dn_boxes = jnp.full((batch_size, d, 4), 0.5, jnp.float32)
        mask = make_dn_attn_mask(d, self.num_queries,
                                 self.train_cfg.dn_groups)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy),
                                      dn_labels, dn_boxes, mask)

    def forward_raw(self, variables, images):
        return self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images))

    def loss(self, variables, batch):
        images = batch['images']
        gt = batch['gt']
        ch, cw = images.shape[1], images.shape[2]
        norm = jnp.asarray([cw, ch, cw, ch], jnp.float32)
        gt_cxcywh_n = xyxy_to_cxcywh(gt.bboxes / norm)

        rng = jax.random.fold_in(jax.random.PRNGKey(7),
                                 batch['meta'].img_id.sum())
        dn_labels, dn_boxes, dn_valid = make_dn_queries(
            rng, gt_cxcywh_n, gt.labels, gt.mask, self.num_classes,
            dn_groups=self.train_cfg.dn_groups,
            label_noise_scale=self.train_cfg.label_noise_scale,
            box_noise_scale=self.train_cfg.box_noise_scale)
        attn_mask = make_dn_attn_mask(dn_labels.shape[1], self.num_queries,
                                      self.train_cfg.dn_groups)
        outs = self.net.apply(
            cast_compute_params(variables, self.compute_dtype), self.preprocessor(images),
                              dn_labels, dn_boxes, attn_mask)
        outs = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if isinstance(x, jnp.ndarray) and x.dtype != jnp.int32 else x,
            outs)
        return dino_loss(outs, gt, (ch, cw), self.num_classes,
                         self.train_cfg, dn_valid=dn_valid)

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        outs = self.forward_raw(variables, images)
        cls = outs['all_cls'][-1].astype(jnp.float32)
        boxes = outs['all_boxes'][-1].astype(jnp.float32)
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
