"""CornerNet: keypoint-pair detection with corner pooling + embeddings.

Behavioural mirror of /root/reference/mmdet/models/detectors/cornernet.py +
dense_heads/corner_head.py + configs/cornernet/*: HourglassNet backbone
(2 stacks, stride 4), per-stack corner heads with BiCornerPool
(top+left / bottom+right running maxima, corner_head.py:24-88), class
heatmaps + 1-d associative embeddings + 2-d offsets; GaussianFocalLoss
(alpha 2, gamma 4) on the corner heatmaps, AE pull/push (0.10/0.10) on gt
corner embeddings, SmoothL1 offsets at corner pixels — intermediate stack
supervision sums both stacks (:525-595). Decode (:850-983): 3x3 local-max,
top-k corners per map, all tl x br pairs scored by mean heat score and
rejected on class mismatch / geometric inversion / embedding distance —
expressed densely over the (K, K) pair grid.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import (associative_embedding_loss, gaussian_focal_loss,
                       smooth_l1_loss)
from ...ops import corner_pool, nms_select
from ...ops.gaussian import local_maximum, render_corner_targets
from ...structures import DetResults
from ..backbones.hourglass import HourglassNet, _ConvBN
from ..layers import bias_init_prob, torch_pad
from ..preprocessor import Preprocessor


class BiCornerPool(nn.Module):
    """conv->pool(dir1) + conv->pool(dir2) -> conv-bn (+1x1 shortcut bn)
    -> relu -> conv (corner_head.py:24-88)."""
    out_channels: int
    directions: Tuple[str, str]

    @nn.compact
    def __call__(self, x, train: bool = False):
        d1 = _ConvBN(128, 3, name='direction1_conv')(x, train)
        d2 = _ConvBN(128, 3, name='direction2_conv')(x, train)
        p1 = corner_pool(d1, self.directions[0])
        p2 = corner_pool(d2, self.directions[1])
        agg = _ConvBN(self.out_channels, 3, act=False,
                      name='aftpool_conv')(p1 + p2, train)
        short = _ConvBN(self.out_channels, 1, act=False,
                        name='conv1')(x, train)
        out = _ConvBN(self.out_channels, 3, name='conv2')(
            nn.relu(agg + short), train)
        return out


class CornerHeadBranch(nn.Module):
    """3x3 conv + 1x1 head (the reference _make_layers pattern)."""
    out_channels: int
    bias_prob: float = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(256, (3, 3), padding=[torch_pad(3)] * 2,
                    kernel_init=nn.initializers.normal(0.01),
                    name='feat')(x)
        bias = bias_init_prob(self.bias_prob) if self.bias_prob \
            else nn.initializers.zeros
        return nn.Conv(self.out_channels, (1, 1),
                       kernel_init=nn.initializers.normal(0.01),
                       bias_init=bias, name='out')(nn.relu(x))


class CornerNetNet(nn.Module):
    num_classes: int
    num_stacks: int = 2
    stage_channels: Tuple[int, ...] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2, 2, 4)
    downsample_times: int = 5
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        feats = HourglassNet(
            downsample_times=self.downsample_times,
            num_stacks=self.num_stacks,
            stage_channels=self.stage_channels,
            stage_blocks=self.stage_blocks,
            feat_channel=self.stage_channels[0],
            name='backbone')(images, train)
        outs = []
        for i, x in enumerate(feats):
            tl = BiCornerPool(256, ('top', 'left'),
                              name=f'tl_pool_{i}')(x, train)
            br = BiCornerPool(256, ('bottom', 'right'),
                              name=f'br_pool_{i}')(x, train)
            outs.append(dict(
                tl_heat=CornerHeadBranch(self.num_classes, 0.1,
                                         name=f'tl_heat_{i}')(tl),
                br_heat=CornerHeadBranch(self.num_classes, 0.1,
                                         name=f'br_heat_{i}')(br),
                tl_emb=CornerHeadBranch(1, name=f'tl_emb_{i}')(tl),
                br_emb=CornerHeadBranch(1, name=f'br_emb_{i}')(br),
                tl_off=CornerHeadBranch(2, name=f'tl_off_{i}')(tl),
                br_off=CornerHeadBranch(2, name=f'br_off_{i}')(br)))
        return outs


@dataclass
class CornerNetDetector:
    num_classes: int = 80
    num_stacks: int = 2
    stage_channels: Tuple[int, ...] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2, 2, 4)
    downsample_times: int = 5
    corner_topk: int = 100
    distance_threshold: float = 0.5
    score_thr: float = 0.05
    max_per_img: int = 100
    nms_iou: float = 0.5
    # the published recipe tests with gaussian soft-NMS (reference
    # configs/cornernet/...mstest_coco.py:44 nms type='soft_nms',
    # method='gaussian'); 'nms' keeps plain greedy for ablations
    nms_type: str = 'soft_nms'
    soft_nms_sigma: float = 0.5
    pull_weight: float = 0.10
    push_weight: float = 0.10
    offset_weight: float = 1.0
    compute_dtype: Any = jnp.float32

    def __post_init__(self):
        self.preprocessor = Preprocessor()
        self.net = CornerNetNet(
            num_classes=self.num_classes, num_stacks=self.num_stacks,
            stage_channels=self.stage_channels,
            stage_blocks=self.stage_blocks,
            downsample_times=self.downsample_times,
            compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.loss_and_state_jit = jax.jit(self.loss_and_state)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def _nms(self, boxes, scores, labels, valid_mask):
        if self.nms_type == 'soft_nms':
            from ...ops import soft_nms_select
            return soft_nms_select(
                boxes, scores, labels, self.max_per_img,
                iou_threshold=self.nms_iou, sigma=self.soft_nms_sigma,
                method='gaussian', valid_mask=valid_mask)
        return nms_select(boxes, scores, labels, self.nms_iou,
                          self.max_per_img, valid_mask=valid_mask)

    def init(self, rng, image_shape=(128, 128), batch_size=1):
        dummy = jnp.zeros((batch_size,) + tuple(image_shape) + (3,),
                          jnp.uint8)
        return jax.jit(self.net.init)(rng, self.preprocessor(dummy))

    def forward_raw(self, variables, images):
        return self.net.apply(variables, self.preprocessor(images))

    def loss_and_state(self, variables, batch):
        images = batch['images']
        outs, new_state = self.net.apply(
            variables, self.preprocessor(images), train=True,
            mutable=['batch_stats'])
        gt = batch['gt']
        b, ih, iw = images.shape[0], images.shape[1], images.shape[2]
        fh, fw = outs[0]['tl_heat'].shape[1:3]
        ratio = jnp.asarray([fw / iw, fh / ih], jnp.float32)

        tgt = jax.vmap(lambda gb, gl, gm: render_corner_targets(
            gb, gl, gm, (fh, fw), self.num_classes, ratio))(
            gt.bboxes, gt.labels, gt.mask)
        # reference avg_factor: number of exact-1 heatmap peaks (:609-615)
        avg_tl = jnp.maximum(
            (tgt['tl_heat'] == 1.0).sum().astype(jnp.float32), 1.0)
        avg_br = jnp.maximum(
            (tgt['br_heat'] == 1.0).sum().astype(jnp.float32), 1.0)
        avg_off = jnp.maximum(tgt['tl_w'].sum() + tgt['br_w'].sum(), 1.0)

        losses = dict(loss_heatmap=0.0, loss_pull=0.0, loss_push=0.0,
                      loss_offset=0.0)
        for out in outs:  # intermediate supervision sums stacks (:586-594)
            tl_h = out['tl_heat'].astype(jnp.float32)
            br_h = out['br_heat'].astype(jnp.float32)
            lh = gaussian_focal_loss(
                jax.nn.sigmoid(tl_h), tgt['tl_heat'], alpha=2.0, gamma=4.0,
                reduction='none').sum() / avg_tl
            lh = lh + gaussian_focal_loss(
                jax.nn.sigmoid(br_h), tgt['br_heat'], alpha=2.0, gamma=4.0,
                reduction='none').sum() / avg_br
            losses['loss_heatmap'] += lh / 2.0

            # embeddings at gt corner coords
            def gather(emb, xy):
                return emb[xy[:, 1], xy[:, 0], 0]
            tl_e = jax.vmap(gather)(out['tl_emb'].astype(jnp.float32),
                                    tgt['tl_xy'])
            br_e = jax.vmap(gather)(out['br_emb'].astype(jnp.float32),
                                    tgt['br_xy'])
            pulls, pushes = jax.vmap(
                lambda a, c, m: associative_embedding_loss(
                    a, c, m, self.pull_weight, self.push_weight))(
                tl_e, br_e, gt.mask)
            losses['loss_pull'] += pulls.mean()
            losses['loss_push'] += pushes.mean()

            lo = (smooth_l1_loss(out['tl_off'].astype(jnp.float32),
                                 tgt['tl_off'], beta=1.0,
                                 reduction='none') *
                  tgt['tl_w']).sum() + \
                 (smooth_l1_loss(out['br_off'].astype(jnp.float32),
                                 tgt['br_off'], beta=1.0,
                                 reduction='none') *
                  tgt['br_w']).sum()
            losses['loss_offset'] += self.offset_weight * lo / avg_off
        return losses, new_state

    def loss(self, variables, batch):
        return self.loss_and_state(variables, batch)[0]

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        outs = self.forward_raw(variables, images)
        out = outs[-1]  # only the last stack predicts (:715-738)
        ih, iw = images.shape[1], images.shape[2]
        fh, fw = out['tl_heat'].shape[1:3]
        k = self.corner_topk

        def single(tl_h, br_h, tl_e, tl_o, br_e, br_o, img_shape,
                   scale_factor):
            tl_scores = local_maximum(jax.nn.sigmoid(
                tl_h.astype(jnp.float32)))
            br_scores = local_maximum(jax.nn.sigmoid(
                br_h.astype(jnp.float32)))

            def topk_corners(scores, emb, off):
                flat = scores.transpose(2, 0, 1).reshape(-1)  # (C*H*W)
                s, idx = jax.lax.top_k(flat, k)
                cls = idx // (fh * fw)
                rem = idx % (fh * fw)
                yy = rem // fw
                xx = rem % fw
                ox = off[yy, xx, 0]
                oy = off[yy, xx, 1]
                e = emb[yy, xx, 0]
                return s, cls, xx.astype(jnp.float32) + ox, \
                    yy.astype(jnp.float32) + oy, e

            tls, tlc, tlx, tly, tle = topk_corners(
                tl_scores, tl_e.astype(jnp.float32),
                tl_o.astype(jnp.float32))
            brs, brc, brx, bry, bre = topk_corners(
                br_scores, br_e.astype(jnp.float32),
                br_o.astype(jnp.float32))

            # (K, K) pair grid: tl index i, br index j
            score = (tls[:, None] + brs[None, :]) / 2.0
            same_cls = tlc[:, None] == brc[None, :]
            geom_ok = (brx[None, :] > tlx[:, None]) & \
                      (bry[None, :] > tly[:, None])
            dist_ok = jnp.abs(tle[:, None] - bre[None, :]) <= \
                self.distance_threshold
            valid = same_cls & geom_ok & dist_ok
            score = jnp.where(valid, score, -1.0)

            # feature -> input image coords
            rx = iw / fw
            ry = ih / fh
            boxes = jnp.stack(
                [jnp.broadcast_to(tlx[:, None] * rx, (k, k)),
                 jnp.broadcast_to(tly[:, None] * ry, (k, k)),
                 jnp.broadcast_to(brx[None, :] * rx, (k, k)),
                 jnp.broadcast_to(bry[None, :] * ry, (k, k))],
                axis=-1).reshape(-1, 4)
            scores = score.reshape(-1)
            labels = jnp.broadcast_to(tlc[:, None], (k, k)).reshape(-1)
            vmask = (scores > self.score_thr)
            if rescale:
                boxes = boxes * jnp.stack(
                    [1.0 / scale_factor[0], 1.0 / scale_factor[1],
                     1.0 / scale_factor[0], 1.0 / scale_factor[1]])[None]
            ob, os_, ol, om = self._nms(boxes, scores, labels, vmask)
            return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

        meta = batch['meta']
        return jax.vmap(single)(
            out['tl_heat'], out['br_heat'], out['tl_emb'], out['tl_off'],
            out['br_emb'], out['br_off'], meta.img_shape, meta.scale_factor)
