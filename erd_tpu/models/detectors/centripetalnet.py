"""CentripetalNet: corner pairing by centripetal shifts.

Behavioural mirror of
/root/reference/mmdet/models/detectors/centripetalnet.py... (the detector
module is CornerNet with dense_heads/centripetal_head.py): the CornerNet
Hourglass + BiCornerPool trunk, but the 1-d associative embeddings are
replaced by (i) a *guiding shift* branch (2ch, corner -> center in
feature cells, SmoothL1 w=0.05) that supplies the offsets of a deformable
*feature adaption* conv before the centripetal branch, and (ii) a
*centripetal shift* branch (2ch, log of the corner-to-center distance,
SmoothL1 w=1 in log space). Decoding pairs top-k tl/br corners whose
shift-predicted centers BOTH fall inside the candidate box's central
region (mu-scaled), replacing the embedding-distance test.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...losses import gaussian_focal_loss, smooth_l1_loss
from ...ops import nms_select
from ...ops.deform_conv import deform_conv2d
from ...ops.gaussian import local_maximum, render_centripetal_targets
from ...structures import DetResults
from .cornernet import (BiCornerPool, CornerHeadBranch, CornerNetDetector,
                        CornerNetNet)
from ..backbones.hourglass import HourglassNet


class FeatureAdaption(nn.Module):
    """3x3 deform conv whose offsets come from the guiding shift."""
    features: int

    @nn.compact
    def __call__(self, x, guiding):
        off = nn.Conv(9 * 2, (1, 1),
                      kernel_init=nn.initializers.zeros,
                      name='offset_conv')(
            jax.lax.stop_gradient(guiding)).astype(jnp.float32)
        b, h, w, _ = off.shape
        offsets = off.reshape(b, h, w, 9, 2)
        weight = self.param('kernel', nn.initializers.normal(0.01),
                            (3, 3, x.shape[-1], self.features),
                            jnp.float32)

        def single(xi, oi):
            return deform_conv2d(xi.astype(jnp.float32), oi[:, :, None],
                                 weight, stride=1, padding=1)

        return nn.relu(jax.vmap(single)(x, offsets))


class CentripetalNetNet(CornerNetNet):

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
            tl_guide = CornerHeadBranch(2, name=f'tl_guide_{i}')(tl)
            br_guide = CornerHeadBranch(2, name=f'br_guide_{i}')(br)
            tl_adapt = FeatureAdaption(256, name=f'tl_adapt_{i}')(
                tl, tl_guide)
            br_adapt = FeatureAdaption(256, name=f'br_adapt_{i}')(
                br, br_guide)
            outs.append(dict(
                tl_heat=CornerHeadBranch(self.num_classes, 0.1,
                                         name=f'tl_heat_{i}')(tl),
                br_heat=CornerHeadBranch(self.num_classes, 0.1,
                                         name=f'br_heat_{i}')(br),
                tl_off=CornerHeadBranch(2, name=f'tl_off_{i}')(tl),
                br_off=CornerHeadBranch(2, name=f'br_off_{i}')(br),
                tl_guide=tl_guide, br_guide=br_guide,
                tl_cent=CornerHeadBranch(2, name=f'tl_cent_{i}')(
                    tl_adapt),
                br_cent=CornerHeadBranch(2, name=f'br_cent_{i}')(
                    br_adapt)))
        return outs


@dataclass
class CentripetalNetDetector(CornerNetDetector):
    guiding_weight: float = 0.05
    centripetal_weight: float = 1.0
    mu: float = 0.3  # central-region half-extent fraction

    def __post_init__(self):
        super().__post_init__()
        self.net = CentripetalNetNet(
            num_classes=self.num_classes, num_stacks=self.num_stacks,
            stage_channels=self.stage_channels,
            stage_blocks=self.stage_blocks,
            downsample_times=self.downsample_times,
            compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.loss_and_state_jit = jax.jit(self.loss_and_state)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def loss_and_state(self, variables, batch):
        images = batch['images']
        outs, new_state = self.net.apply(
            variables, self.preprocessor(images), train=True,
            mutable=['batch_stats'])
        gt = batch['gt']
        b, ih, iw = images.shape[0], images.shape[1], images.shape[2]
        fh, fw = outs[0]['tl_heat'].shape[1:3]
        ratio = jnp.asarray([fw / iw, fh / ih], jnp.float32)
        tgt = jax.vmap(lambda gb, gl, gm: render_centripetal_targets(
            gb, gl, gm, (fh, fw), self.num_classes, ratio))(
            gt.bboxes, gt.labels, gt.mask)
        avg_tl = jnp.maximum(
            (tgt['tl_heat'] == 1.0).sum().astype(jnp.float32), 1.0)
        avg_br = jnp.maximum(
            (tgt['br_heat'] == 1.0).sum().astype(jnp.float32), 1.0)
        avg_off = jnp.maximum(tgt['tl_w'].sum() + tgt['br_w'].sum(), 1.0)

        losses = dict(loss_heatmap=0.0, loss_offset=0.0,
                      loss_guiding=0.0, loss_centripetal=0.0)
        for out in outs:
            lh = gaussian_focal_loss(
                jax.nn.sigmoid(out['tl_heat'].astype(jnp.float32)),
                tgt['tl_heat'], alpha=2.0, gamma=4.0,
                reduction='none').sum() / avg_tl
            lh += gaussian_focal_loss(
                jax.nn.sigmoid(out['br_heat'].astype(jnp.float32)),
                tgt['br_heat'], alpha=2.0, gamma=4.0,
                reduction='none').sum() / avg_br
            losses['loss_heatmap'] += lh / 2.0
            lo = (smooth_l1_loss(out['tl_off'].astype(jnp.float32),
                                 tgt['tl_off'], beta=1.0,
                                 reduction='none') * tgt['tl_w']).sum() + \
                 (smooth_l1_loss(out['br_off'].astype(jnp.float32),
                                 tgt['br_off'], beta=1.0,
                                 reduction='none') * tgt['br_w']).sum()
            losses['loss_offset'] += lo / avg_off
            lg = (smooth_l1_loss(out['tl_guide'].astype(jnp.float32),
                                 tgt['tl_guide'], beta=1.0,
                                 reduction='none') * tgt['tl_w']).sum() + \
                 (smooth_l1_loss(out['br_guide'].astype(jnp.float32),
                                 tgt['br_guide'], beta=1.0,
                                 reduction='none') * tgt['br_w']).sum()
            losses['loss_guiding'] += self.guiding_weight * lg / avg_off
            lc = (smooth_l1_loss(out['tl_cent'].astype(jnp.float32),
                                 tgt['tl_cent'], beta=1.0,
                                 reduction='none') * tgt['tl_w']).sum() + \
                 (smooth_l1_loss(out['br_cent'].astype(jnp.float32),
                                 tgt['br_cent'], beta=1.0,
                                 reduction='none') * tgt['br_w']).sum()
            losses['loss_centripetal'] += \
                self.centripetal_weight * lc / avg_off
        return losses, new_state

    def predict(self, variables, batch, rescale=True):
        images = batch['images']
        outs = self.forward_raw(variables, images)
        out = outs[-1]
        ih, iw = images.shape[1], images.shape[2]
        fh, fw = out['tl_heat'].shape[1:3]
        k = self.corner_topk

        def single(tl_h, br_h, tl_o, br_o, tl_c, br_c, img_shape,
                   scale_factor):
            tl_scores = local_maximum(jax.nn.sigmoid(
                tl_h.astype(jnp.float32)))
            br_scores = local_maximum(jax.nn.sigmoid(
                br_h.astype(jnp.float32)))

            def topk_corners(scores, off, cent):
                flat = scores.transpose(2, 0, 1).reshape(-1)
                s, idx = jax.lax.top_k(flat, k)
                cls = idx // (fh * fw)
                rem = idx % (fh * fw)
                yy = rem // fw
                xx = rem % fw
                x = xx.astype(jnp.float32) + off[yy, xx, 0]
                y = yy.astype(jnp.float32) + off[yy, xx, 1]
                sh = jnp.exp(cent[yy, xx].astype(jnp.float32))
                return s, cls, x, y, sh

            tls, tlc, tlx, tly, tsh = topk_corners(
                tl_scores, tl_o.astype(jnp.float32), tl_c)
            brs, brc, brx, bry, bsh = topk_corners(
                br_scores, br_o.astype(jnp.float32), br_c)

            score = (tls[:, None] + brs[None, :]) / 2.0
            same_cls = tlc[:, None] == brc[None, :]
            geom_ok = (brx[None, :] > tlx[:, None]) & \
                      (bry[None, :] > tly[:, None])
            # shift-predicted centers
            tctx = tlx[:, None] + tsh[:, 0][:, None]
            tcty = tly[:, None] + tsh[:, 1][:, None]
            bctx = brx[None, :] - bsh[:, 0][None, :]
            bcty = bry[None, :] - bsh[:, 1][None, :]
            cx = (tlx[:, None] + brx[None, :]) / 2
            cy = (tly[:, None] + bry[None, :]) / 2
            hw = (brx[None, :] - tlx[:, None]) * self.mu / 2
            hh = (bry[None, :] - tly[:, None]) * self.mu / 2
            in_c = (jnp.abs(tctx - cx) < hw) & (jnp.abs(tcty - cy) < hh) \
                & (jnp.abs(bctx - cx) < hw) & (jnp.abs(bcty - cy) < hh)
            valid = same_cls & geom_ok & in_c
            score = jnp.where(valid, score, -1.0)
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
            vmask = scores > self.score_thr
            if rescale:
                boxes = boxes * jnp.stack(
                    [1.0 / scale_factor[0], 1.0 / scale_factor[1],
                     1.0 / scale_factor[0], 1.0 / scale_factor[1]])[None]
            ob, os_, ol, om = self._nms(boxes, scores, labels,
                                         valid_mask=vmask)
            return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

        meta = batch['meta']
        return jax.vmap(single)(
            out['tl_heat'], out['br_heat'], out['tl_off'], out['br_off'],
            out['tl_cent'], out['br_cent'], meta.img_shape,
            meta.scale_factor)
