"""SOLO v1 (vanilla): direct per-cell instance masks.

Behavioural mirror of /root/reference/mmdet/models/detectors/solo.py +
dense_heads/solo_head.py + configs/solo/solo_r50_fpn_1x_coco.py: unlike
SOLOv2's dynamic kernels, each level's mask branch DIRECTLY predicts
S_l^2 mask channels (7 convs with coord channels + 1x1 to S^2) at the
level's own resolution (2x-upsampled), and the cls branch predicts
(S, S, C) on the grid-resized feature. Same scale-range + 0.2
center-region cell assignment, FocalLoss cls + 3x dice mask losses, and
the matrix-NMS decode — all shared with the SOLOv2 port
(solo_targets_single). The per-level positive-pair table gathers the
level's mask channel per pair.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...losses import dice_loss, sigmoid_focal_loss
from ...structures import DetResults
from ..backbones.resnet import ResNet
from ..layers import ConvModule, bias_init_prob, cast_compute_params
from ..necks.fpn import FPN
from ..preprocessor import Preprocessor
from .solov2 import (NUM_GRIDS, SCALE_RANGES, _coord_channels, _resize,
                     paste_crop, solo_targets_single)


class SOLOHeadNet(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 7

    @nn.compact
    def __call__(self, feats):
        lvls = list(feats)
        b = lvls[0].shape[0]
        lvls[0] = _resize(lvls[0], (lvls[0].shape[1] // 2,
                                    lvls[0].shape[2] // 2))
        lvls[4] = _resize(lvls[4], lvls[3].shape[1:3])
        mask_convs = [ConvModule(self.feat_channels, 3, norm='gn',
                                 name=f'mask_conv_{i}')
                      for i in range(self.stacked_convs)]
        cls_convs = [ConvModule(self.feat_channels, 3, norm='gn',
                                name=f'cls_conv_{i}')
                     for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding='SAME',
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init_prob(0.01),
                           name='conv_cls')
        mask_preds, cls_preds = [], []
        for lvl, x in enumerate(lvls):
            s = NUM_GRIDS[lvl]
            h, w = x.shape[1:3]
            coords = _coord_channels(h, w, x.dtype)
            xm = jnp.concatenate(
                [x, jnp.broadcast_to(coords[None], (b, h, w, 2))], -1)
            for conv in mask_convs:
                xm = conv(xm)
            xm = _resize(xm, (h * 2, w * 2))
            mask_preds.append(nn.Conv(
                s * s, (1, 1), kernel_init=nn.initializers.normal(0.01),
                name=f'conv_mask_{lvl}')(xm).astype(jnp.float32))
            xc = _resize(x, (s, s))
            for conv in cls_convs:
                xc = conv(xc)
            cls_preds.append(conv_cls(xc).astype(jnp.float32))
        return mask_preds, cls_preds


class SOLONet(nn.Module):
    num_classes: int
    depth: int = 50
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        feats = ResNet(depth=self.depth, compute_dtype=self.compute_dtype,
                       name='backbone')(images)
        in_ch = tuple(f.shape[-1] for f in feats)
        feats = FPN(in_channels=in_ch, out_channels=256, start_level=0,
                    add_extra_convs='', num_outs=5, name='neck')(feats)
        return SOLOHeadNet(num_classes=self.num_classes,
                           name='mask_head')(feats)


@dataclass
class SOLODetector:
    num_classes: int = 80
    depth: int = 50
    compute_dtype: Any = jnp.float32
    max_pos: int = 64          # positive-pair cap per image PER LEVEL
    nms_pre: int = 500
    score_thr: float = 0.1
    mask_thr: float = 0.5
    max_per_img: int = 100
    preprocessor: Preprocessor = field(default_factory=Preprocessor)

    def __post_init__(self):
        self.net = SOLONet(num_classes=self.num_classes, depth=self.depth,
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

    def loss(self, variables, batch):
        images = batch['images']
        mask_lvl, cls_lvl = self.forward_raw(variables, images)
        gt = batch['gt']
        assert gt.masks is not None, 'SOLO needs gt mask crops'
        b = images.shape[0]
        total_cls = 0.0
        total_mask = 0.0
        total_cells = 0.0
        total_pairs = 0.0
        cell_off = 0
        for lvl in range(len(NUM_GRIDS)):
            s = NUM_GRIDS[lvl]
            mh, mw = mask_lvl[lvl].shape[1:3]
            stride = images.shape[1] / mh

            def single(mask_p, cls_s, gt_b, gt_l, gt_m, gt_crops,
                       lvl=lvl, s=s, mh=mh, mw=mw, stride=stride):
                labels, pair_cell, pair_valid, tgt = solo_targets_single(
                    gt_b, gt_l, gt_m, gt_crops, mh, mw, stride,
                    self.num_classes, self.max_pos, levels=(lvl,))
                l_cls = sigmoid_focal_loss(
                    cls_s.reshape(-1, self.num_classes), labels,
                    reduction='sum')
                mp = mask_p.reshape(mh * mw, s * s)[:, :].T  # (S^2, h*w)
                sel = jax.nn.sigmoid(mp[pair_cell].reshape(
                    self.max_pos, mh, mw))
                d = dice_loss(sel.reshape(self.max_pos, -1),
                              tgt.reshape(self.max_pos, -1),
                              activate=False, reduction='none')
                n_cells = (labels < self.num_classes).sum()
                return (l_cls, (d * pair_valid).sum(),
                        n_cells.astype(jnp.float32),
                        pair_valid.sum().astype(jnp.float32))

            lc, lm, nc, npair = jax.vmap(single)(
                mask_lvl[lvl], cls_lvl[lvl], gt.bboxes, gt.labels,
                gt.mask, gt.masks)
            total_cls += lc.sum()
            total_mask += lm.sum()
            total_cells += nc.sum()
            total_pairs += npair.sum()
        return {
            'loss_cls': total_cls / (total_cells + 1.0),
            'loss_mask': 3.0 * total_mask /
                         jnp.maximum(total_pairs, 1.0),
        }

    def predict(self, variables, batch, rescale=True, crop_size=28):
        images = batch['images']
        mask_lvl, cls_lvl = self.forward_raw(variables, images)
        b = images.shape[0]
        # common stride-4 frame for cross-level NMS
        fh = max(m.shape[1] for m in mask_lvl)
        fw = max(m.shape[2] for m in mask_lvl)
        cls_all = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_lvl], axis=1)
        masks_all = jnp.concatenate([
            jax.image.resize(
                m.transpose(0, 3, 1, 2), (b, m.shape[-1], fh, fw),
                method='bilinear')
            for m in mask_lvl], axis=1)                    # (B, sumS2, fh, fw)

        from ...ops import matrix_nms
        from ...structures.boxes import scale_boxes

        def single(cls_s, masks_s, scale_factor):
            probs = jax.nn.sigmoid(cls_s)
            best = probs.max(axis=1)
            lab = probs.argmax(axis=1).astype(jnp.int32)
            valid = best > self.score_thr
            k = min(self.nms_pre, best.shape[0])
            score, idx = jax.lax.top_k(jnp.where(valid, best, 0.0), k)
            mpred = jax.nn.sigmoid(masks_s[idx])
            binm = mpred > self.mask_thr
            area = binm.sum(axis=(1, 2)).astype(jnp.float32)
            ok = (score > 0) & (area > 1)
            maskness = jnp.where(
                ok, (mpred * binm).sum(axis=(1, 2)) /
                jnp.maximum(area, 1e-6), 0.0)
            score = score * maskness
            mflat = binm.reshape(k, -1).astype(jnp.float32)
            inter = mflat @ mflat.T
            union = area[:, None] + area[None, :] - inter
            iou = inter / jnp.clip(union, 1.0, None)
            lab_k = lab[idx]
            same = lab_k[:, None] == lab_k[None, :]
            decayed = _matrix_decay(score, iou, same)
            d = min(self.max_per_img, k)
            fs, keep_idx = jax.lax.top_k(decayed, d)
            sel = binm[keep_idx]
            ys = jnp.arange(fh, dtype=jnp.float32) * 4
            xs = jnp.arange(fw, dtype=jnp.float32) * 4
            big = 1e8
            x1 = jnp.where(sel, xs[None, None, :], big).min((-1, -2))
            y1 = jnp.where(sel, ys[None, :, None], big).min((-1, -2))
            x2 = jnp.where(sel, xs[None, None, :], -big).max((-1, -2))
            y2 = jnp.where(sel, ys[None, :, None], -big).max((-1, -2))
            empty = sel.sum((-1, -2)) == 0
            boxes = jnp.where(empty[:, None], 0.0,
                              jnp.stack([x1, y1, x2 + 4, y2 + 4], -1))
            if rescale:
                boxes = scale_boxes(boxes, 1.0 / scale_factor)
            return (DetResults(bboxes=boxes, scores=fs,
                               labels=lab_k[keep_idx],
                               mask=(fs > self.score_thr) & ~empty),
                    mpred[keep_idx])

        return jax.vmap(single)(cls_all, masks_all,
                                batch['meta'].scale_factor)


def _matrix_decay(scores, iou, same_class, sigma=2.0):
    """Gaussian matrix-NMS decay (matrix_nms semantics on mask IoU)."""
    n = scores.shape[0]
    higher = scores[None, :] > scores[:, None]
    decay_iou = jnp.where(higher & same_class, iou.T, 0.0)
    comp = jnp.where(same_class, decay_iou.max(axis=1, keepdims=True), 0.0)
    decay = jnp.exp(-(decay_iou ** 2 - comp ** 2) * sigma).min(axis=1)
    return scores * decay
