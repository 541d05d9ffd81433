"""Grid R-CNN: grid-point localization instead of box regression refine.

Behavioural mirror of /root/reference/mmdet/models/detectors/grid_rcnn.py
+ roi_heads/grid_roi_head.py + mask_heads/grid_head.py (Grid R-CNN Plus
defaults): a grid head of 8 convs (64 channels per grid point, GN) + 2
deconvs predicts 9 grid-point heatmaps (56x56) from the 14x14 RoI
features of (training) sampled positives / (testing) the detected boxes;
targets are ``pos_radius``-disk labels at each grid point of the gt box
projected into the (4x-extended in the reference's jitter sense) RoI
frame; BCE heatmap loss (weight 15 in the reference config scale... the
mmdet default loss_grid is CrossEntropy sum/15-ish — here BCE mean over
disks, weight ``grid_loss_weight``); at test the box edges are re-read
from the confidence-weighted argmax of the edge heatmaps
(grid_head.py get_bboxes).

Simplifications kept explicit: the fused second-order point refinement
of Grid R-CNN Plus is not reproduced (first-order points only), and RoIs
are not jittered.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..layers import cast_compute_params, torch_pad
from .faster_rcnn import FasterRCNNDetector, FasterRCNNNet

GRID = 3          # 3x3 = 9 points
HEAT = 56         # heatmap size
POS_RADIUS = 1


class GridHead(nn.Module):
    num_convs: int = 8
    point_feat: int = 64

    @nn.compact
    def __call__(self, roi_feats):
        """(R, 14, 14, 256) -> (R, 56, 56, 9) heatmap logits."""
        c = self.point_feat * GRID * GRID
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.Conv(c, (3, 3), padding=[torch_pad(3)] * 2,
                        name=f'conv{i}')(x)
            x = nn.GroupNorm(num_groups=GRID * GRID,
                             name=f'gn{i}')(x)
            x = nn.relu(x)
        x = nn.relu(nn.ConvTranspose(c, (4, 4), strides=(2, 2),
                                     padding='SAME', name='deconv1')(x))
        x = nn.ConvTranspose(GRID * GRID, (4, 4), strides=(2, 2),
                             padding='SAME', name='deconv2')(x)
        return x.astype(jnp.float32)


def grid_targets(rois, gt_boxes):
    """Disk targets: (R, 56, 56, 9); grid point g=(gy, gx) at the gt box
    position projected into the roi frame."""
    x1, y1 = rois[:, 0], rois[:, 1]
    w = jnp.clip(rois[:, 2] - rois[:, 0], 1e-6, None)
    h = jnp.clip(rois[:, 3] - rois[:, 1], 1e-6, None)
    ys = jnp.arange(HEAT, dtype=jnp.float32)
    xs = jnp.arange(HEAT, dtype=jnp.float32)
    tgt = []
    for gy in range(GRID):
        for gx in range(GRID):
            px = gt_boxes[:, 0] + (gt_boxes[:, 2] - gt_boxes[:, 0]) * \
                gx / (GRID - 1)
            py = gt_boxes[:, 1] + (gt_boxes[:, 3] - gt_boxes[:, 1]) * \
                gy / (GRID - 1)
            hx = (px - x1) / w * HEAT
            hy = (py - y1) / h * HEAT
            d2 = (xs[None, None, :] - hx[:, None, None]) ** 2 + \
                 (ys[None, :, None] - hy[:, None, None]) ** 2
            tgt.append((d2 <= POS_RADIUS ** 2).astype(jnp.float32))
    return jnp.stack(tgt, axis=-1)


def grid_decode(heatmaps, rois):
    """Confidence-weighted edge fusion (grid_head.py get_bboxes)."""
    r = heatmaps.shape[0]
    probs = jax.nn.sigmoid(heatmaps)                     # (R, 56, 56, 9)
    flat = probs.reshape(r, -1, GRID * GRID)
    conf = flat.max(axis=1)                              # (R, 9)
    idx = flat.argmax(axis=1)
    hy = (idx // HEAT).astype(jnp.float32) + 0.5
    hx = (idx % HEAT).astype(jnp.float32) + 0.5
    x1r, y1r = rois[:, 0], rois[:, 1]
    w = jnp.clip(rois[:, 2] - rois[:, 0], 1e-6, None)
    h = jnp.clip(rois[:, 3] - rois[:, 1], 1e-6, None)
    px = x1r[:, None] + hx / HEAT * w[:, None]           # (R, 9)
    py = y1r[:, None] + hy / HEAT * h[:, None]
    gidx = np.arange(GRID * GRID).reshape(GRID, GRID)  # [gy, gx]
    left = gidx[:, 0]
    right = gidx[:, -1]
    top = gidx[0, :]
    bottom = gidx[-1, :]

    def fuse(cols, coord):
        cw = conf[:, cols]
        return (coord[:, cols] * cw).sum(-1) / \
            jnp.clip(cw.sum(-1), 1e-6, None)

    return jnp.stack([fuse(left, px), fuse(top, py),
                      fuse(right, px), fuse(bottom, py)], axis=-1)


class GridRCNNNet(FasterRCNNNet):

    def setup(self):
        super().setup()
        self.grid_head = GridHead()

    def grid_forward(self, roi_feats):
        return self.grid_head(roi_feats)

    def __call__(self, images):
        out = super().__call__(images)
        g = self.grid_head(jnp.zeros((4, 14, 14, 256), jnp.float32))
        return out + (g,)


@dataclass
class GridRCNNDetector(FasterRCNNDetector):
    grid_loss_weight: float = 1.0

    def __post_init__(self):
        super().__post_init__()
        self.net = GridRCNNNet(num_classes=self.num_classes,
                               depth=self.depth,
                               compute_dtype=self.compute_dtype)
        self.loss_jit = jax.jit(self.loss)
        self.predict_jit = jax.jit(self.predict, static_argnames='rescale')
        self.forward_jit = jax.jit(self.forward_raw)

    def loss(self, variables, batch):
        from ..heads.bbox_head import rcnn_loss, rcnn_sample_single
        from ..heads.rpn_head import rpn_loss, rpn_proposals
        from ...ops.roi_align import multilevel_roi_align
        v = cast_compute_params(variables, self.compute_dtype)
        images = batch['images']
        ctx = self.anchor_context(images.shape[1:3])
        feats, rpn_cls, rpn_reg = self._feats_and_rpn(variables, images)
        b = images.shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in rpn_cls], axis=1).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in rpn_reg], axis=1)
        rng = jax.random.fold_in(jax.random.PRNGKey(0),
                                 batch['meta'].img_id.sum())
        losses = rpn_loss(ctx, cls_flat, reg_flat, batch['gt'],
                          batch['meta'].img_shape, rng, self.rpn_coder,
                          self.rpn_train_cfg)
        prop_boxes, _, prop_mask = rpn_proposals(
            ctx, [jax.lax.stop_gradient(c.astype(jnp.float32))
                  for c in rpn_cls],
            [jax.lax.stop_gradient(r) for r in rpn_reg],
            batch['meta'].img_shape, self.rpn_coder,
            self.proposal_cfg_train)
        rngs = jax.random.split(jax.random.fold_in(rng, 1), b)
        samples = jax.vmap(
            lambda k, p, pm, gb, gl, gm: rcnn_sample_single(
                k, p, pm, gb, gl, gm, self.num_classes, self.rcnn_coder,
                self.rcnn_train_cfg)
        )(rngs, prop_boxes, prop_mask, batch['gt'].bboxes,
          batch['gt'].labels, batch['gt'].mask)
        s = samples.rois.shape[1]
        roi7 = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          samples.rois)
        cls_logits, reg_preds = self.net.apply(
            v, roi7.reshape(b * s, 7, 7, -1), method='roi_forward')
        rcnn_losses, _ = rcnn_loss(cls_logits.astype(jnp.float32),
                                   reg_preds.astype(jnp.float32), samples,
                                   self.num_classes, self.rcnn_train_cfg)
        losses.update(rcnn_losses)
        # ---- grid head on positives ----
        roi14 = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r, out_size=14)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          samples.rois)
        heat = self.net.apply(v, roi14.reshape(b * s, 14, 14, -1)
                              .astype(jnp.float32), method='grid_forward')
        sel_gt = jax.vmap(lambda gb, smp: gb[smp.gt_idx])(
            batch['gt'].bboxes, samples).reshape(b * s, 4)
        tgt = grid_targets(samples.rois.reshape(b * s, 4), sel_gt)
        bce = jax.nn.softplus(-heat) * tgt + jax.nn.softplus(heat) * \
            (1 - tgt)
        is_pos = samples.is_pos.reshape(-1)
        n_pos = jnp.maximum(is_pos.sum(), 1.0)
        losses['loss_grid'] = self.grid_loss_weight * \
            (bce.mean((-1, -2, -3)) * is_pos).sum() / n_pos
        return losses

    def predict(self, variables, batch, rescale=True):
        from ...structures.boxes import scale_boxes
        from ...ops.roi_align import multilevel_roi_align
        res = super().predict(variables, batch, rescale=rescale)
        v = cast_compute_params(variables, self.compute_dtype)
        images = batch['images']
        feats = self.net.apply(v, self.preprocessor(images),
                               method='extract_feat')
        if rescale:
            rois = jax.vmap(scale_boxes)(res.bboxes,
                                         batch['meta'].scale_factor)
        else:
            rois = res.bboxes
        b, d = rois.shape[:2]
        roi14 = jax.vmap(
            lambda f0, f1, f2, f3, r: multilevel_roi_align(
                [f0, f1, f2, f3], r, out_size=14)
        )(feats[0].astype(jnp.float32), feats[1].astype(jnp.float32),
          feats[2].astype(jnp.float32), feats[3].astype(jnp.float32),
          rois)
        heat = self.net.apply(v, roi14.reshape(b * d, 14, 14, -1)
                              .astype(jnp.float32), method='grid_forward')
        refined = grid_decode(heat, rois.reshape(b * d, 4)) \
            .reshape(b, d, 4)
        if rescale:
            refined = jax.vmap(
                lambda bx, sf: scale_boxes(bx, 1.0 / sf))(
                refined, batch['meta'].scale_factor)
        # keep the original box when its grid refinement collapses
        wh_ok = (refined[..., 2] > refined[..., 0]) & \
                (refined[..., 3] > refined[..., 1])
        boxes = jnp.where(wh_ok[..., None], refined, res.bboxes)
        return res.replace(bboxes=boxes)
