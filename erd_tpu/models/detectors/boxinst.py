"""BoxInst: box-supervised instance segmentation on CondInst.

Behavioural mirror of /root/reference/mmdet/models/detectors/boxinst.py +
dense_heads/boxinst_head.py + configs/boxinst/*: the CondInst architecture
trained WITHOUT mask annotations —

- *projection loss*: the predicted stride-4 mask's x-projection (max over
  rows) and y-projection (max over columns) take dice losses against the
  gt box's projections (1 inside the box span);
- *pairwise affinity loss*: 8-neighborhood edges (3x3, dilation 2) whose
  LAB color similarity exp(-||ci - cj|| / theta(=2)) exceeds
  ``pairwise_color_thresh``(=0.3) are labelled "same instance"; the loss
  is -log(p_i p_j + (1-p_i)(1-p_j)) averaged over selected edges inside
  the gt box, scaled by a linear warmup (reference warmup 10k iters —
  exposed as ``pairwise_warmup_factor`` since step count lives outside
  the jitted loss).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .condinst import (NUM_PARAMS, CondInstDetector, dynamic_mask_forward)


def rgb_to_lab(rgb):
    """(H, W, 3) in [0, 1] sRGB -> CIELAB (D65)."""
    srgb = jnp.clip(rgb, 0.0, 1.0)
    lin = jnp.where(srgb <= 0.04045, srgb / 12.92,
                    ((srgb + 0.055) / 1.055) ** 2.4)
    m = jnp.asarray([[0.412453, 0.357580, 0.180423],
                     [0.212671, 0.715160, 0.072169],
                     [0.019334, 0.119193, 0.950227]])
    xyz = jnp.einsum('hwc,rc->hwr', lin, m)
    white = jnp.asarray([0.950456, 1.0, 1.088754])
    t = xyz / white

    def f(v):
        return jnp.where(v > 0.008856, jnp.cbrt(v),
                         7.787 * v + 16.0 / 116.0)

    ft = f(t)
    l = 116.0 * ft[..., 1] - 16.0
    a = 500.0 * (ft[..., 0] - ft[..., 1])
    bb = 200.0 * (ft[..., 1] - ft[..., 2])
    return jnp.stack([l, a, bb], axis=-1)


@dataclass
class BoxInstDetector(CondInstDetector):
    pairwise_size: int = 3
    pairwise_dilation: int = 2
    pairwise_color_thresh: float = 0.3
    pairwise_warmup_factor: float = 1.0
    theta: float = 2.0

    def loss(self, variables, batch):
        from ..layers import cast_compute_params
        images = batch['images']
        ctx = self.point_context(images.shape[1:3])
        v = cast_compute_params(variables, self.compute_dtype)
        feats = self.net.apply(v, self.preprocessor(images),
                               method='extract_feat')
        (cls_lvl, reg_lvl, ctr_lvl, prm_lvl) = self.net.apply(
            v, feats, method='head_forward')
        mask_feats = self.net.apply(v, feats, method='mask_forward')
        b = images.shape[0]
        c = self.num_classes
        cls_flat = jnp.concatenate(
            [m.reshape(b, -1, c) for m in cls_lvl], axis=1) \
            .astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(b, -1, 4) for m in reg_lvl], axis=1)
        ctr_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in ctr_lvl], axis=1).astype(jnp.float32)
        prm_flat = jnp.concatenate(
            [m.reshape(b, -1, NUM_PARAMS) for m in prm_lvl], axis=1)

        labels, ltrb_t, pos, gidx = self._targets(ctx, batch['gt'])
        from ...losses import (binary_cross_entropy_with_logits,
                               iou_loss, sigmoid_focal_loss)
        from ...structures import distance2bbox
        from ..heads.fcos_head import centerness_target
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        loss_cls = sigmoid_focal_loss(
            cls_flat.reshape(-1, c), labels.reshape(-1),
            avg_factor=num_pos)
        points = jnp.asarray(ctx.points)[None]
        decoded = distance2bbox(points, reg_flat)
        decoded_t = distance2bbox(points, ltrb_t)
        ctr_t = jnp.where(pos, centerness_target(ltrb_t), 0.0)
        denom = jnp.maximum(ctr_t.sum(), 1e-6)
        lb = iou_loss(decoded.reshape(-1, 4), decoded_t.reshape(-1, 4),
                      mode='log', reduction='none')
        loss_bbox = (lb * ctr_t.reshape(-1)).sum() / denom
        ctr_bce = binary_cross_entropy_with_logits(ctr_flat, ctr_t)
        loss_centerness = (ctr_bce * pos).sum() / num_pos

        # ---- box-supervised mask losses ----
        strides_pt = jnp.asarray(ctx.strides)
        k = self.max_masks_to_train
        gt = batch['gt']
        fh, fw = mask_feats.shape[1:3]
        # stride-4 LAB color image for the pairwise affinity
        img01 = images.astype(jnp.float32) / 255.0
        lab = jax.vmap(rgb_to_lab)(img01)
        lab4 = jax.image.resize(lab, (b, fh * 2, fw * 2, 3),
                                method='bilinear')

        dil = self.pairwise_dilation
        shifts = [(-dil, -dil), (-dil, 0), (-dil, dil), (0, -dil),
                  (0, dil), (dil, -dil), (dil, 0), (dil, dil)]

        def single(prm_i, pos_i, gidx_i, ctr_i, mfeat, lab_i, gt_b, gt_m):
            score = jnp.where(pos_i, ctr_i, -jnp.inf)
            top, idx = jax.lax.top_k(score, k)
            sel_valid = top > -jnp.inf
            params = prm_i[idx]
            pts = jnp.asarray(ctx.points)[idx]
            sts = strides_pt[idx]
            logits = dynamic_mask_forward(params, mfeat, pts, sts,
                                          (fh, fw))      # (k, 2fh, 2fw)
            probs = jax.nn.sigmoid(logits)
            sel_g = gidx_i[idx]
            box = gt_b[sel_g]
            mh, mw = probs.shape[1:3]
            ys = (jnp.arange(mh, dtype=jnp.float32) + 0.5) * 4
            xs = (jnp.arange(mw, dtype=jnp.float32) + 0.5) * 4
            in_x = ((xs[None] >= box[:, 0, None]) &
                    (xs[None] <= box[:, 2, None])).astype(jnp.float32)
            in_y = ((ys[None] >= box[:, 1, None]) &
                    (ys[None] <= box[:, 3, None])).astype(jnp.float32)
            # projection dice losses
            px = probs.max(axis=1)                        # (k, mw)
            py = probs.max(axis=2)                        # (k, mh)

            def dice1d(p, t):
                inter = (p * t).sum(-1)
                return 1 - (2 * inter + 1) / (jnp.square(p).sum(-1) +
                                              jnp.square(t).sum(-1) + 1)

            proj = dice1d(px, in_x) + dice1d(py, in_y)
            w_i = sel_valid & gt_m[sel_g]
            # pairwise affinity inside the box
            box_mask = in_y[:, :, None] * in_x[:, None, :]
            pl = 0.0
            pn = 0.0
            for dy, dx in shifts:
                shifted_lab = jnp.roll(lab_i, (-dy, -dx), axis=(0, 1))
                sim = jnp.exp(-jnp.linalg.norm(
                    lab_i - shifted_lab, axis=-1) / self.theta)
                edge = (sim >= self.pairwise_color_thresh) \
                    .astype(jnp.float32)[None] * box_mask
                pj = jnp.roll(probs, (-dy, -dx), axis=(1, 2))
                p_same = jnp.clip(probs * pj + (1 - probs) * (1 - pj),
                                  1e-6, 1.0)
                pl += (-jnp.log(p_same) * edge).sum((-1, -2))
                pn += edge.sum((-1, -2))
            pairwise = pl / jnp.clip(pn, 1.0, None)
            return ((proj * w_i).sum(), (pairwise * w_i).sum(),
                    w_i.sum().astype(jnp.float32))

        pj, pw, wn = jax.vmap(single)(prm_flat, pos, gidx, ctr_flat,
                                      mask_feats, lab4, gt.bboxes, gt.mask)
        denom_m = jnp.maximum(wn.sum(), 1.0)
        return dict(
            loss_cls=loss_cls, loss_bbox=loss_bbox,
            loss_centerness=loss_centerness,
            loss_project=pj.sum() / denom_m,
            loss_pairwise=self.pairwise_warmup_factor *
            pw.sum() / denom_m)
