"""Gaussian heatmap target utilities (CenterNet/CornerNet keypoint heads).

Static-shape JAX re-derivations of
/root/reference/mmdet/models/utils/gaussian_target.py: the per-gt
scatter-crop rendering (gen_gaussian_target :32-66) becomes a dense
radius-masked gaussian max-composited with a fori_loop over the padded gt
axis; gaussian_radius (:68-189) is the published CornerNet 3-case
closed form; local-maximum NMS (:190-205) is a 3x3 max-pool equality.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_radius(h, w, min_overlap=0.3):
    """Elementwise 3-case CornerNet radius for boxes of feature-scale h/w."""
    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, 0.0, None))
    r1 = (b1 - sq1) / (2 * a1)

    a2 = 4.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, 0.0, None))
    r2 = (b2 - sq2) / (2 * a2)

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, 0.0, None))
    r3 = (-b3 + sq3) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def render_center_targets(gt_bboxes, gt_labels, gt_mask, feat_hw,
                          num_classes, ratio, min_overlap=0.3):
    """CenterNet targets for ONE image, fully static.

    Args:
        gt_bboxes: (G, 4) xyxy in IMAGE units (padded).
        gt_labels/gt_mask: (G,) padded.
        feat_hw: static (H, W) of the stride-4 map.
        ratio: (2,) (w_ratio, h_ratio) feat/img.
    Returns:
        heatmap (H, W, C), wh (H, W, 2), offset (H, W, 2),
        weight (H, W, 1), avg_factor ().
    """
    fh, fw = feat_hw
    ys = jnp.arange(fh, dtype=jnp.float32)[:, None]
    xs = jnp.arange(fw, dtype=jnp.float32)[None, :]

    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * ratio[0] / 2.0
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * ratio[1] / 2.0
    cxi = cx.astype(jnp.int32)
    cyi = cy.astype(jnp.int32)
    bw = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * ratio[0]
    bh = (gt_bboxes[:, 3] - gt_bboxes[:, 1]) * ratio[1]
    radius = jnp.clip(jnp.floor(gaussian_radius(bh, bw, min_overlap)),
                      0.0, None).astype(jnp.int32)

    heatmap = jnp.zeros((fh, fw, num_classes), jnp.float32)
    wh = jnp.zeros((fh, fw, 2), jnp.float32)
    offset = jnp.zeros((fh, fw, 2), jnp.float32)
    weight = jnp.zeros((fh, fw, 1), jnp.float32)

    def body(j, carry):
        heatmap, wh, offset, weight = carry
        ok = gt_mask[j]
        r = radius[j]
        sigma = (2.0 * r + 1.0) / 6.0
        dy = ys - cyi[j]
        dx = xs - cxi[j]
        g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma + 1e-12))
        inside = (jnp.abs(dy) <= r) & (jnp.abs(dx) <= r)
        g = jnp.where(inside & ok, g, 0.0)
        lab = jnp.clip(gt_labels[j], 0, num_classes - 1)
        heatmap = heatmap.at[:, :, lab].max(g)
        at_center = (ys == cyi[j]) & (xs == cxi[j]) & ok
        wh = jnp.where(at_center[..., None],
                       jnp.stack([bw[j], bh[j]])[None, None], wh)
        offset = jnp.where(
            at_center[..., None],
            jnp.stack([cx[j] - cxi[j], cy[j] - cyi[j]])[None, None],
            offset)
        weight = jnp.where(at_center[..., None], 1.0, weight)
        return heatmap, wh, offset, weight

    heatmap, wh, offset, weight = jax.lax.fori_loop(
        0, gt_bboxes.shape[0], body, (heatmap, wh, offset, weight))
    avg_factor = jnp.maximum((heatmap == 1.0).sum().astype(jnp.float32),
                             1.0)
    return heatmap, wh, offset, weight, avg_factor


def local_maximum(heat, kernel=3):
    """Keep only local maxima (3x3 window), zero elsewhere. (H, W, C)."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (kernel, kernel, 1), (1, 1, 1),
        [(pad, pad), (pad, pad), (0, 0)])
    return jnp.where(hmax == heat, heat, 0.0)
