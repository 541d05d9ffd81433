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


def render_corner_targets(gt_bboxes, gt_labels, gt_mask, feat_hw,
                          num_classes, ratio, min_overlap=0.3):
    """CornerNet corner targets for ONE image, fully static
    (reference dense_heads/corner_head.py:337-500 without the python loops).

    Args:
        gt_bboxes: (G, 4) xyxy in IMAGE units (padded).
        gt_labels/gt_mask: (G,) padded.
        feat_hw: static (H, W) of the stride-4 corner map.
        ratio: (2,) (w_ratio, h_ratio) = feat/img.
    Returns dict with tl/br heatmaps (H, W, C), offsets (H, W, 2), offset
    weights (H, W, 1), and the integer corner coords (G, 2) [x, y] used to
    gather embeddings for the AE loss.
    """
    fh, fw = feat_hw
    ys = jnp.arange(fh, dtype=jnp.float32)[:, None]
    xs = jnp.arange(fw, dtype=jnp.float32)[None, :]

    sl = gt_bboxes[:, 0] * ratio[0]
    st = gt_bboxes[:, 1] * ratio[1]
    sr = gt_bboxes[:, 2] * ratio[0]
    sb = gt_bboxes[:, 3] * ratio[1]
    li = jnp.minimum(sl, fw - 1).astype(jnp.int32)
    ri = jnp.minimum(sr, fw - 1).astype(jnp.int32)
    ti = jnp.minimum(st, fh - 1).astype(jnp.int32)
    bi = jnp.minimum(sb, fh - 1).astype(jnp.int32)
    bw = jnp.ceil(sr - sl)
    bh = jnp.ceil(sb - st)
    radius = jnp.clip(jnp.floor(gaussian_radius(bh, bw, min_overlap)),
                      0.0, None).astype(jnp.int32)

    tl_heat = jnp.zeros((fh, fw, num_classes), jnp.float32)
    br_heat = jnp.zeros((fh, fw, num_classes), jnp.float32)
    tl_off = jnp.zeros((fh, fw, 2), jnp.float32)
    br_off = jnp.zeros((fh, fw, 2), jnp.float32)
    tl_w = jnp.zeros((fh, fw, 1), jnp.float32)
    br_w = jnp.zeros((fh, fw, 1), jnp.float32)

    def gauss(cx, cy, r):
        sigma = (2.0 * r + 1.0) / 6.0
        dy = ys - cy
        dx = xs - cx
        g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma + 1e-12))
        return jnp.where((jnp.abs(dy) <= r) & (jnp.abs(dx) <= r), g, 0.0)

    def body(j, carry):
        tl_heat, br_heat, tl_off, br_off, tl_w, br_w = carry
        ok = gt_mask[j]
        lab = jnp.clip(gt_labels[j], 0, num_classes - 1)
        r = radius[j]
        g_tl = jnp.where(ok, gauss(li[j], ti[j], r), 0.0)
        g_br = jnp.where(ok, gauss(ri[j], bi[j], r), 0.0)
        tl_heat = tl_heat.at[:, :, lab].max(g_tl)
        br_heat = br_heat.at[:, :, lab].max(g_br)
        at_tl = (ys == ti[j]) & (xs == li[j]) & ok
        at_br = (ys == bi[j]) & (xs == ri[j]) & ok
        tl_off = jnp.where(
            at_tl[..., None],
            jnp.stack([sl[j] - li[j], st[j] - ti[j]])[None, None], tl_off)
        br_off = jnp.where(
            at_br[..., None],
            jnp.stack([sr[j] - ri[j], sb[j] - bi[j]])[None, None], br_off)
        tl_w = jnp.where(at_tl[..., None], 1.0, tl_w)
        br_w = jnp.where(at_br[..., None], 1.0, br_w)
        return tl_heat, br_heat, tl_off, br_off, tl_w, br_w

    tl_heat, br_heat, tl_off, br_off, tl_w, br_w = jax.lax.fori_loop(
        0, gt_bboxes.shape[0], body,
        (tl_heat, br_heat, tl_off, br_off, tl_w, br_w))
    return dict(tl_heat=tl_heat, br_heat=br_heat, tl_off=tl_off,
                br_off=br_off, tl_w=tl_w, br_w=br_w,
                tl_xy=jnp.stack([li, ti], -1),
                br_xy=jnp.stack([ri, bi], -1))


def render_centripetal_targets(gt_bboxes, gt_labels, gt_mask, feat_hw,
                               num_classes, ratio, min_overlap=0.3):
    """CentripetalNet targets: corner heatmaps/offsets plus guiding-shift
    and log centripetal-shift targets at the corner pixels
    (reference dense_heads/corner_head.py get_targets with
    with_guiding_shift/with_centripetal_shift)."""
    base = render_corner_targets(gt_bboxes, gt_labels, gt_mask, feat_hw,
                                 num_classes, ratio, min_overlap)
    fh, fw = feat_hw
    ys = jnp.arange(fh, dtype=jnp.float32)[:, None]
    xs = jnp.arange(fw, dtype=jnp.float32)[None, :]
    sl = gt_bboxes[:, 0] * ratio[0]
    st = gt_bboxes[:, 1] * ratio[1]
    sr = gt_bboxes[:, 2] * ratio[0]
    sb = gt_bboxes[:, 3] * ratio[1]
    scx = (sl + sr) / 2.0
    scy = (st + sb) / 2.0
    li = jnp.minimum(sl, fw - 1).astype(jnp.int32)
    ri = jnp.minimum(sr, fw - 1).astype(jnp.int32)
    ti = jnp.minimum(st, fh - 1).astype(jnp.int32)
    bi = jnp.minimum(sb, fh - 1).astype(jnp.int32)

    zero2 = jnp.zeros((fh, fw, 2), jnp.float32)
    tl_guide, br_guide = zero2, zero2
    tl_cent, br_cent = zero2, zero2

    def body(j, carry):
        tg, bg, tc, bc = carry
        ok = gt_mask[j]
        at_tl = (ys == ti[j]) & (xs == li[j]) & ok
        at_br = (ys == bi[j]) & (xs == ri[j]) & ok
        tg = jnp.where(at_tl[..., None], jnp.stack(
            [scx[j] - li[j], scy[j] - ti[j]])[None, None], tg)
        bg = jnp.where(at_br[..., None], jnp.stack(
            [ri[j] - scx[j], bi[j] - scy[j]])[None, None], bg)
        tc = jnp.where(at_tl[..., None], jnp.log(jnp.clip(jnp.stack(
            [scx[j] - sl[j], scy[j] - st[j]]), 1e-4, None))[None, None],
            tc)
        bc = jnp.where(at_br[..., None], jnp.log(jnp.clip(jnp.stack(
            [sr[j] - scx[j], sb[j] - scy[j]]), 1e-4, None))[None, None],
            bc)
        return tg, bg, tc, bc

    tl_guide, br_guide, tl_cent, br_cent = jax.lax.fori_loop(
        0, gt_bboxes.shape[0], body,
        (tl_guide, br_guide, tl_cent, br_cent))
    base.update(tl_guide=tl_guide, br_guide=br_guide,
                tl_cent=tl_cent, br_cent=br_cent)
    return base
