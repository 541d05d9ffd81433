"""More head-family numerical parity vs in-test torch oracles (round-3).

Continues tests/test_head_loss_oracle.py into set-prediction and
keypoint-style families:

- DETR: the complete set-loss protocol — softmax-prob match costs
  (cls 1.0 / L1 5.0 / GIoU 2.0), exact Hungarian solve, CE with
  background class weight 0.1 normalized by the weight sum
  (detr_head.py loss_by_feat_single: cls_avg_factor = num_pos +
  num_neg * bg_cls_weight), L1/GIoU by num_pos — including the aux
  decoder layers.
- CenterNet: dense gaussian target rendering vs a line-faithful port
  of gaussian_target.py (gaussian_radius 3-case closed form,
  gen_gaussian_target max-composite, wh/offset at the int center,
  heatmap==1 avg_factor) — centernet_head.py get_targets semantics.
- SSD: MaxIoU (0.5/0.5/0., low-quality on) assignment + softmax CE with
  3:1 hard-negative mining + SmoothL1(beta=1) on encoded deltas,
  normalized by total positives (ssd_head.py loss_by_feat_single).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from erd_tpu.structures.det_sample import GTInstances
from tests.test_head_loss_oracle import _pad_gt, _rand_gt, t_max_iou_assign


# ---------------------------------------------------------------------------
# DETR set loss
# ---------------------------------------------------------------------------
def t_giou_pairwise(a, b, eps=1e-6):
    """(N, 4) x (M, 4) GIoU matrix."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None] - inter + eps
    elt = torch.min(a[:, None, :2], b[None, :, :2])
    erb = torch.max(a[:, None, 2:], b[None, :, 2:])
    ewh = (erb - elt).clamp(min=0)
    hull = ewh[..., 0] * ewh[..., 1] + eps
    return inter / union - (hull - union) / hull


def t_detr_layer_loss(cls, boxes, gt_list, canvas_hw, num_classes,
                      bg_w=0.1):
    """One decoder layer's loss over the batch (detr_head.py
    loss_by_feat_single + HungarianAssigner semantics)."""
    from scipy.optimize import linear_sum_assignment
    ch, cw = canvas_hw
    norm = torch.tensor([cw, ch, cw, ch], dtype=torch.float32)
    B, Q = cls.shape[:2]
    total_pos = 0
    ce_sum = torch.zeros(())
    w_sum = torch.zeros(())
    l1_sum = torch.zeros(())
    giou_sum = torch.zeros(())
    for i in range(B):
        gb, gl = gt_list[i]
        gb = torch.tensor(gb) / norm
        gl = torch.tensor(gl)
        g = len(gl)
        total_pos += g
        labels = torch.full((Q,), num_classes, dtype=torch.long)
        tgt_cxcywh = torch.zeros((Q, 4))
        tgt_xyxy = torch.zeros((Q, 4))
        matched = torch.zeros(Q, dtype=torch.bool)
        if g:
            prob = torch.softmax(cls[i], -1)
            cost_cls = -prob[:, gl]
            gt_cxcywh = torch.stack(
                [(gb[:, 0] + gb[:, 2]) / 2, (gb[:, 1] + gb[:, 3]) / 2,
                 gb[:, 2] - gb[:, 0], gb[:, 3] - gb[:, 1]], -1)
            cost_l1 = torch.cdist(boxes[i], gt_cxcywh, p=1)
            bx = boxes[i]
            bxyxy = torch.stack(
                [bx[:, 0] - bx[:, 2] / 2, bx[:, 1] - bx[:, 3] / 2,
                 bx[:, 0] + bx[:, 2] / 2, bx[:, 1] + bx[:, 3] / 2], -1)
            cost = 1.0 * cost_cls + 5.0 * cost_l1 + \
                2.0 * (-t_giou_pairwise(bxyxy, gb))
            rows, cols = linear_sum_assignment(cost.detach().numpy())
            for r, c in zip(rows, cols):
                labels[r] = gl[c]
                tgt_cxcywh[r] = gt_cxcywh[c]
                tgt_xyxy[r] = gb[c]
                matched[r] = True
        ce = torch.nn.functional.cross_entropy(cls[i], labels,
                                               reduction='none')
        w = torch.where(labels == num_classes, torch.tensor(bg_w),
                        torch.tensor(1.0))
        ce_sum = ce_sum + (ce * w).sum()
        w_sum = w_sum + w.sum()
        l1_sum = l1_sum + (boxes[i][matched] -
                           tgt_cxcywh[matched]).abs().sum()
        bx = boxes[i][matched]
        bxyxy = torch.stack(
            [bx[:, 0] - bx[:, 2] / 2, bx[:, 1] - bx[:, 3] / 2,
             bx[:, 0] + bx[:, 2] / 2, bx[:, 1] + bx[:, 3] / 2], -1)
        if matched.any():
            giou_d = torch.diag(t_giou_pairwise(bxyxy, tgt_xyxy[matched]))
            giou_sum = giou_sum + (1 - giou_d).sum()
    num_pos = max(float(total_pos), 1.0)
    return dict(loss_cls=float(ce_sum / w_sum),
                loss_bbox=float(5.0 * l1_sum / num_pos),
                loss_giou=float(2.0 * giou_sum / num_pos))


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_detr_set_loss_parity(seed):
    from erd_tpu.models.heads.detr_head import detr_loss
    rng = np.random.RandomState(seed)
    h, w = 64, 96
    L, B, Q, C = 2, 2, 12, 4
    gts = [_rand_gt(rng, rng.randint(1, 5), h, w) for _ in range(B)]
    if seed == 2:
        gts[1] = (np.zeros((0, 4), np.float32), np.zeros(0, np.int64))
    gt = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[_pad_gt(b, l) for b, l in gts])

    cls = rng.randn(L, B, Q, C + 1).astype(np.float32)
    # normalized cxcywh in (0, 1), wh small enough to stay in-canvas
    cxy = rng.uniform(0.2, 0.8, (L, B, Q, 2))
    wh = rng.uniform(0.05, 0.3, (L, B, Q, 2))
    boxes = np.concatenate([cxy, wh], -1).astype(np.float32)

    got = {k: float(v) for k, v in detr_loss(
        jnp.asarray(cls), jnp.asarray(boxes), gt, (h, w),
        num_classes=C).items()}

    for lyr in range(L):
        want = t_detr_layer_loss(torch.tensor(cls[lyr]),
                                 torch.tensor(boxes[lyr]), gts, (h, w), C)
        suffix = '' if lyr == L - 1 else f'_aux{lyr}'
        for k, v in want.items():
            np.testing.assert_allclose(got[k + suffix], v, rtol=3e-4,
                                       atol=1e-6, err_msg=f'{k}{suffix}')


# ---------------------------------------------------------------------------
# CenterNet gaussian targets
# ---------------------------------------------------------------------------
def t_gaussian_radius(det_size, min_overlap):
    """gaussian_target.py:68-189, scalar."""
    height, width = det_size
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(max(b1 ** 2 - 4 * a1 * c1, 0.0))
    r1 = (b1 - sq1) / (2 * a1)
    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(max(b2 ** 2 - 4 * a2 * c2, 0.0))
    r2 = (b2 - sq2) / (2 * a2)
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(max(b3 ** 2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / (2 * a3)
    return min(r1, r2, r3)


def t_gen_gaussian_target(heatmap, center, radius):
    """gaussian_target.py:9-66: crop-composite a (2r+1)^2 gaussian."""
    diameter = 2 * radius + 1
    sigma = diameter / 6.0
    m = n = radius
    y, x = np.ogrid[-m:m + 1, -n:n + 1]
    g = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    g[g < np.finfo(g.dtype).eps * g.max()] = 0
    x0, y0 = center
    H, W = heatmap.shape
    left, right = min(x0, radius), min(W - x0, radius + 1)
    top, bottom = min(y0, radius), min(H - y0, radius + 1)
    masked = heatmap[y0 - top:y0 + bottom, x0 - left:x0 + right]
    gm = g[radius - top:radius + bottom, radius - left:radius + right]
    np.maximum(masked, gm, out=masked)
    return heatmap


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_centernet_target_rendering_parity(seed):
    from erd_tpu.ops.gaussian import render_center_targets
    rng = np.random.RandomState(seed)
    img_h, img_w = 128, 192
    fh, fw = 32, 48
    C = 3
    n = rng.randint(1, 6)
    boxes, labels = _rand_gt(rng, n, img_h, img_w)
    labels = labels % C
    gt = _pad_gt(boxes, labels)
    ratio = np.asarray([fw / img_w, fh / img_h], np.float32)

    heat, wh, off, weight, avg = jax.jit(
        render_center_targets, static_argnums=(3, 4))(
        gt.bboxes, gt.labels, gt.mask, (fh, fw), C, jnp.asarray(ratio))

    # ---- oracle (centernet_head.py get_targets) ----
    o_heat = np.zeros((C, fh, fw), np.float32)
    o_wh = np.zeros((2, fh, fw), np.float32)
    o_off = np.zeros((2, fh, fw), np.float32)
    o_w = np.zeros((fh, fw), np.float32)
    for k in range(n):
        x1, y1, x2, y2 = boxes[k]
        cx = (x1 + x2) * ratio[0] / 2
        cy = (y1 + y2) * ratio[1] / 2
        cxi, cyi = int(cx), int(cy)
        sw = (x2 - x1) * ratio[0]
        sh = (y2 - y1) * ratio[1]
        radius = max(0, int(t_gaussian_radius((sh, sw), 0.3)))
        t_gen_gaussian_target(o_heat[labels[k]], (cxi, cyi), radius)
        o_wh[0, cyi, cxi] = sw
        o_wh[1, cyi, cxi] = sh
        o_off[0, cyi, cxi] = cx - cxi
        o_off[1, cyi, cxi] = cy - cyi
        o_w[cyi, cxi] = 1.0

    np.testing.assert_allclose(np.asarray(heat),
                               o_heat.transpose(1, 2, 0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wh), o_wh.transpose(1, 2, 0),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(off), o_off.transpose(1, 2, 0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(weight)[..., 0], o_w, atol=0)
    np.testing.assert_allclose(float(avg),
                               max(float((o_heat == 1.0).sum()), 1.0))
    assert float(avg) >= 1.0


# ---------------------------------------------------------------------------
# SSD: hard-negative-mined CE + SmoothL1
# ---------------------------------------------------------------------------
@pytest.mark.parametrize('seed', [0, 1])
def test_ssd_loss_parity(seed):
    from erd_tpu.models.heads.ssd_head import (SSDAnchorContext, ssd_loss,
                                               ssd_targets)
    from erd_tpu.task.coder import DeltaXYWHBBoxCoder

    rng = np.random.RandomState(seed)
    ctx = SSDAnchorContext.build()
    N = ctx.anchors.shape[0]
    B = 2
    size = 300
    gts = [_rand_gt(rng, rng.randint(1, 4), size, size) for _ in range(B)]
    gt = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[_pad_gt(b, l) for b, l in gts])
    coder = DeltaXYWHBBoxCoder(target_stds=(0.1, 0.1, 0.2, 0.2))
    C = 4
    tgts = ssd_targets(ctx, gt, C, coder)
    assert float(tgts.pos_mask.sum()) > 0

    cls = rng.randn(B, N, C + 1).astype(np.float32)
    reg = (rng.randn(B, N, 4) * 0.2).astype(np.float32)
    got = {k: float(v) for k, v in ssd_loss(
        jnp.asarray(cls), jnp.asarray(reg), tgts, C,
        neg_pos_ratio=3).items()}

    # ---- oracle (ssd_head.py loss_by_feat + loss_by_feat_single) ----
    anchors = torch.tensor(np.asarray(ctx.anchors))
    from erd_tpu.structures.boxes import bbox_overlaps as j_overlaps
    per_img = []
    total_pos = 0
    for boxes, labels in gts:
        ov = torch.tensor(np.asarray(
            j_overlaps(jnp.asarray(boxes), jnp.asarray(ctx.anchors))))
        assigned = t_max_iou_assign(ov, 0.5, 0.5, 0.0)
        # SSD MaxIoUAssigner: neg_iou_thr == pos_iou_thr == 0.5,
        # gt_max_assign_all low-quality matches on
        total_pos += int((assigned > 0).sum())
        per_img.append((assigned, torch.tensor(boxes),
                        torch.tensor(labels)))
    avg = max(float(total_pos), 1.0)
    loss_cls_sum = torch.zeros(())
    loss_bbox_sum = torch.zeros(())
    for i, (assigned, boxes, labels) in enumerate(per_img):
        lab = torch.full((N,), C, dtype=torch.long)
        pos = assigned > 0
        lab[pos] = labels[assigned[pos] - 1]
        ce_all = torch.nn.functional.cross_entropy(
            torch.tensor(cls[i]), lab, reduction='none')
        # ignore-band anchors get zero label weight
        lw = torch.ones(N)
        lw[assigned == -1] = 0.0
        ce_all = ce_all * lw
        num_pos = int(pos.sum())
        num_neg = min(3 * num_pos, N - num_pos)
        neg_ce = ce_all.clone()
        neg_ce[pos] = 0.0
        topk_neg = neg_ce.topk(num_neg)[0]
        loss_cls_sum = loss_cls_sum + (ce_all[pos].sum() +
                                       topk_neg.sum()) / avg
        pa = anchors[pos]
        g = boxes[assigned[pos] - 1]
        pw, ph = pa[:, 2] - pa[:, 0], pa[:, 3] - pa[:, 1]
        px, py = (pa[:, 0] + pa[:, 2]) / 2, (pa[:, 1] + pa[:, 3]) / 2
        gw, gh = g[:, 2] - g[:, 0], g[:, 3] - g[:, 1]
        gx, gy = (g[:, 0] + g[:, 2]) / 2, (g[:, 1] + g[:, 3]) / 2
        t = torch.stack([(gx - px) / pw / 0.1, (gy - py) / ph / 0.1,
                         (gw / pw).log() / 0.2, (gh / ph).log() / 0.2], -1)
        d = (torch.tensor(reg[i])[pos] - t).abs()
        sl1 = torch.where(d < 1.0, 0.5 * d * d, d - 0.5)
        loss_bbox_sum = loss_bbox_sum + sl1.sum() / avg

    np.testing.assert_allclose(got['loss_cls'], float(loss_cls_sum),
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(got['loss_bbox'], float(loss_bbox_sum),
                               rtol=3e-4, atol=1e-6)
