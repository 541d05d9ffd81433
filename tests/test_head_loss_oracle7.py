"""Head-family numerical parity vs in-test torch oracles (round-4, set 7).

- SABL RetinaNet: the full side-aware-boundary-localization protocol —
  ApproxMaxIoUAssigner (approx_max_iou_assigner.py:126-141: square priors
  scored by max IoU over their octave's 9 approx anchors, then MaxIoU
  thresholding pos 0.5 / neg 0.4 with gt_max_assign_all forcing),
  bbox2bucket encoding (bucketing_bbox_coder.py:162-281: per-side nearest
  bucket one-hot + top-2 offset targets gated by offset_upperbound,
  cls_ignore_neighbor), FocalLoss averaged by the PseudoSampler pos+neg
  count, sigmoid-CE on bucket labels (avg*4*side, w=1.5) and SmoothL1
  beta=1/9 on offsets (avg*4*offset_topk, w=1.5)
  (sabl_retina_head.py:464-491).
- bucket2bbox decode parity incl. bucketing-guided rescoring
  (bucketing_bbox_coder.py:284-365).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.test_head_loss_oracle import _pad_gt, _rand_gt, t_focal_loss


# ---------------------------------------------------------------------------
# torch oracle: bucketing coder (line-faithful bbox2bucket / bucket2bbox)
# ---------------------------------------------------------------------------
def t_bbox_rescale(b, s):
    cx = (b[:, 0] + b[:, 2]) * 0.5
    cy = (b[:, 1] + b[:, 3]) * 0.5
    w = (b[:, 2] - b[:, 0]) * s
    h = (b[:, 3] - b[:, 1]) * s
    return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def t_buckets(proposals, num_buckets, scale_factor):
    p = t_bbox_rescale(proposals, scale_factor)
    side = int(math.ceil(num_buckets / 2.0))
    pw = p[:, 2] - p[:, 0]
    ph = p[:, 3] - p[:, 1]
    bw = pw / num_buckets
    bh = ph / num_buckets
    steps = (0.5 + torch.arange(side).float())[None, :]
    l_b = p[:, 0:1] + steps * bw[:, None]
    r_b = p[:, 2:3] - steps * bw[:, None]
    t_b = p[:, 1:2] + steps * bh[:, None]
    d_b = p[:, 3:4] - steps * bh[:, None]
    return bw, bh, l_b, r_b, t_b, d_b


def t_bbox2bucket(proposals, gt, num_buckets=14, scale_factor=3.0,
                  offset_topk=2, offset_upperbound=1.0,
                  cls_ignore_neighbor=True):
    bw, bh, l_b, r_b, t_b, d_b = t_buckets(proposals, num_buckets,
                                           scale_factor)
    l_off = (l_b - gt[:, 0:1]) / bw[:, None]
    r_off = (r_b - gt[:, 2:3]) / bw[:, None]
    t_off = (t_b - gt[:, 1:2]) / bh[:, None]
    d_off = (d_b - gt[:, 3:4]) / bh[:, None]
    n = proposals.size(0)
    inds = torch.arange(n)
    offs = torch.cat([l_off, r_off, t_off, d_off], -1)
    ows, labels0 = [], []
    for o in (l_off, r_off, t_off, d_off):
        topv, topi = o.abs().topk(offset_topk, dim=1, largest=False,
                                  sorted=True)
        w = torch.zeros_like(o)
        for k in range(offset_topk):
            w[inds, topi[:, k]] = 1.0 if k == 0 else \
                (topv[:, k] < offset_upperbound).float()
        ows.append(w)
        labels0.append(topi[:, 0])
    ow = torch.cat(ows, -1)
    side = l_b.size(1)
    lab = torch.cat([F.one_hot(i, side).float() for i in labels0], -1)
    cw = torch.cat([(o.abs() < 1).float()
                    for o in (l_off, r_off, t_off, d_off)], -1)
    if cls_ignore_neighbor:
        cw = (~((cw == 1) & (lab == 0))).float()
    else:
        cw = torch.ones_like(cw)
    return offs, ow, lab, cw


def t_bucket2bbox(proposals, cls_preds, offset_preds, num_buckets=14,
                  scale_factor=3.0, max_shape=None):
    side = int(math.ceil(num_buckets / 2.0))
    cls2 = cls_preds.view(-1, side)
    off2 = offset_preds.view(-1, side)
    scores = F.softmax(cls2, dim=1)
    topk, toplab = scores.topk(2, dim=1)
    p = t_bbox_rescale(proposals, scale_factor)
    bw = (p[:, 2] - p[:, 0]) / num_buckets
    bh = (p[:, 3] - p[:, 1]) / num_buckets
    il, ir, it, idn = (toplab[0::4, 0], toplab[1::4, 0], toplab[2::4, 0],
                       toplab[3::4, 0])
    l_b = p[:, 0] + (0.5 + il.float()) * bw
    r_b = p[:, 2] - (0.5 + ir.float()) * bw
    t_b = p[:, 1] + (0.5 + it.float()) * bh
    d_b = p[:, 3] - (0.5 + idn.float()) * bh
    offs = offset_preds.view(-1, 4, side)
    inds = torch.arange(proposals.size(0))
    x1 = l_b - offs[:, 0, :][inds, il] * bw
    x2 = r_b - offs[:, 1, :][inds, ir] * bw
    y1 = t_b - offs[:, 2, :][inds, it] * bh
    y2 = d_b - offs[:, 3, :][inds, idn] * bh
    if max_shape is not None:
        x1 = x1.clamp(0, max_shape[1] - 1)
        x2 = x2.clamp(0, max_shape[1] - 1)
        y1 = y1.clamp(0, max_shape[0] - 1)
        y2 = y2.clamp(0, max_shape[0] - 1)
    boxes = torch.stack([x1, y1, x2, y2], -1)
    conf = topk[:, 0] + topk[:, 1] * \
        ((toplab[:, 0] - toplab[:, 1]).abs() == 1).float()
    return boxes, conf.view(-1, 4).mean(dim=1)


def t_pairwise_iou(a, b, eps=1e-6):
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None] - inter + eps)


def t_approx_max_iou_assign(squares, approxs, gb, pos_thr=0.5, neg_thr=0.4,
                            min_pos_iou=0.0):
    """Returns (assigned gt 0-based, -1 neg, -2 ignore) per square."""
    n = squares.size(0)
    a = approxs.size(0) // n
    ov = t_pairwise_iou(approxs, gb).view(n, a, -1).max(dim=1)[0]  # (N, G)
    maxov, arg = ov.max(dim=1)
    assigned = torch.full((n,), -1, dtype=torch.long)
    assigned[(maxov >= neg_thr) & (maxov < pos_thr)] = -2
    pos = maxov >= pos_thr
    assigned[pos] = arg[pos]
    # gt_max_assign_all forcing, gts in index order
    gt_best = ov.max(dim=0)[0]
    for j in range(gb.size(0)):
        if gt_best[j] >= min_pos_iou:
            assigned[ov[:, j] == gt_best[j]] = j
    return assigned


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_sabl_loss_parity(seed):
    from erd_tpu.models.heads.gfl_head import AnchorContext
    from erd_tpu.models.heads.sabl_retina_head import (
        sabl_approx_generator, sabl_loss, sabl_square_generator,
        sabl_targets)
    from erd_tpu.task.bucketing import BucketingBBoxCoder

    h, w, C, B = 64, 96, 5, 2
    sq_ctx = AnchorContext.build((h, w), sabl_square_generator())
    ap_ctx = AnchorContext.build((h, w), sabl_approx_generator())
    N = sq_ctx.anchors.shape[0]
    side = 7
    rng = np.random.RandomState(seed + 3)
    gts = [_rand_gt(rng, rng.randint(1, 4), h, w) for _ in range(B)]
    if seed == 1:
        gts[1] = (np.zeros((0, 4), np.float32), np.zeros(0, np.int64))
    gt = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[_pad_gt(b, l) for b, l in gts])

    cls = rng.randn(B, N, C).astype(np.float32)
    bcls = rng.randn(B, N, 4 * side).astype(np.float32)
    breg = rng.randn(B, N, 4 * side).astype(np.float32)

    coder = BucketingBBoxCoder()
    tg = sabl_targets(sq_ctx.anchors, ap_ctx.anchors, gt, C, coder)
    got = {k: float(v) for k, v in sabl_loss(
        jnp.asarray(cls), jnp.asarray(bcls), jnp.asarray(breg),
        tg, coder).items()}

    # ---- oracle ----
    t_sq = torch.tensor(sq_ctx.anchors)
    t_ap = torch.tensor(ap_ctx.anchors)
    avg = 0.0
    per_img = []
    for i in range(B):
        gb_np, gl_np = gts[i]
        if len(gl_np) == 0:
            assigned = torch.full((N,), -1, dtype=torch.long)
        else:
            assigned = t_approx_max_iou_assign(t_sq, t_ap,
                                               torch.tensor(gb_np))
        avg += float((assigned != -2).sum())
        per_img.append(assigned)
    avg = max(avg, 1.0)

    cls_sum = torch.zeros(())
    bcls_sum = torch.zeros(())
    breg_sum = torch.zeros(())
    for i in range(B):
        gb_np, gl_np = gts[i]
        assigned = per_img[i]
        pos = assigned >= 0
        labels = torch.full((N,), C, dtype=torch.long)
        if pos.any():
            labels[pos] = torch.tensor(gl_np)[assigned[pos]]
        lw = (assigned != -2).float()
        cls_sum = cls_sum + t_focal_loss(torch.tensor(cls[i]), labels, C,
                                         weight=lw, avg_factor=1.0)
        if pos.any():
            offs, ow, lab, cw = t_bbox2bucket(
                t_sq[pos], torch.tensor(gb_np)[assigned[pos]])
            bp = torch.tensor(bcls[i])[pos]
            bce = F.binary_cross_entropy_with_logits(bp, lab,
                                                     reduction='none')
            bcls_sum = bcls_sum + (bce * cw).sum()
            rp = torch.tensor(breg[i])[pos]
            beta = 1.0 / 9.0
            d = (rp - offs).abs()
            sl1 = torch.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
            breg_sum = breg_sum + (sl1 * ow).sum()

    np.testing.assert_allclose(got['loss_cls'], float(cls_sum) / avg,
                               rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(got['loss_bbox_cls'],
                               1.5 * float(bcls_sum) / (avg * 4 * side),
                               rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(got['loss_bbox_reg'],
                               1.5 * float(breg_sum) / (avg * 4 * 2),
                               rtol=5e-4, atol=1e-7)


@pytest.mark.parametrize('seed', [0, 1])
def test_bucket_decode_parity(seed):
    from erd_tpu.task.bucketing import bucket_decode

    rng = np.random.RandomState(seed)
    n, side = 40, 7
    x1 = rng.uniform(0, 60, n)
    y1 = rng.uniform(0, 40, n)
    props = np.stack([x1, y1, x1 + rng.uniform(8, 40, n),
                      y1 + rng.uniform(8, 30, n)], -1).astype(np.float32)
    clsp = rng.randn(n, 4 * side).astype(np.float32)
    offp = rng.randn(n, 4 * side).astype(np.float32) * 0.3
    boxes, conf = bucket_decode(jnp.asarray(props), jnp.asarray(clsp),
                                jnp.asarray(offp), num_buckets=14,
                                scale_factor=3.0, max_shape=(64, 96))
    t_boxes, t_conf = t_bucket2bbox(torch.tensor(props),
                                    torch.tensor(clsp),
                                    torch.tensor(offp), max_shape=(64, 96))
    np.testing.assert_allclose(np.asarray(boxes), t_boxes.numpy(),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(conf), t_conf.numpy(),
                               rtol=1e-4, atol=1e-5)
