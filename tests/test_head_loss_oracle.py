"""Head-loss numerical parity vs in-test torch oracles (round-3).

VERDICT r2: ~25 zoo families carry only invariant/smoke coverage. These
tests extend the round-2 composed-parity approach (test_parity_oracle.py)
to more head families — each oracle is written from the reference's loss
semantics and diffed against the fused/vmapped JAX implementation on
randomized inputs:

- FCOS: full path — point target assignment (min-area resolution over
  regress ranges, fcos_head.py:347-434) AND the centerness-weighted
  log-IoU loss protocol (fcos_head.py:179-283).
- ATSS: loss math — anchor-center centerness targets, GIoU weighted by
  centerness with sum-of-centerness normalizer, focal cls
  (atss_head.py loss_by_feat/loss_by_feat_single); assignment enters
  through OUR (separately oracle-pinned) ATSS builder on both sides.
- RetinaNet: full path — MaxIoU assignment + DeltaXYWH encode + focal
  cls / L1 reg with the num_total_samples normalizer
  (retina + anchor_head.py semantics).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from erd_tpu.structures.det_sample import GTInstances

INF = 1e8


def _pad_gt(boxes, labels, max_gt=8):
    return GTInstances.pad(np.asarray(boxes, np.float32).reshape(-1, 4),
                           np.asarray(labels, np.int64), max_gt)


def _rand_gt(rng, n, h, w):
    x1 = rng.uniform(0, w * 0.7, n)
    y1 = rng.uniform(0, h * 0.7, n)
    x2 = x1 + rng.uniform(8, w * 0.4, n)
    y2 = y1 + rng.uniform(8, h * 0.4, n)
    boxes = np.stack([x1, y1, np.minimum(x2, w), np.minimum(y2, h)], -1)
    labels = rng.randint(0, 4, n)
    return boxes.astype(np.float32), labels


# ---------------------------------------------------------------------------
# torch oracle primitives
# ---------------------------------------------------------------------------
def t_focal_loss(logits, labels, num_classes, weight=None, gamma=2.0,
                 alpha=0.25, avg_factor=1.0):
    """Sigmoid focal loss with integer labels (C == background)."""
    t = torch.zeros_like(logits)
    pos = (labels >= 0) & (labels < num_classes)
    t[pos, labels[pos]] = 1.0
    p = torch.sigmoid(logits)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, t, reduction='none')
    pt = p * t + (1 - p) * (1 - t)
    at = alpha * t + (1 - alpha) * (1 - t)
    loss = at * (1 - pt) ** gamma * ce
    if weight is not None:
        loss = loss * weight[:, None]
    return loss.sum() / avg_factor


def t_centerness(ltrb):
    lr = ltrb[:, [0, 2]]
    tb = ltrb[:, [1, 3]]
    return torch.sqrt((lr.min(-1)[0] / lr.max(-1)[0]) *
                      (tb.min(-1)[0] / tb.max(-1)[0]))


def t_iou_aligned(a, b, eps=1e-6):
    lt = torch.max(a[:, :2], b[:, :2])
    rb = torch.min(a[:, 2:], b[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, 0] * wh[:, 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a + area_b - inter + eps)


def t_giou_aligned(a, b, eps=1e-6):
    iou = t_iou_aligned(a, b, eps)
    lt = torch.min(a[:, :2], b[:, :2])
    rb = torch.max(a[:, 2:], b[:, 2:])
    wh = (rb - lt).clamp(min=0)
    hull = wh[:, 0] * wh[:, 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a + area_b - t_iou_aligned(a, b, eps) * 0  # keep simple
    inter_lt = torch.max(a[:, :2], b[:, :2])
    inter_rb = torch.min(a[:, 2:], b[:, 2:])
    inter_wh = (inter_rb - inter_lt).clamp(min=0)
    inter = inter_wh[:, 0] * inter_wh[:, 1]
    union = area_a + area_b - inter + eps
    giou = inter / union - (hull - union) / (hull + eps)
    return giou


# ---------------------------------------------------------------------------
# FCOS
# ---------------------------------------------------------------------------
def t_fcos_targets(points, ranges, gt_boxes, gt_labels, num_classes):
    """Reference fcos_head.py:347-434 semantics (no center sampling)."""
    num_points = points.shape[0]
    num_gts = gt_boxes.shape[0]
    if num_gts == 0:
        return (torch.full((num_points,), num_classes, dtype=torch.long),
                torch.zeros((num_points, 4)))
    areas = ((gt_boxes[:, 2] - gt_boxes[:, 0]) *
             (gt_boxes[:, 3] - gt_boxes[:, 1]))[None].repeat(num_points, 1)
    xs = points[:, 0][:, None]
    ys = points[:, 1][:, None]
    left = xs - gt_boxes[None, :, 0]
    right = gt_boxes[None, :, 2] - xs
    top = ys - gt_boxes[None, :, 1]
    bottom = gt_boxes[None, :, 3] - ys
    ltrb = torch.stack([left, top, right, bottom], -1)
    inside = ltrb.min(-1)[0] > 0
    maxd = ltrb.max(-1)[0]
    in_range = (maxd >= ranges[:, None, 0]) & (maxd <= ranges[:, None, 1])
    areas[~inside] = INF
    areas[~in_range] = INF
    min_area, idx = areas.min(dim=1)
    labels = gt_labels[idx].clone()
    labels[min_area == INF] = num_classes
    bbox_t = ltrb[range(num_points), idx]
    return labels, bbox_t


def t_fcos_loss(points, cls_logits, bbox_preds, ctr_logits, labels_list,
                bbox_t_list, num_classes):
    """Reference fcos_head.py:179-283 loss protocol (single process:
    reduce_mean == identity)."""
    cls_f = torch.cat(cls_logits)
    bbox_f = torch.cat(bbox_preds)
    ctr_f = torch.cat(ctr_logits)
    labels = torch.cat(labels_list)
    bbox_t = torch.cat(bbox_t_list)
    pts = torch.cat([points] * len(labels_list))
    pos = ((labels >= 0) & (labels < num_classes)).nonzero().reshape(-1)
    num_pos = max(float(len(pos)), 1.0)
    loss_cls = t_focal_loss(cls_f, labels, num_classes, avg_factor=num_pos)
    pos_ctr_t = t_centerness(bbox_t[pos])
    denorm = max(float(pos_ctr_t.sum()), 1e-6)
    pp = pts[pos]
    dec_p = torch.stack([pp[:, 0] - bbox_f[pos, 0], pp[:, 1] - bbox_f[pos, 1],
                         pp[:, 0] + bbox_f[pos, 2], pp[:, 1] + bbox_f[pos, 3]],
                        -1)
    dec_t = torch.stack([pp[:, 0] - bbox_t[pos, 0], pp[:, 1] - bbox_t[pos, 1],
                         pp[:, 0] + bbox_t[pos, 2],
                         pp[:, 1] + bbox_t[pos, 3]], -1)
    ious = t_iou_aligned(dec_p, dec_t).clamp(min=1e-6)
    loss_bbox = (-ious.log() * pos_ctr_t).sum() / denorm
    loss_ctr = (torch.nn.functional.binary_cross_entropy_with_logits(
        ctr_f[pos], pos_ctr_t, reduction='none')).sum() / num_pos
    return dict(loss_cls=float(loss_cls), loss_bbox=float(loss_bbox),
                loss_centerness=float(loss_ctr))


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_fcos_targets_and_loss_parity(seed):
    from erd_tpu.models.heads.fcos_head import (FCOSPointContext,
                                                fcos_loss, fcos_targets)
    rng = np.random.RandomState(seed)
    h, w = 64, 96
    ctx = FCOSPointContext.build((h, w))
    P = ctx.points.shape[0]
    B = 2
    gts = [_rand_gt(rng, rng.randint(1, 5), h, w) for _ in range(B)]
    if seed == 2:
        gts[1] = (np.zeros((0, 4), np.float32), np.zeros(0, np.int64))

    gt = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[_pad_gt(b, l) for b, l in gts])
    tgts = fcos_targets(ctx, gt, num_classes=4)
    assert float(tgts.num_pos) > 0  # non-vacuous

    # oracle targets per image
    t_pts = torch.tensor(ctx.points)
    t_rng = torch.tensor(ctx.ranges)
    o_labels, o_bt = [], []
    for b, l in gts:
        lb, bt = t_fcos_targets(t_pts, t_rng, torch.tensor(b),
                                torch.tensor(l), 4)
        o_labels.append(lb)
        o_bt.append(bt)
    np.testing.assert_array_equal(np.asarray(tgts.labels),
                                  torch.stack(o_labels).numpy())
    got_bt = np.asarray(tgts.bbox_targets)
    want_bt = torch.stack(o_bt).numpy()
    pos = np.asarray(tgts.pos_mask)
    np.testing.assert_allclose(got_bt[pos], want_bt[pos], atol=1e-4)

    # loss parity on random predictions
    cls = rng.randn(B, P, 4).astype(np.float32)
    reg = np.exp(rng.randn(B, P, 4).astype(np.float32))
    ctr = rng.randn(B, P).astype(np.float32)
    got = {k: float(v) for k, v in fcos_loss(
        ctx, jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(ctr),
        tgts, num_classes=4).items()}
    # oracle flattens image-major; ours is identical layout after stack
    want = t_fcos_loss(
        t_pts,
        [torch.tensor(cls[i]) for i in range(B)],
        [torch.tensor(reg[i]) for i in range(B)],
        [torch.tensor(ctr[i]) for i in range(B)],
        o_labels, o_bt, num_classes=4)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=2e-4, atol=1e-6,
                                   err_msg=k)


# ---------------------------------------------------------------------------
# ATSS (loss math; assignment via our oracle-pinned builder on both sides)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize('seed', [0, 1])
def test_atss_loss_parity(seed):
    from erd_tpu.models.heads.atss_head import atss_loss
    from erd_tpu.models.heads.gfl_head import AnchorContext, gfl_targets
    from erd_tpu.task.coder import DeltaXYWHBBoxCoder

    rng = np.random.RandomState(seed)
    h, w = 64, 96
    ctx = AnchorContext.build((h, w))
    N = ctx.num_anchors
    B = 2
    gts = [_rand_gt(rng, rng.randint(1, 5), h, w) for _ in range(B)]
    gt = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[_pad_gt(b, l) for b, l in gts])
    shapes = jnp.asarray([[h, w]] * B, jnp.float32)
    tgts = gfl_targets(ctx, gt, shapes, num_classes=4)
    assert float(tgts.num_pos) > 0  # non-vacuous

    cls = rng.randn(B, N, 4).astype(np.float32)
    reg = (rng.randn(B, N, 4) * 0.2).astype(np.float32)
    ctr = rng.randn(B, N).astype(np.float32)
    coder = DeltaXYWHBBoxCoder()
    got = {k: float(v) for k, v in atss_loss(
        ctx, jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(ctr), tgts,
        coder, num_classes=4).items()}

    # ---- torch oracle (atss_head.py loss_by_feat semantics) ----
    anchors = torch.tensor(ctx.anchors)
    labels = torch.tensor(np.asarray(tgts.labels).reshape(-1))
    lw = torch.tensor(np.asarray(tgts.label_weights).reshape(-1))
    bt = torch.tensor(np.asarray(tgts.bbox_targets).reshape(-1, 4))
    pos = torch.tensor(np.asarray(tgts.pos_mask).reshape(-1))
    cls_t = torch.tensor(cls.reshape(-1, 4))
    reg_t = torch.tensor(reg.reshape(-1, 4))
    ctr_t = torch.tensor(ctr.reshape(-1))
    anchors2 = anchors.repeat(B, 1)
    num_pos = max(float(pos.sum()), 1.0)
    loss_cls = t_focal_loss(cls_t, labels, 4, weight=lw,
                            avg_factor=num_pos)

    pa = anchors2[pos]
    # DeltaXYWH decode (means 0, stds 1, wh_ratio_clip default)
    pw = pa[:, 2] - pa[:, 0]
    ph = pa[:, 3] - pa[:, 1]
    px = (pa[:, 0] + pa[:, 2]) / 2
    py = (pa[:, 1] + pa[:, 3]) / 2
    d = reg_t[pos]
    max_ratio = abs(np.log(16.0 / 1000))
    dw = d[:, 2].clamp(-max_ratio, max_ratio)
    dh = d[:, 3].clamp(-max_ratio, max_ratio)
    gw = pw * dw.exp()
    gh = ph * dh.exp()
    gx = px + pw * d[:, 0]
    gy = py + ph * d[:, 1]
    dec = torch.stack([gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2],
                      -1)
    # centerness target from ANCHOR CENTERS vs gt box (centerness_target)
    cax = (pa[:, 0] + pa[:, 2]) / 2
    cay = (pa[:, 1] + pa[:, 3]) / 2
    g = bt[pos]
    l_ = cax - g[:, 0]
    r_ = g[:, 2] - cax
    t_ = cay - g[:, 1]
    b_ = g[:, 3] - cay
    ctr_targets = torch.sqrt(
        (torch.min(l_, r_) / torch.max(l_, r_)) *
        (torch.min(t_, b_) / torch.max(t_, b_)))
    denom = max(float(ctr_targets.sum()), 1e-6)
    loss_bbox = 2.0 * ((1 - t_giou_aligned(dec, g)) *
                       ctr_targets).sum() / denom
    loss_ctr = torch.nn.functional.binary_cross_entropy_with_logits(
        ctr_t[pos], ctr_targets, reduction='sum') / num_pos

    np.testing.assert_allclose(got['loss_cls'], float(loss_cls),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(got['loss_bbox'], float(loss_bbox),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(got['loss_centerness'], float(loss_ctr),
                               rtol=2e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# MaxIoU assigner + RetinaNet full path
# ---------------------------------------------------------------------------
def t_max_iou_assign(overlaps, pos_thr, neg_thr, min_pos_iou,
                     match_low_quality=True):
    """Line-faithful assign_wrt_overlaps (max_iou_assigner.py:196-232):
    returns assigned_gt_inds with -1 ignore / 0 negative / i+1 positive."""
    n = overlaps.shape[1]
    assigned = torch.full((n,), -1, dtype=torch.long)
    max_overlaps, argmax = overlaps.max(dim=0)
    gt_max, gt_argmax = overlaps.max(dim=1)
    assigned[(max_overlaps >= 0) & (max_overlaps < neg_thr)] = 0
    pos = max_overlaps >= pos_thr
    assigned[pos] = argmax[pos] + 1
    if match_low_quality:
        for i in range(overlaps.shape[0]):
            if gt_max[i] >= min_pos_iou:
                assigned[overlaps[i, :] == gt_max[i]] = i + 1  # assign_all
    return assigned


@pytest.mark.parametrize('seed', list(range(4)))
def test_max_iou_assigner_matches_oracle(seed):
    from erd_tpu.structures.boxes import bbox_overlaps as j_overlaps
    from erd_tpu.task.max_iou import max_iou_assign
    rng = np.random.RandomState(seed + 10)
    h, w = 64, 96
    boxes, labels = _rand_gt(rng, 4, h, w)
    # quantize coordinates so IoU TIES actually occur (exercises
    # gt_max_assign_all, which the argmax-only shortcut would miss)
    boxes = (boxes / 8).round() * 8
    anchors = []
    for s in (8, 16, 32):
        xs, ys = np.meshgrid(np.arange(0, w, s), np.arange(0, h, s))
        ctr = np.stack([xs.reshape(-1), ys.reshape(-1)], -1) + s / 2
        anchors.append(np.concatenate([ctr - s, ctr + s], -1))
    anchors = np.concatenate(anchors).astype(np.float32)

    res = max_iou_assign(jnp.asarray(anchors), jnp.asarray(boxes),
                         jnp.asarray(labels), jnp.ones(len(boxes), bool),
                         pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0)

    ov = torch.tensor(np.asarray(
        j_overlaps(jnp.asarray(boxes), jnp.asarray(anchors))))
    want = t_max_iou_assign(ov, 0.5, 0.4, 0.0)
    got_pos = np.asarray(res.pos_mask)
    np.testing.assert_array_equal(got_pos, (want > 0).numpy())
    got_gt = np.asarray(res.gt_idx)
    np.testing.assert_array_equal(got_gt[got_pos],
                                  (want[want > 0] - 1).numpy())
    # ignore band: reference leaves them at -1
    got_ign = np.asarray(res.labels) == -2
    np.testing.assert_array_equal(got_ign, (want == -1).numpy())
    assert got_pos.sum() > 0


@pytest.mark.parametrize('seed', [0, 1])
def test_retina_full_path_parity(seed):
    """MaxIoU assignment + DeltaXYWH encode + focal/L1 with the
    num_pos normalizer (anchor_head.py loss_by_feat + PseudoSampler
    avg_factor_with_neg=False)."""
    from erd_tpu.models.heads.gfl_head import AnchorContext
    from erd_tpu.models.heads.retina_head import (RetinaTrainConfig,
                                                  retina_anchor_generator,
                                                  retina_loss,
                                                  retina_targets)
    from erd_tpu.structures.boxes import bbox_overlaps as j_overlaps
    from erd_tpu.task.coder import DeltaXYWHBBoxCoder

    rng = np.random.RandomState(seed)
    h, w = 64, 96
    gen = retina_anchor_generator()
    ctx = AnchorContext.build((h, w), gen)
    N = ctx.num_anchors
    B = 2
    gts = [_rand_gt(rng, rng.randint(1, 4), h, w) for _ in range(B)]
    gt = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[_pad_gt(b, l) for b, l in gts])
    shapes = jnp.asarray([[h, w]] * B, jnp.float32)
    coder = DeltaXYWHBBoxCoder()
    tgts = retina_targets(ctx, gt, shapes, 4, coder,
                          num_base_anchors=9)
    assert float(tgts.num_pos) > 0

    cls = rng.randn(B, N, 4).astype(np.float32)
    reg = (rng.randn(B, N, 4) * 0.2).astype(np.float32)
    got = {k: float(v) for k, v in retina_loss(
        jnp.asarray(cls), jnp.asarray(reg), tgts).items()}

    # ---- oracle: assignment + encode + losses in torch ----
    anchors = torch.tensor(ctx.anchors)
    total_pos = 0
    loss_cls_sum = torch.zeros(())
    loss_bbox_sum = torch.zeros(())
    per_img = []
    for b_i, (boxes, labels) in enumerate(gts):
        ov = torch.tensor(np.asarray(
            j_overlaps(jnp.asarray(boxes), jnp.asarray(anchors.numpy()))))
        assigned = t_max_iou_assign(ov, 0.5, 0.4, 0.0)
        total_pos += int((assigned > 0).sum())
        per_img.append((assigned, torch.tensor(boxes),
                        torch.tensor(labels)))
    avg = max(float(total_pos), 1.0)
    for b_i, (assigned, boxes, labels) in enumerate(per_img):
        lab = torch.full((N,), 4, dtype=torch.long)
        pos = assigned > 0
        lab[pos] = labels[assigned[pos] - 1]
        lw = torch.ones(N)
        lw[assigned == -1] = 0.0
        loss_cls_sum = loss_cls_sum + t_focal_loss(
            torch.tensor(cls[b_i]), lab, 4, weight=lw, avg_factor=avg)
        # DeltaXYWH encode of matched gts
        pa = anchors[pos]
        g = boxes[assigned[pos] - 1]
        pw, ph = pa[:, 2] - pa[:, 0], pa[:, 3] - pa[:, 1]
        px, py = (pa[:, 0] + pa[:, 2]) / 2, (pa[:, 1] + pa[:, 3]) / 2
        gw, gh = g[:, 2] - g[:, 0], g[:, 3] - g[:, 1]
        gx, gy = (g[:, 0] + g[:, 2]) / 2, (g[:, 1] + g[:, 3]) / 2
        t = torch.stack([(gx - px) / pw, (gy - py) / ph,
                         (gw / pw).log(), (gh / ph).log()], -1)
        l1 = (torch.tensor(reg[b_i])[pos] - t).abs().sum()
        loss_bbox_sum = loss_bbox_sum + l1 / avg
    np.testing.assert_allclose(got['loss_cls'], float(loss_cls_sum),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(got['loss_bbox'], float(loss_bbox_sum),
                               rtol=2e-4, atol=1e-6)
