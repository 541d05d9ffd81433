"""Head-family numerical parity vs in-test torch oracles (round-3, set 3).

- YOLOX: the full loss_by_feat protocol (yolox_head.py:399-517) — BCE cls
  against onehot*IoU at SimOTA positives, dense BCE objectness, 'square'
  IoU box loss x5, raw-parameterization L1 (use_l1 mode) — every term
  summed over the batch and divided by the batch-TOTAL positive count
  (num_total_samples = max(reduce_mean(num_pos), 1)).
- RTMDet: loss_by_feat (rtmdet_head.py:151-288) — QFL against
  onehot*assign_metric soft targets with cls avg = sum of assign metrics,
  GIoU x2 weighted per-positive by the assign metric with bbox avg = sum
  of positive metrics, both clamped >= 1.

Assignment enters through OUR assigners on both sides (SimOTA and
DynamicSoftLabel are oracle-pinned separately in
tests/test_assigner_oracle.py), isolating the loss math.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.test_head_loss_oracle import _pad_gt, _rand_gt


def t_aligned_iou(a, b, eps=1e-6):
    """(N, 4) x (N, 4) aligned IoU."""
    lt = torch.max(a[:, :2], b[:, :2])
    rb = torch.min(a[:, 2:], b[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, 0] * wh[:, 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a + area_b - inter + eps)


def t_aligned_giou(a, b, eps=1e-7):
    lt = torch.max(a[:, :2], b[:, :2])
    rb = torch.min(a[:, 2:], b[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, 0] * wh[:, 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a + area_b - inter + eps
    elt = torch.min(a[:, :2], b[:, :2])
    erb = torch.max(a[:, 2:], b[:, 2:])
    ewh = (erb - elt).clamp(min=0)
    hull = ewh[:, 0] * ewh[:, 1] + eps
    return inter / union - (hull - union) / hull


# ---------------------------------------------------------------------------
# YOLOX
# ---------------------------------------------------------------------------
@pytest.mark.parametrize('seed', [0, 1, 2])
def test_yolox_loss_parity(seed):
    from erd_tpu.models.detectors.yolox import (YOLOXContext, yolox_decode,
                                                yolox_flat_loss)
    from erd_tpu.task import sim_ota_assign

    size, C, B = 64, 5, 2
    ctx = YOLOXContext.build((size, size))
    N = ctx.points.shape[0]
    rng = np.random.RandomState(seed + 100)
    gts = [_rand_gt(rng, rng.randint(1, 5), size, size) for _ in range(B)]
    if seed == 2:  # empty-gt image: obj loss only for it
        gts[1] = (np.zeros((0, 4), np.float32), np.zeros(0, np.int64))
    gt = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[_pad_gt(b, l) for b, l in gts])

    preds = rng.randn(B, N, 5 + C).astype(np.float32)
    got = {k: float(v) for k, v in yolox_flat_loss(
        ctx, jnp.asarray(preds), gt, C, l1_loss_weight=1.0).items()}

    # ---- oracle (yolox_head.py:472-517 with our SimOTA assignment) ----
    boxes, obj_p, cls_p = yolox_decode(ctx, jnp.asarray(preds))
    scores = np.asarray(cls_p * obj_p[..., None])
    pts = jnp.asarray(ctx.points)
    strides = jnp.asarray(ctx.strides)

    total_pos = 0
    l_cls = torch.zeros(())
    l_obj = torch.zeros(())
    l_box = torch.zeros(())
    l_l1 = torch.zeros(())
    for i in range(B):
        gb, gl = gts[i]
        res = sim_ota_assign(pts, strides, jnp.asarray(boxes[i]),
                             jnp.asarray(scores[i]),
                             gt.bboxes[i], gt.labels[i], gt.mask[i])
        pos = np.asarray(res.pos_mask)
        gt_idx = np.asarray(res.gt_idx)
        total_pos += int(pos.sum())
        t_pred = torch.tensor(preds[i])
        t_boxes = torch.tensor(np.asarray(boxes[i]))
        obj_t = torch.tensor(pos.astype(np.float32))
        l_obj = l_obj + torch.nn.functional.binary_cross_entropy_with_logits(
            t_pred[:, 4], obj_t, reduction='sum')
        if pos.sum() == 0:
            continue
        tgt = torch.tensor(gb[gt_idx[pos]])
        iou = t_aligned_iou(t_boxes[pos], tgt)
        cls_t = torch.nn.functional.one_hot(
            torch.tensor(gl[gt_idx[pos]]), C).float() * iou[:, None]
        l_cls = l_cls + torch.nn.functional.binary_cross_entropy_with_logits(
            t_pred[pos, 5:], cls_t, reduction='sum')
        # IoULoss mode='square': 1 - iou^2 (clamped), weight 5.0
        l_box = l_box + 5.0 * (1.0 - iou.clamp(min=1e-6) ** 2).sum()
        # L1 on the raw parameterization (_get_l1_target)
        t_pts = torch.tensor(ctx.points)[pos]
        t_str = torch.tensor(ctx.strides)[pos, None]
        gt_c = (tgt[:, :2] + tgt[:, 2:]) / 2
        gt_wh = (tgt[:, 2:] - tgt[:, :2]).clamp(min=1e-3)
        t = torch.cat([(gt_c - t_pts) / t_str, (gt_wh / t_str).log()], -1)
        l_l1 = l_l1 + (t_pred[pos, :4] - t).abs().sum()

    denom = max(float(total_pos), 1.0)
    np.testing.assert_allclose(got['loss_obj'], float(l_obj) / denom,
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(got['loss_cls'], float(l_cls) / denom,
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(got['loss_bbox'], float(l_box) / denom,
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(got['loss_l1_bbox'], float(l_l1) / denom,
                               rtol=3e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# RTMDet
# ---------------------------------------------------------------------------
@pytest.mark.parametrize('seed', [0, 1])
def test_rtmdet_loss_parity(seed):
    from erd_tpu.models.detectors.rtmdet import (dynamic_soft_label_assign,
                                                 rtmdet_flat_loss)
    from erd_tpu.models.detectors.yolox import YOLOXContext
    from erd_tpu.structures.boxes import distance2bbox

    size, C, B = 64, 5, 2
    ctx = YOLOXContext.build((size, size))
    N = ctx.points.shape[0]
    rng = np.random.RandomState(seed + 7)
    gts = [_rand_gt(rng, rng.randint(1, 5), size, size) for _ in range(B)]
    gt = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[_pad_gt(b, l) for b, l in gts])

    cls = rng.randn(B, N, C).astype(np.float32)
    reg = np.abs(rng.randn(B, N, 4)).astype(np.float32)
    pts = jnp.asarray(ctx.points)
    strides = jnp.asarray(ctx.strides)
    boxes = distance2bbox(pts[None],
                          jnp.asarray(reg) * strides[None, :, None])

    got = {k: float(v) for k, v in rtmdet_flat_loss(
        ctx, jnp.asarray(cls), boxes, gt, C).items()}

    # ---- oracle (rtmdet_head.py:151-288 with our DSL assignment) ----
    cls_num = torch.zeros(())
    box_num = torch.zeros(())
    cls_af = 0.0
    box_af = 0.0
    beta = 2.0
    for i in range(B):
        gb, gl = gts[i]
        probs = jax.nn.sigmoid(jnp.asarray(cls[i]))
        pos, gt_idx, _ = dynamic_soft_label_assign(
            pts, strides, boxes[i], probs,
            gt.bboxes[i], gt.labels[i], gt.mask[i])
        pos = np.asarray(pos)
        gt_idx = np.asarray(gt_idx)
        t_cls = torch.tensor(cls[i])
        t_boxes = torch.tensor(np.asarray(boxes[i]))
        tgt = torch.tensor(gb[gt_idx[pos]]) if pos.any() else \
            torch.zeros((0, 4))
        metric = torch.zeros(N)
        if pos.any():
            metric[torch.tensor(pos)] = t_aligned_iou(t_boxes[pos], tgt)
        # QualityFocalLoss with (labels, assign_metrics) tuple targets
        sig = t_cls.sigmoid()
        soft = torch.zeros((N, C))
        if pos.any():
            soft[torch.tensor(pos),
                 torch.tensor(gl[gt_idx[pos]])] = metric[torch.tensor(pos)]
        bce = torch.nn.functional.binary_cross_entropy_with_logits(
            t_cls, soft, reduction='none')
        mod = torch.where(soft > 0, (soft - sig).abs() ** beta,
                          sig ** beta)
        cls_num = cls_num + (bce * mod).sum()
        cls_af += float(metric.sum())
        if pos.any():
            giou = t_aligned_giou(t_boxes[pos], tgt)
            w = metric[torch.tensor(pos)]
            box_num = box_num + 2.0 * ((1.0 - giou) * w).sum()
            box_af += float(w.sum())

    np.testing.assert_allclose(got['loss_cls'],
                               float(cls_num) / max(cls_af, 1.0),
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(got['loss_bbox'],
                               float(box_num) / max(box_af, 1.0),
                               rtol=3e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# YOLOv3
# ---------------------------------------------------------------------------
@pytest.mark.parametrize('seed', [0, 1])
def test_yolov3_loss_parity(seed):
    """yolo_head.py:339-389 loss_by_feat_single + the mmdet weighted-
    'mean' reduction: each term is a per-level weighted mean over every
    element of that level's prediction tensor (negatives included in the
    denominator), per-level losses summed. Targets enter through OUR
    grid-responsibility builder (pinned in tests/test_yolov3.py)."""
    from erd_tpu.models.heads.yolo_head import (YOLOContext, yolo_loss,
                                                yolo_targets)

    size, C, B = 64, 5, 2
    ctx = YOLOContext.build((size, size))
    N = ctx.anchors.shape[0]
    rng = np.random.RandomState(seed + 3)
    gts = [_rand_gt(rng, rng.randint(1, 4), size, size) for _ in range(B)]
    gt = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[_pad_gt(b, l) for b, l in gts])
    tgts = yolo_targets(ctx, gt)
    assert int(np.asarray(tgts.pos_mask).sum()) > 0

    preds = rng.randn(B, N, 5 + C).astype(np.float32)
    got = {k: float(v) for k, v in yolo_loss(
        ctx, jnp.asarray(preds), tgts, C).items()}

    pos = torch.tensor(np.asarray(tgts.pos_mask)).float()
    neg = torch.tensor(np.asarray(tgts.neg_mask)).float()
    xy_t = torch.tensor(np.asarray(tgts.xy_t))
    wh_t = torch.tensor(np.asarray(tgts.wh_t))
    onehot = torch.nn.functional.one_hot(
        torch.tensor(np.asarray(tgts.labels)).long(), C).float()
    p = torch.tensor(preds)
    bce = torch.nn.functional.binary_cross_entropy_with_logits

    want = dict(loss_cls=0.0, loss_conf=0.0, loss_xy=0.0, loss_wh=0.0)
    start = 0
    for n_l in ctx.num_level_anchors:
        sl = slice(start, start + n_l)
        start += n_l
        w = pos[:, sl, None]
        want['loss_xy'] += 2.0 * float(
            (bce(p[:, sl, 0:2], xy_t[:, sl], reduction='none') * w).mean())
        want['loss_wh'] += 2.0 * float(
            ((p[:, sl, 2:4] - wh_t[:, sl]) ** 2 * w).mean())
        want['loss_conf'] += float(
            (bce(p[:, sl, 4], pos[:, sl], reduction='none') *
             (pos[:, sl] + neg[:, sl])).mean())
        want['loss_cls'] += float(
            (bce(p[:, sl, 5:], onehot[:, sl], reduction='none') * w).mean())

    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=3e-4, atol=1e-7)
