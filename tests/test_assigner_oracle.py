"""Differential tests: SimOTA and DynamicSoftLabel assigners vs in-test
torch oracles.

The oracles are line-faithful re-derivations of the reference semantics
(mmdet/models/task_modules/assigners/sim_ota_assigner.py and
dynamic_soft_label_assigner.py), written with dynamic shapes and torch ops
the way the reference computes them; the production JAX code is
static-shape/masked. Agreement on randomized inputs pins the YOLOX/RTMDet
assignment behavior, including the padding-invariance of the masked forms.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

INF = 100000.0
EPS = 1e-7


def _iou_matrix(a, b):
    a = torch.as_tensor(a, dtype=torch.float32)
    b = torch.as_tensor(b, dtype=torch.float32)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = torch.maximum(a[:, None, :2], b[None, :, :2])
    rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = (area_a[:, None] + area_b[None, :] - inter).clamp(min=1e-6)
    return inter / union


def _dynamic_k_matching(cost, pairwise_ious, num_gt, topk):
    """Shared dynamic-k matcher (sim_ota_assigner.py:192-225)."""
    matching = torch.zeros_like(cost, dtype=torch.uint8)
    candidate_topk = min(topk, pairwise_ious.size(0))
    topk_ious, _ = torch.topk(pairwise_ious, candidate_topk, dim=0)
    dynamic_ks = torch.clamp(topk_ious.sum(0).int(), min=1)
    for gt_idx in range(num_gt):
        _, pos_idx = torch.topk(cost[:, gt_idx], k=int(dynamic_ks[gt_idx]),
                                largest=False)
        matching[:, gt_idx][pos_idx] = 1
    prior_match_gt = matching.sum(1) > 1
    if prior_match_gt.sum() > 0:
        _, cost_argmin = torch.min(cost[prior_match_gt, :], dim=1)
        matching[prior_match_gt, :] *= 0
        matching[prior_match_gt, cost_argmin] = 1
    fg = matching.sum(1) > 0
    matched_gt = matching[fg, :].argmax(1)
    return fg, matched_gt


def simota_oracle(priors_xy, strides, decoded, probs, gt_bboxes, gt_labels,
                  center_radius=2.5, candidate_topk=10, iou_weight=3.0,
                  cls_weight=1.0):
    """Returns (assigned_gt_inds[n] with -1 for background, labels[n])."""
    priors_xy = torch.as_tensor(priors_xy, dtype=torch.float32)
    strides = torch.as_tensor(strides, dtype=torch.float32)
    decoded = torch.as_tensor(decoded, dtype=torch.float32)
    # the head feeds sqrt(cls*obj) scores (yolox_head.py:582)
    scores = torch.as_tensor(probs, dtype=torch.float32).sqrt()
    gt_bboxes = torch.as_tensor(gt_bboxes, dtype=torch.float32)
    gt_labels = torch.as_tensor(gt_labels, dtype=torch.long)
    n, g = len(priors_xy), len(gt_bboxes)

    x, y = priors_xy[:, 0:1], priors_xy[:, 1:2]
    l_ = x - gt_bboxes[None, :, 0]
    t_ = y - gt_bboxes[None, :, 1]
    r_ = gt_bboxes[None, :, 2] - x
    b_ = gt_bboxes[None, :, 3] - y
    is_in_gts = torch.stack([l_, t_, r_, b_], -1).min(-1).values > 0
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
    r = center_radius * strides[:, None]
    is_in_cts = ((x > cx[None] - r) & (x < cx[None] + r) &
                 (y > cy[None] - r) & (y < cy[None] + r))
    valid = (is_in_gts | is_in_cts).any(1)
    in_both = (is_in_gts & is_in_cts)[valid]

    ious = _iou_matrix(decoded[valid], gt_bboxes)
    iou_cost = -torch.log(ious + EPS)
    onehot = F.one_hot(gt_labels, probs.shape[-1]).float()
    cls_cost = F.binary_cross_entropy(
        scores[valid][:, None, :].repeat(1, g, 1),
        onehot[None].repeat(int(valid.sum()), 1, 1),
        reduction='none').sum(-1)
    cost = (cls_cost * cls_weight + iou_cost * iou_weight +
            (~in_both) * INF)
    fg, matched_gt = _dynamic_k_matching(cost, ious, g, candidate_topk)

    assigned = torch.full((n,), -1, dtype=torch.long)
    labels = torch.full((n,), -1, dtype=torch.long)
    idx = torch.nonzero(valid).squeeze(1)[fg]
    assigned[idx] = matched_gt
    labels[idx] = gt_labels[matched_gt]
    return assigned.numpy(), labels.numpy()


def dsl_oracle(priors_xy, strides, decoded, probs, gt_bboxes, gt_labels,
               topk=13, iou_weight=3.0, soft_center_radius=3.0):
    priors_xy = torch.as_tensor(priors_xy, dtype=torch.float32)
    strides = torch.as_tensor(strides, dtype=torch.float32)
    decoded = torch.as_tensor(decoded, dtype=torch.float32)
    probs = torch.as_tensor(probs, dtype=torch.float32)
    logits = torch.logit(probs.clamp(1e-7, 1 - 1e-7))
    gt_bboxes = torch.as_tensor(gt_bboxes, dtype=torch.float32)
    gt_labels = torch.as_tensor(gt_labels, dtype=torch.long)
    n, g = len(priors_xy), len(gt_bboxes)

    lt_ = priors_xy[:, None] - gt_bboxes[:, :2]
    rb_ = gt_bboxes[:, 2:] - priors_xy[:, None]
    is_in_gts = torch.cat([lt_, rb_], -1).min(-1).values > 0
    valid = is_in_gts.sum(1) > 0
    nv = int(valid.sum())

    gt_center = (gt_bboxes[:, :2] + gt_bboxes[:, 2:]) / 2.0
    vp = priors_xy[valid]
    vs = strides[valid]
    distance = ((vp[:, None] - gt_center[None]) ** 2
                ).sum(-1).sqrt() / vs[:, None]
    soft_center_prior = torch.pow(10, distance - soft_center_radius)

    ious = _iou_matrix(decoded[valid], gt_bboxes)
    iou_cost = -torch.log(ious + EPS) * iou_weight
    onehot = F.one_hot(gt_labels, probs.shape[-1]).float()
    soft_label = onehot[None].repeat(nv, 1, 1) * ious[..., None]
    vlogits = logits[valid][:, None, :].repeat(1, g, 1)
    scale = (soft_label - torch.sigmoid(vlogits)).abs().pow(2.0)
    soft_cls_cost = (F.binary_cross_entropy_with_logits(
        vlogits, soft_label, reduction='none') * scale).sum(-1)

    cost = soft_cls_cost + iou_cost + soft_center_prior
    fg, matched_gt = _dynamic_k_matching(cost, ious, g, topk)

    assigned = torch.full((n,), -1, dtype=torch.long)
    labels = torch.full((n,), -1, dtype=torch.long)
    idx = torch.nonzero(valid).squeeze(1)[fg]
    assigned[idx] = matched_gt
    labels[idx] = gt_labels[matched_gt]
    return assigned.numpy(), labels.numpy()


def _rand_case(seed, n_grid=12, g=5, c=6, pad=3):
    rs = np.random.RandomState(seed)
    # two pyramid levels of priors (stride 8 and 16) on a 96x96 image
    pts8 = np.stack(np.meshgrid(np.arange(n_grid), np.arange(n_grid)),
                    -1).reshape(-1, 2) * 8.0 + 4.0
    pts16 = np.stack(np.meshgrid(np.arange(n_grid // 2),
                                 np.arange(n_grid // 2)),
                     -1).reshape(-1, 2) * 16.0 + 8.0
    pts = np.concatenate([pts8, pts16]).astype(np.float32)
    strides = np.concatenate([np.full(len(pts8), 8.0),
                              np.full(len(pts16), 16.0)]).astype(np.float32)
    n = len(pts)
    # decoded boxes roughly around each prior
    wh = rs.uniform(6, 40, (n, 2)).astype(np.float32)
    ctr = pts + rs.uniform(-6, 6, (n, 2)).astype(np.float32)
    decoded = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1)
    probs = rs.uniform(0.01, 0.99, (n, c)).astype(np.float32)
    x1 = rs.uniform(0, 60, (g, 1))
    y1 = rs.uniform(0, 60, (g, 1))
    w = rs.uniform(12, 35, (g, 1))
    h = rs.uniform(12, 35, (g, 1))
    gts = np.concatenate([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)
    labels = rs.randint(0, c, g).astype(np.int32)
    # padded arrays as the static pipeline sees them
    gts_pad = np.concatenate([gts, np.zeros((pad, 4), np.float32)])
    labels_pad = np.concatenate([labels, np.zeros(pad, np.int32)])
    mask_pad = np.concatenate([np.ones(g, bool), np.zeros(pad, bool)])
    return pts, strides, decoded, probs, gts, labels, gts_pad, labels_pad, \
        mask_pad


@pytest.mark.parametrize('seed', range(6))
def test_sim_ota_matches_oracle(seed):
    from erd_tpu.task import sim_ota_assign
    (pts, strides, decoded, probs, gts, labels,
     gts_pad, labels_pad, mask_pad) = _rand_case(seed)
    want_gt, want_lab = simota_oracle(pts, strides, decoded, probs, gts,
                                      labels)
    res = sim_ota_assign(pts, strides, decoded, probs, gts_pad, labels_pad,
                         mask_pad)
    got_gt = np.where(np.asarray(res.pos_mask), np.asarray(res.gt_idx), -1)
    got_lab = np.asarray(res.labels)
    np.testing.assert_array_equal(got_gt, want_gt)
    np.testing.assert_array_equal(got_lab, want_lab)


@pytest.mark.parametrize('seed', range(6))
def test_dynamic_soft_label_matches_oracle(seed):
    from erd_tpu.models.detectors.rtmdet import dynamic_soft_label_assign
    (pts, strides, decoded, probs, gts, labels,
     gts_pad, labels_pad, mask_pad) = _rand_case(seed)
    want_gt, want_lab = dsl_oracle(pts, strides, decoded, probs, gts,
                                   labels)
    pos, gt_idx, _ = dynamic_soft_label_assign(
        pts, strides, decoded, probs, gts_pad, labels_pad, mask_pad)
    got_gt = np.where(np.asarray(pos), np.asarray(gt_idx), -1)
    np.testing.assert_array_equal(got_gt, want_gt)


def test_sim_ota_padding_invariance():
    from erd_tpu.task import sim_ota_assign
    (pts, strides, decoded, probs, gts, labels,
     gts_pad, labels_pad, mask_pad) = _rand_case(99, pad=7)
    a = sim_ota_assign(pts, strides, decoded, probs, gts_pad, labels_pad,
                       mask_pad)
    b = sim_ota_assign(pts, strides, decoded, probs, gts, labels,
                       np.ones(len(gts), bool))
    np.testing.assert_array_equal(np.asarray(a.pos_mask),
                                  np.asarray(b.pos_mask))
    np.testing.assert_array_equal(
        np.where(np.asarray(a.pos_mask), np.asarray(a.gt_idx), -1),
        np.where(np.asarray(b.pos_mask), np.asarray(b.gt_idx), -1))
