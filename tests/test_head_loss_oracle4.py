"""Head-family numerical parity vs in-test torch oracles (round-3, set 4).

- TOOD: the full task-aligned protocol — TaskAlignedAssigner
  (task_aligned_assigner.py:78-158: s^alpha * iou^beta metric, topk=13
  candidates per gt, center-in-gt with 0.01 margin, max-IoU conflict
  resolution), per-gt normalized metrics (tood_head.py:782-791:
  metric/max_metric * max_iou), activated QFL against onehot*norm_metric
  with cls avg = batch sum of metrics, GIoU x2 weighted by the norm
  metric with bbox avg = batch sum of positive weights.

Unlike set 3, the oracle here re-derives the ASSIGNMENT too, so this
pins our task_aligned_assign AND tood_loss together.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.test_head_loss_oracle import _pad_gt, _rand_gt
from tests.test_head_loss_oracle3 import t_aligned_giou


def t_pairwise_iou(a, b, eps=1e-6):
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None] - inter + eps)


def t_task_aligned_assign(points, decoded, scores, gb, gl, topk=13,
                          alpha=1.0, beta=6.0):
    """Line-faithful TaskAlignedAssigner.assign. Returns (assigned_gt
    0-based with -1 background, assign_metrics, assign_ious)."""
    INF = 1e8
    n, g = decoded.shape[0], gb.shape[0]
    overlaps = t_pairwise_iou(decoded, gb)
    metric = scores[:, gl] ** alpha * overlaps ** beta  # (N, G)
    k = min(topk, n)
    _, cand = metric.topk(k, dim=0)  # (k, G)
    cand_metric = metric[cand, torch.arange(g)]
    is_pos = cand_metric > 0
    cx, cy = points[:, 0], points[:, 1]
    l_ = cx[cand] - gb[None, :, 0]
    t_ = cy[cand] - gb[None, :, 1]
    r_ = gb[None, :, 2] - cx[cand]
    b_ = gb[None, :, 3] - cy[cand]
    in_gt = torch.stack([l_, t_, r_, b_], 1).min(dim=1)[0] > 0.01
    is_pos = is_pos & in_gt

    overlaps_inf = torch.full((n, g), -INF)
    for j in range(g):
        idx = cand[:, j][is_pos[:, j]]
        overlaps_inf[idx, j] = overlaps[idx, j]
    max_ov, argmax = overlaps_inf.max(dim=1)
    assigned = torch.full((n,), -1, dtype=torch.long)
    sel = max_ov != -INF
    assigned[sel] = argmax[sel]
    metrics = torch.zeros(n)
    metrics[sel] = metric[sel, argmax[sel]]
    ious = torch.zeros(n)
    ious[sel] = max_ov[sel]
    return assigned, metrics, ious


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_tood_loss_parity(seed):
    from erd_tpu.models.heads.tood_head import TOODContext, tood_loss

    size, C, B = 64, 5, 2
    ctx = TOODContext.build((size, size))
    N = ctx.points.shape[0]
    rng = np.random.RandomState(seed + 11)
    gts = [_rand_gt(rng, rng.randint(1, 4), size, size) for _ in range(B)]
    gt = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[_pad_gt(b, l) for b, l in gts])

    # activated probabilities and decoded boxes around the grid
    probs = rng.uniform(0.02, 0.98, (B, N, C)).astype(np.float32)
    dist = np.abs(rng.randn(B, N, 4)).astype(np.float32) * 8 + 2
    pts = ctx.points
    boxes = np.concatenate([pts[None] - dist[..., :2],
                            pts[None] + dist[..., 2:]], -1)

    got = {k: float(v) for k, v in tood_loss(
        ctx, jnp.asarray(probs), jnp.asarray(boxes), gt, C).items()}

    # ---- oracle ----
    t_pts = torch.tensor(pts)
    cls_num = torch.zeros(())
    box_num = torch.zeros(())
    cls_af = 0.0
    box_af = 0.0
    for i in range(B):
        gb_np, gl_np = gts[i]
        gb = torch.tensor(gb_np)
        gl = torch.tensor(gl_np)
        p = torch.tensor(probs[i])
        bx = torch.tensor(boxes[i])
        assigned, metrics, ious = t_task_aligned_assign(t_pts, bx, p, gb,
                                                        gl)
        pos = assigned >= 0
        # per-gt normalization (tood_head.py:782-791)
        norm = torch.zeros(N)
        for j in torch.unique(assigned[pos]):
            m = pos & (assigned == j)
            norm[m] = metrics[m] / (metrics[m].max() + 10e-8) * \
                ious[m].max()
        soft = torch.zeros((N, C))
        soft[pos, gl[assigned[pos]]] = norm[pos]
        # activated QFL (quality_focal_loss_with_prob)
        eps = 1e-12
        bce_neg = -(1 - soft) * (1 - p + eps).log() - soft * (p + eps).log()
        mod = torch.where(soft > 0, (soft - p).abs() ** 2.0, p ** 2.0)
        cls_num = cls_num + (bce_neg * mod).sum()
        cls_af += float(norm.sum())
        if pos.any():
            giou = t_aligned_giou(bx[pos], gb[assigned[pos]])
            box_num = box_num + 2.0 * ((1.0 - giou) * norm[pos]).sum()
            box_af += float(norm[pos].sum())

    np.testing.assert_allclose(got['loss_cls'],
                               float(cls_num) / max(cls_af, 1.0),
                               rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(got['loss_bbox'],
                               float(box_num) / max(box_af, 1.0),
                               rtol=5e-4, atol=1e-6)
