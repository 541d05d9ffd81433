"""CenterNetUpdateHead parity vs in-test torch oracles: the dense
heatmap/reg-target builder (centernet_update_head.py:335-404) and the
adaptive cls-positive selection (:406-484,486-624), replayed line-faithfully
in torch and compared to the vmapped dense forms."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from erd_tpu.models.heads.centernet_update_head import (
    INF, REGRESS_RANGES, STRIDES, CNUPointContext, cnu_pos_counts,
    cnu_targets)
from erd_tpu.structures import GTInstances

DELTA = (1 - 0.8) / (1 + 0.8)


def t_targets(points, strides, ranges, gb, gl, num_classes,
              hm_min_radius=4):
    """Line-faithful _get_targets_single."""
    num_points = points.shape[0]
    num_gts = gb.shape[0]
    if num_gts == 0:
        return (torch.full((num_points, num_classes), 0.0),
                torch.full((num_points, 4), -float(INF)))
    pts = points[:, None].expand(num_points, num_gts, 2)
    gbe = gb[None].expand(num_points, num_gts, 4)
    st = strides[:, None, None].expand(num_points, num_gts, 2)
    bbox_target = torch.cat([pts - gbe[..., :2], gbe[..., 2:] - pts], -1)
    inside_gt = bbox_target.min(dim=2)[0] > 0
    centers = (gbe[..., [0, 1]] + gbe[..., [2, 3]]) / 2
    cd = ((centers / st).int() * st).float() + st / 2
    cdd = pts - cd
    in_c3 = (cdd[..., 0].abs() <= st[..., 0]) & \
            (cdd[..., 1].abs() <= st[..., 0])
    wh = bbox_target[..., :2] + bbox_target[..., 2:]
    crit = (wh ** 2).sum(dim=2) ** 0.5 / 2
    in_rng = (crit >= ranges[:, [0]]) & (crit <= ranges[:, [1]])
    mask = inside_gt & in_c3 & in_rng
    peak = (cdd ** 2).sum(dim=2) == 0
    wd = ((pts - centers) ** 2).sum(dim=2)
    wd[peak] = 0
    areas = (gbe[..., 2] - gbe[..., 0]) * (gbe[..., 3] - gbe[..., 1])
    radius = torch.clamp(DELTA ** 2 * 2 * areas, min=hm_min_radius ** 2)
    wd = wd / radius
    bwd = wd.clone()
    bwd[mask == 0] = float(INF)
    min_dist, min_inds = bwd.min(dim=1)
    bt = bbox_target[range(num_points), min_inds]
    bt[min_dist == float(INF)] = -float(INF)
    bt = bt / st[:, 0, :].repeat(1, 2)
    hm = torch.zeros((num_points, num_classes))
    for c in range(num_classes):
        inds = gl == c
        if inds.int().sum() == 0:
            continue
        hm[:, c] = torch.exp(-wd[:, inds].min(dim=1)[0])
        hm[hm[:, c] < 1e-4, c] = 0
    return hm, bt


@pytest.mark.parametrize('seed', list(range(3)))
def test_targets_parity(seed):
    rng = np.random.RandomState(seed)
    ctx = CNUPointContext.build((128, 160))
    n = rng.randint(1, 5)
    x1 = rng.uniform(0, 100, n)
    y1 = rng.uniform(0, 80, n)
    gb = np.stack([x1, y1, x1 + rng.uniform(8, 150, n),
                   y1 + rng.uniform(8, 110, n)], -1).astype(np.float32)
    gl = rng.randint(0, 4, n).astype(np.int32)
    gt = GTInstances.pad(gb, gl, 8)
    gt = jax.tree.map(lambda x: jnp.asarray(x)[None], gt)
    hm, bt, reg_pos = jax.jit(
        lambda g: cnu_targets(ctx, g, 4))(gt)
    t_hm, t_bt = t_targets(torch.tensor(ctx.points),
                           torch.tensor(ctx.strides),
                           torch.tensor(ctx.ranges),
                           torch.tensor(gb), torch.tensor(gl), 4)
    np.testing.assert_allclose(np.asarray(hm[0]), t_hm.numpy(),
                               rtol=1e-4, atol=1e-5)
    t_pos = (t_bt.max(dim=1)[0] >= 0).numpy()
    np.testing.assert_array_equal(np.asarray(reg_pos[0]), t_pos)
    np.testing.assert_allclose(np.asarray(bt[0])[t_pos],
                               t_bt.numpy()[t_pos], rtol=1e-4, atol=1e-4)


def t_add_pos(points, shapes, gb, gl, reg_preds, thresh=0.2, topk=9):
    """Line-faithful add_cls_pos_inds (+ _get_center3x3_region_index
    _targets) for ONE image, torch."""
    def generalized_box_iou_loss(p, t, reduction='none'):
        # mmdet iou_loss.py giou: 1 - (iou - (enclose-union)/enclose)
        eps = 1e-7
        lt = torch.max(p[:, :2], t[:, :2])
        rb = torch.min(p[:, 2:], t[:, 2:])
        wh = (rb - lt).clamp(min=0)
        overlap = wh[:, 0] * wh[:, 1]
        ap = (p[:, 2] - p[:, 0]) * (p[:, 3] - p[:, 1])
        at = (t[:, 2] - t[:, 0]) * (t[:, 3] - t[:, 1])
        union = (ap + at - overlap).clamp(min=eps)
        elt = torch.min(p[:, :2], t[:, :2])
        erb = torch.max(p[:, 2:], t[:, 2:])
        ewh = (erb - elt).clamp(min=0)
        enclose = (ewh[:, 0] * ewh[:, 1]).clamp(min=eps)
        giou = overlap / union - (enclose - union) / enclose
        return 1 - giou

    num_gts = gb.shape[0]
    L, K = len(STRIDES), 9
    dx = torch.tensor([-1, 0, 1, -1, 0, 1, -1, 0, 1]).view(1, 1, K)
    dy = torch.tensor([-1, -1, -1, 0, 0, 0, 1, 1, 1]).view(1, 1, K)
    strides = torch.tensor(STRIDES).long()
    rngs = torch.tensor(REGRESS_RANGES).float()
    shapes = shapes.long()
    area = (shapes[:, 0] * shapes[:, 1])
    start = torch.cumsum(torch.cat([torch.zeros(1).long(), area[:-1]]), 0)
    gbe = gb[:, None].expand(num_gts, L, 4)
    st = strides[None, :, None].expand(num_gts, L, 2)
    centers = (gbe[..., [0, 1]] + gbe[..., [2, 3]]) / 2
    ci = (centers / st).long()
    cd = ci * st + st // 2
    bt = torch.cat([cd - gbe[..., :2], gbe[..., 2:] - cd], -1).float()
    whs = bt[..., :2] + bt[..., 2:]
    crit = (whs ** 2).sum(dim=2) ** 0.5 / 2
    in_rng = (crit >= rngs[None, :, 0]) & (crit <= rngs[None, :, 1]) & \
        (bt.min(dim=2)[0] >= 0)
    ws = shapes[None, :, 1:2].expand(num_gts, L, K)
    hs = shapes[None, :, 0:1].expand(num_gts, L, K)
    cix, ciy = ci[..., 0:1], ci[..., 1:2]
    idx = start.view(1, L, 1) + (ciy + dy) * ws + (cix + dx)
    mask = ((ciy + dy) < hs) & ((ciy + dy) >= 0) & \
           ((cix + dx) < ws) & ((cix + dx) >= 0)
    bt9 = (bt / st.repeat(1, 1, 2))[:, :, None, :].expand(
        num_gts, L, K, 4).clone()
    bt9[..., 0] += dx
    bt9[..., 1] += dy
    bt9[..., 2] -= dx
    bt9[..., 3] -= dy
    mask = mask & (bt9.min(dim=3)[0] >= 0)
    idx = idx.long()
    idx[mask == 0] = 0
    cand_pts = points[idx.view(-1)]
    cand_pred = reg_preds[idx.view(-1)]
    cand_tgt = bt9.view(-1, 4).clamp(min=0)

    def decode(p, d):
        return torch.stack([p[:, 0] - d[:, 0], p[:, 1] - d[:, 1],
                            p[:, 0] + d[:, 2], p[:, 1] + d[:, 3]], -1)

    loss = generalized_box_iou_loss(decode(cand_pts, cand_pred),
                                    decode(cand_pts, cand_tgt),
                                    reduction='none').view(num_gts, L, K)
    loss[mask == 0] = float(INF)
    loss.view(-1, K)[in_rng.view(-1), 4] = 0
    loss = loss.view(num_gts, -1)
    thr = torch.kthvalue(loss, topk, dim=1)[0]
    thr[thr > thresh] = thresh
    new_pos = loss < thr.view(num_gts, 1)
    pos_inds = idx.view(num_gts, -1)[new_pos]
    labels = gl.view(num_gts, 1).expand(num_gts, L * K)[new_pos]
    return pos_inds, labels


@pytest.mark.parametrize('seed', list(range(3)))
def test_adaptive_positives_parity(seed):
    rng = np.random.RandomState(seed + 10)
    ctx = CNUPointContext.build((128, 160))
    P = ctx.points.shape[0]
    n = rng.randint(1, 4)
    x1 = rng.uniform(0, 100, n)
    y1 = rng.uniform(0, 80, n)
    gb = np.stack([x1, y1, x1 + rng.uniform(16, 150, n),
                   y1 + rng.uniform(16, 110, n)], -1).astype(np.float32)
    gl = rng.randint(0, 4, n).astype(np.int32)
    reg = rng.uniform(0, 8, (P, 4)).astype(np.float32)
    gt = GTInstances.pad(gb, gl, 8)
    gt = jax.tree.map(lambda x: jnp.asarray(x)[None], gt)
    counts, num_pos = jax.jit(
        lambda r, g: cnu_pos_counts(ctx, r, g, 4))(
        jnp.asarray(reg)[None], gt)
    pos_inds, labels = t_add_pos(
        torch.tensor(ctx.points),
        torch.tensor(np.asarray(ctx.featmap_sizes)),
        torch.tensor(gb), torch.tensor(gl.astype(np.int64)),
        torch.tensor(reg))
    t_counts = np.zeros((P, 4), np.float32)
    for i, lab in zip(pos_inds.numpy(), labels.numpy()):
        t_counts[i, lab] += 1
    assert int(num_pos) == len(pos_inds)
    np.testing.assert_array_equal(np.asarray(counts[0]), t_counts)
