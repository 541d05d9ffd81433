"""RepPoints semantics: moment points->box vs torch oracle, point
assignment level routing / nearest-point rule, head forward shapes
(reppoints_head.py:184-239, point_assigner.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.task.point_assigner import point_assign


def test_points2bbox_moment_matches_torch():
    import torch
    from erd_tpu.models.heads.reppoints_head import points2bbox
    rs = np.random.RandomState(0)
    pts = rs.randn(7, 18).astype(np.float32) * 3
    moment = np.asarray([0.3, -0.2], np.float32)

    out = np.asarray(points2bbox(jnp.asarray(pts), jnp.asarray(moment)))

    t = torch.from_numpy(pts)
    pr = t.view(7, 9, 2)
    py, px = pr[..., 0], pr[..., 1]
    my = py.mean(dim=1, keepdim=True)
    mx = px.mean(dim=1, keepdim=True)
    sy = torch.std(py - my, dim=1, keepdim=True)
    sx = torch.std(px - mx, dim=1, keepdim=True)
    hw = sx * np.exp(moment[0])
    hh = sy * np.exp(moment[1])
    ref = torch.cat([mx - hw, my - hh, mx + hw, my + hh], dim=1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_point_assign_level_routing():
    # points on strides 8..128; a 32x32 gt routes to lvl 5 (stride 32):
    # (log2(32/4)+log2(32/4))/2 = 3 -> +log2? gt_lvl=3 -> clamped [3,7]
    # stride lvl = log2(stride): 8->3 ... so a 32x32 gt -> lvl 3 = stride 8
    pts = []
    strides = []
    for s in (8, 16, 32):
        for i in range(4):
            pts.append([(i + 0.5) * s, (0 + 0.5) * s])
            strides.append(s)
    pts = jnp.asarray(pts, jnp.float32)
    strides = jnp.asarray(strides, jnp.float32)
    gt_b = jnp.asarray([[0., 0., 32., 32.]])
    res = point_assign(pts, strides, gt_b, jnp.asarray([2]),
                       jnp.asarray([True]), scale=4)
    pos = np.flatnonzero(np.asarray(res.pos_mask))
    assert len(pos) == 1
    assert float(strides[pos[0]]) == 8.0  # routed to the stride-8 level
    # nearest point to gt center (16, 16) on stride 8 row y=4:
    # x candidates 4,12,20,28 -> 12 or 20 tie -> first (idx 1)
    assert pos[0] == 1


def test_point_assign_conflict_resolves_to_closer_gt():
    pts = jnp.asarray([[16., 16.]], jnp.float32)
    strides = jnp.asarray([8.], jnp.float32)
    # both gts route to lvl 3 and both pick the only point; closer gt wins
    gt_b = jnp.asarray([[0., 0., 32., 32.], [6., 6., 28., 28.]])
    res = point_assign(pts, strides, gt_b,
                       jnp.asarray([0, 1]), jnp.asarray([True, True]),
                       scale=4)
    # normalized distances: gt0 center (16,16) d=0; gt1 center (17,17)
    assert int(res.gt_idx[0]) == 0
    assert int(res.labels[0]) == 0


def test_reppoints_forward_and_loss_smoke():
    from erd_tpu.models.detectors.reppoints import RepPointsDetector
    from tests.test_models import make_batch
    det = RepPointsDetector(num_classes=4, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    batch = make_batch(gts=[([[10, 10, 60, 50]], [1]), ([], [])])
    losses = det.loss_jit(variables, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, losses)
    assert float(losses['loss_pts_init']) > 0
    assert float(losses['loss_pts_refine']) >= 0
    res = det.predict_jit(variables, batch)
    assert res.bboxes.shape[-1] == 4
