"""FSAF + FoveaBox semantics tests.

Pins: TBLR coder roundtrip vs hand math (tblr_bbox_coder.py:95-226), the
center-region core/shadow assignment (center_region_assigner.py), FSAF's
online feature-selection (each gt keeps exactly one level's positives,
fsaf_head.py:278-340), and the fovea region painting + log targets
(fovea_head.py:333-384).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erd_tpu.structures import GTInstances
from erd_tpu.task.center_region import center_region_assign
from erd_tpu.task.coder import TBLRBBoxCoder


def test_tblr_roundtrip_and_values():
    coder = TBLRBBoxCoder(normalizer=4.0)
    priors = jnp.asarray([[0., 0., 8., 8.], [16., 16., 48., 48.]])
    gts = jnp.asarray([[1., 2., 7., 6.], [10., 20., 50., 40.]])
    enc = coder.encode(priors, gts)
    # first prior: center (4,4), w=h=8; t=(4-2)/8/4, b=(6-4)/8/4,
    # l=(4-1)/8/4, r=(7-4)/8/4
    np.testing.assert_allclose(
        np.asarray(enc[0]),
        [2 / 8 / 4, 2 / 8 / 4, 3 / 8 / 4, 3 / 8 / 4], rtol=1e-6)
    dec = coder.decode(priors, enc)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gts), atol=1e-4)


def test_tblr_decode_clips():
    coder = TBLRBBoxCoder(normalizer=4.0)
    priors = jnp.asarray([[0., 0., 8., 8.]])
    tblr = jnp.asarray([[10., 10., 10., 10.]])
    dec = coder.decode(priors, tblr, max_shape=(32, 48))
    assert float(dec[0, 0]) == 0.0 and float(dec[0, 1]) == 0.0
    assert float(dec[0, 2]) == 48.0 and float(dec[0, 3]) == 32.0


def test_center_region_smallest_gt_wins():
    # prior centered at (5,5); two gts both covering it; smaller wins
    priors = jnp.asarray([[0., 0., 10., 10.]])
    gt_b = jnp.asarray([[0., 0., 100., 100.], [0., 0., 20., 20.]])
    gt_l = jnp.asarray([3, 1], jnp.int32)
    gt_m = jnp.asarray([True, True])
    res = center_region_assign(priors, gt_b, gt_l, gt_m, 1.0, 1.0)
    assert bool(res.pos_mask[0])
    assert int(res.gt_idx[0]) == 1
    assert int(res.labels[0]) == 1


def test_center_region_outside_core_is_negative():
    # prior center (50,50) inside gt but outside the 0.2-shrunk core
    priors = jnp.asarray([[45., 45., 55., 55.]])
    gt_b = jnp.asarray([[0., 0., 60., 60.]])  # core: [24,24,36,36]
    res = center_region_assign(priors, gt_b, jnp.asarray([0]),
                               jnp.asarray([True]), 0.2, 0.2)
    assert not bool(res.pos_mask[0])
    # but it overlaps the shadow region? IoF(prior, core)=0 -> no shadow
    # with equal scales shadow==core minus center condition
    assert not bool(res.shadow[0, 0])


def test_fsaf_level_selection_single_level_per_gt():
    from erd_tpu.models.detectors.fsaf import FSAFDetector
    from erd_tpu.models.heads.fsaf_head import fsaf_targets, FSAFTrainConfig
    det = FSAFDetector(num_classes=4, depth=18)
    ctx = det.anchor_context((64, 96))
    gt = GTInstances.pad(
        np.asarray([[8., 8., 56., 48.]], np.float32),
        np.asarray([2], np.int32), 8)
    gt = jax.tree.map(lambda x: jnp.asarray(x)[None], gt)
    t = fsaf_targets(ctx, gt, 4, FSAFTrainConfig())
    assert int(t.pos_mask.sum()) > 0
    # positives spread over multiple levels before selection
    lvl = np.repeat(np.arange(len(ctx.num_level_anchors)),
                    ctx.num_level_anchors)
    pos_lvls = set(lvl[np.asarray(t.pos_mask[0])])
    assert len(pos_lvls) >= 2  # 48x40 gt hits several stride ranges


def test_fovea_targets_match_reference_painting():
    from erd_tpu.models.heads.fcos_head import FCOSPointContext
    from erd_tpu.models.heads.fovea_head import fovea_targets
    ctx = FCOSPointContext.build((64, 96))
    # gt sqrt-area ~ 43 -> hits level0 (1..64) and level1 (32..128)
    gt = GTInstances.pad(
        np.asarray([[16., 16., 62., 56.]], np.float32),
        np.asarray([1], np.int32), 8)
    gt = jax.tree.map(lambda x: jnp.asarray(x)[None], gt)
    t = fovea_targets(ctx, gt, 4)
    pos = np.asarray(t.pos_mask[0])
    labels = np.asarray(t.labels[0])
    assert pos.sum() > 0
    assert set(labels[pos]) == {1}
    # all bbox targets within the clamp range log([1/16, 16])
    bt = np.asarray(t.bbox_targets[0])[pos]
    assert bt.min() >= np.log(1 / 16) - 1e-5
    assert bt.max() <= np.log(16.0) + 1e-5
    # reference painting: compute expected level-0 cells by hand
    sizes = ctx.featmap_sizes
    s, sigma, base = 8, 0.4, 16
    gx1, gy1, gx2, gy2 = 16 / s, 16 / s, 62 / s, 56 / s
    hw, hh = (gx2 - gx1) / 2, (gy2 - gy1) / 2
    px1 = int(np.clip(np.ceil(gx1 + (1 - sigma) * hw - 0.5), 0,
                      sizes[0][1] - 1))
    px2 = int(np.clip(np.floor(gx1 + (1 + sigma) * hw - 0.5), 0,
                      sizes[0][1] - 1))
    py1 = int(np.clip(np.ceil(gy1 + (1 - sigma) * hh - 0.5), 0,
                      sizes[0][0] - 1))
    py2 = int(np.clip(np.floor(gy1 + (1 + sigma) * hh - 0.5), 0,
                      sizes[0][0] - 1))
    lvl0 = pos[:sizes[0][0] * sizes[0][1]].reshape(sizes[0])
    exp = np.zeros(sizes[0], bool)
    exp[py1:py2 + 1, px1:px2 + 1] = True
    np.testing.assert_array_equal(lvl0, exp)


def test_fovea_decode_roundtrip():
    from erd_tpu.models.heads.fcos_head import FCOSPointContext
    from erd_tpu.models.heads.fovea_head import fovea_targets
    # encode a gt then decode at a positive point: recovered box close to gt
    ctx = FCOSPointContext.build((64, 96))
    gt_box = np.asarray([16., 16., 62., 56.], np.float32)
    gt = GTInstances.pad(gt_box[None], np.asarray([0], np.int32), 8)
    gt = jax.tree.map(lambda x: jnp.asarray(x)[None], gt)
    t = fovea_targets(ctx, gt, 4)
    pos = np.asarray(t.pos_mask[0])
    idx = int(np.flatnonzero(pos)[0])
    base = 16.0 if idx < ctx.num_level_points[0] else 32.0
    pt = ctx.points[idx]
    e = np.exp(np.asarray(t.bbox_targets[0][idx]))
    rec = [pt[0] - base * e[0], pt[1] - base * e[1],
           pt[0] + base * e[2], pt[1] + base * e[3]]
    np.testing.assert_allclose(rec, gt_box, atol=1.0)


def test_bucketing_coder_roundtrip():
    """SABL bucketing coder: encode labels point at the nearest bucket and
    a perfect prediction decodes back to the gt box
    (bucketing_bbox_coder.py)."""
    from erd_tpu.task.bucketing import (bucket_decode, bucket_encode)
    proposals = jnp.asarray([[10., 10., 50., 50.], [0., 0., 30., 60.]])
    gt = jnp.asarray([[12., 14., 46., 48.], [2., 5., 28., 55.]])
    offs, ow, labels, cw = bucket_encode(proposals, gt, num_buckets=14,
                                         scale_factor=1.0)
    side = offs.shape[-1] // 4
    # nearest-bucket labels are one-hot per side
    lab4 = np.asarray(labels).reshape(2, 4, side)
    assert (lab4.sum(-1) == 1).all()
    # weights: exactly the top-k(<=2) buckets carry offset weight
    ow4 = np.asarray(ow).reshape(2, 4, side)
    assert ((ow4.sum(-1) >= 1) & (ow4.sum(-1) <= 2)).all()
    # perfect predictions: cls = labels as logits, offsets = targets
    boxes, conf = bucket_decode(proposals, labels * 20.0, offs,
                                num_buckets=14, scale_factor=1.0)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(gt),
                               atol=1e-3)
    assert (np.asarray(conf) > 0.9).all()


def test_score_hlr_sampler_prefers_hard_negatives():
    from erd_tpu.task.samplers import score_hlr_sample
    rng = jax.random.PRNGKey(0)
    n = 100
    pos = jnp.zeros(n, bool).at[:4].set(True)
    neg = ~pos
    scores = jnp.zeros(n).at[4:14].set(0.9)  # 10 hard negatives
    res, w = score_hlr_sample(rng, pos, neg, scores, num=16,
                              pos_fraction=0.25)
    neg_sel = np.asarray(res.idx[4:])
    hard = ((neg_sel >= 4) & (neg_sel < 14)).sum()
    assert hard == 10  # all hard negatives drawn before easy ones


def test_guided_anchoring_loc_and_shape():
    """GA kit: loc center/ignore routing + shape bounded-IoU loss
    (guided_anchor_head.py)."""
    import numpy as np
    from erd_tpu.models.heads.fcos_head import FCOSPointContext
    from erd_tpu.models.heads.guided_anchor_head import (ga_loc_targets,
                                                         ga_losses,
                                                         ga_shape_targets)
    from erd_tpu.structures import GTInstances
    ctx = FCOSPointContext.build((64, 96))
    pts = jnp.asarray(ctx.points)
    strides = jnp.asarray(ctx.strides)
    gt_b = jnp.asarray([[16., 16., 80., 60.]])  # scale ~53 -> level 0
    gt_m = jnp.asarray([True])
    labels = np.asarray(ga_loc_targets(pts, strides,
                                       ctx.num_level_points, gt_b, gt_m))
    assert (labels == 1).sum() > 0          # center region positive
    assert (labels == -1).sum() > 0         # ignore ring + adjacent level
    # positives confined to one level, ignores spill to neighbors
    lvl = np.repeat(np.arange(len(ctx.num_level_points)),
                    ctx.num_level_points)
    assert len(set(lvl[labels == 1])) == 1
    best, pos = ga_shape_targets(pts, strides, gt_b, gt_m)
    assert bool(np.asarray(pos).any())

    gt = GTInstances.pad(np.asarray(gt_b), np.asarray([0], np.int32), 8)
    gt = jax.tree.map(lambda x: jnp.asarray(x)[None], gt)
    loc = jnp.zeros((1, pts.shape[0]))
    shp = jnp.zeros((1, pts.shape[0], 2))
    losses = ga_losses(pts, strides, ctx.num_level_points, loc, shp, gt)
    assert float(losses['loss_loc']) > 0
    assert float(losses['loss_shape']) > 0


def test_ga_head_net_forward():
    from erd_tpu.models.heads.guided_anchor_head import GARPNHeadNet
    net = GARPNHeadNet(feat_channels=16)
    feats = [jnp.zeros((1, 8, 12, 16)), jnp.zeros((1, 4, 6, 16))]
    v = net.init(jax.random.PRNGKey(0), feats)
    locs, shapes, clss, regs = net.apply(v, feats)
    assert locs[0].shape == (1, 8, 12, 1)
    assert shapes[0].shape == (1, 8, 12, 2)
    assert clss[1].shape == (1, 4, 6, 1)
    assert regs[1].shape == (1, 4, 6, 4)


def test_garpn_detector_loss_and_predict():
    """Proposal-only GA-RPN: GA losses + rpn cls/reg; predictions are
    class-0 proposals in the fixed DetResults layout."""
    import jax
    import numpy as np
    from erd_tpu.models.detectors.ga_faster_rcnn import GARPNDetector
    from tests.test_models import make_batch
    det = GARPNDetector(num_classes=4, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    batch = make_batch(h=64, w=96, gts=[([[10, 10, 60, 50]], [1]),
                                        ([[5, 5, 40, 40]], [0])])
    losses = det.loss_jit(variables, batch)
    for k in ('loss_loc', 'loss_shape', 'loss_rpn_cls', 'loss_rpn_bbox'):
        assert np.isfinite(float(losses[k])), (k, losses)
    assert float(losses['loss_loc']) > 0
    res = det.predict_jit(variables, batch)
    assert res.bboxes.shape[1:] == (300, 4)
    assert bool((np.asarray(res.labels) == 0).all())


def test_cascade_rpn_offsets_and_region_assign():
    """anchor_offsets: a 2*stride square anchor centered on its cell is
    exactly the regular 3x3 grid (all-zero offsets); region_assign
    routes the gt to its scale level with a positive core."""
    import jax.numpy as jnp
    import numpy as np
    from erd_tpu.models.heads.cascade_rpn_head import (anchor_offsets,
                                                       region_assign,
                                                       square_anchors)
    pts = jnp.asarray([[2.0, 2.0], [6.0, 2.0]])
    strides = jnp.asarray([4.0, 4.0])
    sq = square_anchors(pts, strides, scale=2.0)  # side 8 = 2*stride
    off = anchor_offsets(sq, pts, strides)
    # reference convention (cascade_rpn_head.py _ctr_offset): deform taps
    # live on INTEGER cell indices while anchor centers are at cell+0.5,
    # so a centered 2*stride square anchor gives a uniform +0.5 offset
    np.testing.assert_allclose(np.asarray(off), 0.5, atol=1e-6)
    # shifting the anchor one stride in x adds exactly +1 cell in x only
    shifted = sq + jnp.asarray([4.0, 0.0, 4.0, 0.0])
    off2 = anchor_offsets(shifted, pts, strides)
    np.testing.assert_allclose(np.asarray(off2[..., 1]), 1.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(off2[..., 0]), 0.5, atol=1e-6)

    # region assign: single level, gt core covers only its center cells
    h = w = 8
    xs = (np.arange(w) + 0.5) * 4.0
    ys = (np.arange(h) + 0.5) * 4.0
    gx, gy = np.meshgrid(xs, ys)
    points = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1))
    st = jnp.full((h * w,), 4.0)
    gt = jnp.asarray([[4.0, 4.0, 28.0, 28.0]])
    labels, gt_idx = region_assign(points, st, (h * w,), gt,
                                   jnp.asarray([True]), (4.0,))
    labels = np.asarray(labels).reshape(h, w)
    assert (labels == 1).sum() > 0
    # the core (ratio .2 of a 24px box ~ 4.8px around center 16,16)
    assert labels[3, 3] == 1 and labels[4, 4] == 1
    assert labels[0, 0] == 0  # far corner is a clean negative
    assert (np.asarray(gt_idx) == 0).all()
