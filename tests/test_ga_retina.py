"""GA-RetinaNet oracles: loc-target painting vs a line-faithful replica of
the reference (guided_anchor_head.py:395-499 + utils calc_region), the
guided-anchor decode formula, and the approx anchor set vs mmdet's
AnchorGenerator math."""
import jax
import jax.numpy as jnp
import numpy as np

from erd_tpu.models.heads.guided_anchor_head import (
    RETINA_OCTAVE_SCALE, approx_wh_factors, ga_loc_targets, guided_anchors)
from erd_tpu.models.detectors.ga_faster_rcnn import GAPointContext

STRIDES = (8, 16, 32, 64, 128)


def _calc_region(bbox, ratio, fh, fw):
    """mmdet mmdet/models/utils/misc calc_region: inclusive cell rect."""
    x1 = int(np.clip(round((1 - ratio) * bbox[0] + ratio * bbox[2]), 0,
                     fw - 1))
    y1 = int(np.clip(round((1 - ratio) * bbox[1] + ratio * bbox[3]), 0,
                     fh - 1))
    x2 = int(np.clip(round(ratio * bbox[0] + (1 - ratio) * bbox[2]), 0,
                     fw - 1))
    y2 = int(np.clip(round(ratio * bbox[1] + (1 - ratio) * bbox[3]), 0,
                     fh - 1))
    return x1, y1, x2, y2


def oracle_loc_targets(image_shape, gt_bboxes, octave_scale,
                       center_ratio=0.2, ignore_ratio=0.5):
    """Reference ga_loc_targets painting; returns flat labels 1/0/-1."""
    sizes = [(int(np.ceil(image_shape[0] / s)),
              int(np.ceil(image_shape[1] / s))) for s in STRIDES]
    tgt = [np.zeros(sz, np.float32) for sz in sizes]
    wgt = [np.full(sz, -1.0, np.float32) for sz in sizes]
    ign = [np.zeros(sz, np.float32) for sz in sizes]
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    min_size = octave_scale * STRIDES[0]
    for gt in gt_bboxes:
        scale = np.sqrt((gt[2] - gt[0]) * (gt[3] - gt[1]))
        lvl = int(np.clip(np.floor(np.log2(scale) - np.log2(min_size)
                                   + 0.5), 0, len(STRIDES) - 1))
        g = np.asarray(gt) / STRIDES[lvl]
        fh, fw = sizes[lvl]
        ix1, iy1, ix2, iy2 = _calc_region(g, r2, fh, fw)
        cx1, cy1, cx2, cy2 = _calc_region(g, r1, fh, fw)
        tgt[lvl][cy1:cy2 + 1, cx1:cx2 + 1] = 1
        wgt[lvl][iy1:iy2 + 1, ix1:ix2 + 1] = 0
        wgt[lvl][cy1:cy2 + 1, cx1:cx2 + 1] = 1
        for d in (lvl - 1, lvl + 1):
            if 0 <= d < len(STRIDES):
                g = np.asarray(gt) / STRIDES[d]
                fh, fw = sizes[d]
                ix1, iy1, ix2, iy2 = _calc_region(g, r2, fh, fw)
                ign[d][iy1:iy2 + 1, ix1:ix2 + 1] = 1
    labels = []
    for t, w, im in zip(tgt, wgt, ign):
        w = w.copy()
        w[(w < 0) & (im > 0)] = 0
        w[w < 0] = 0.1
        lab = np.where(t > 0, 1, np.where(w == 0, -1, 0))
        labels.append(lab.reshape(-1))
    return np.concatenate(labels)


def oracle_loc_targets_continuous(points, point_strides, gt_bboxes,
                                  octave_scale, center_ratio=0.2,
                                  ignore_ratio=0.5):
    """The reference protocol in continuous point coordinates (our
    implementation's claimed semantics): same level routing, same r1/r2
    regions, same adjacent-level ignore painting, same pos>ignore>neg
    precedence — independent numpy re-derivation."""
    lvl_strides = np.asarray(sorted(set(point_strides.tolist())))
    lvl_of = np.searchsorted(lvl_strides, point_strides)
    min_size = octave_scale * lvl_strides[0]
    labels = np.zeros(len(points), np.int64)
    ign = np.zeros(len(points), bool)
    pos = np.zeros(len(points), bool)
    for g in gt_bboxes:
        scale = np.sqrt(max((g[2] - g[0]) * (g[3] - g[1]), 1.0))
        lvl = int(np.clip(np.floor(np.log2(scale) - np.log2(min_size)
                                   + 0.5), 0, len(lvl_strides) - 1))
        cx, cy = (g[0] + g[2]) / 2, (g[1] + g[3]) / 2
        w, h = g[2] - g[0], g[3] - g[1]

        def inside(frac):
            return ((np.abs(points[:, 0] - cx) <= w * frac / 2) &
                    (np.abs(points[:, 1] - cy) <= h * frac / 2))

        pos |= inside(center_ratio) & (lvl_of == lvl)
        ign |= inside(ignore_ratio) & (np.abs(lvl_of - lvl) <= 1)
    labels[ign] = -1
    labels[pos] = 1
    return labels


def test_loc_targets_match_continuous_oracle_exactly():
    rng = np.random.RandomState(0)
    ctx = GAPointContext.build((256, 320), strides=STRIDES)
    pts = jnp.asarray(ctx.points)
    strides = jnp.asarray(ctx.strides)
    for trial in range(5):
        n = rng.randint(1, 4)
        x1 = rng.uniform(0, 200, n)
        y1 = rng.uniform(0, 160, n)
        gt = np.stack([x1, y1, x1 + rng.uniform(16, 120, n),
                       y1 + rng.uniform(16, 96, n)], -1).astype(np.float32)
        ours = np.asarray(ga_loc_targets(
            pts, strides, ctx.num_level_points, jnp.asarray(gt),
            jnp.ones(n, bool), featmap_strides=STRIDES,
            octave_scale=RETINA_OCTAVE_SCALE))
        ref = oracle_loc_targets_continuous(
            np.asarray(ctx.points), np.asarray(ctx.strides), gt,
            RETINA_OCTAVE_SCALE)
        np.testing.assert_array_equal(ours, ref, err_msg=str(trial))


def test_loc_targets_near_reference_cell_painting():
    """vs the literal cell-painting oracle: every disagreement must sit
    within one cell of a continuous region boundary (the reference's
    round-to-cell can swell each region by up to half a cell; our
    point-in-region test is the unrounded semantics)."""
    rng = np.random.RandomState(0)
    ctx = GAPointContext.build((256, 320), strides=STRIDES)
    pts_np = np.asarray(ctx.points)
    strides_np = np.asarray(ctx.strides)
    lvl_strides = np.asarray(STRIDES, np.float32)
    lvl_of = np.searchsorted(lvl_strides, strides_np)
    for trial in range(5):
        n = rng.randint(1, 4)
        x1 = rng.uniform(0, 200, n)
        y1 = rng.uniform(0, 160, n)
        gt = np.stack([x1, y1, x1 + rng.uniform(16, 120, n),
                       y1 + rng.uniform(16, 96, n)], -1).astype(np.float32)
        ours = np.asarray(ga_loc_targets(
            jnp.asarray(pts_np), jnp.asarray(strides_np),
            ctx.num_level_points, jnp.asarray(gt), jnp.ones(n, bool),
            featmap_strides=STRIDES, octave_scale=RETINA_OCTAVE_SCALE))
        ref = oracle_loc_targets((256, 320), gt, RETINA_OCTAVE_SCALE)
        for idx in np.flatnonzero(ours != ref):
            p = pts_np[idx]
            s = strides_np[idx]
            near_boundary = False
            for g in gt:
                cx, cy = (g[0] + g[2]) / 2, (g[1] + g[3]) / 2
                w, h = g[2] - g[0], g[3] - g[1]
                for frac in (0.2, 0.5):
                    dx = abs(abs(p[0] - cx) - w * frac / 2)
                    dy = abs(abs(p[1] - cy) - h * frac / 2)
                    inx = abs(p[0] - cx) <= w * frac / 2 + s
                    iny = abs(p[1] - cy) <= h * frac / 2 + s
                    if (dx <= s and iny) or (dy <= s and inx):
                        near_boundary = True
            assert near_boundary, (trial, idx, p, s, ours[idx], ref[idx])
        assert (ours != ref).mean() < 0.03


def test_guided_anchor_formula_exact():
    """anchor = center +- 0.5 * sigma * stride * exp(d) — exact pin of
    guided_anchor_head.py anchor decode."""
    pts = jnp.asarray([[100., 60.], [40., 40.]])
    strides = jnp.asarray([8., 16.])
    shp = jnp.asarray([[0.5, -0.25], [0.0, 1.0]])
    out = np.asarray(guided_anchors(pts, strides, shp,
                                    octave_scale=4.0))
    for i in range(2):
        w = 4.0 * float(strides[i]) * np.exp(float(shp[i, 0]))
        h = 4.0 * float(strides[i]) * np.exp(float(shp[i, 1]))
        np.testing.assert_allclose(
            out[i], [float(pts[i, 0]) - w / 2, float(pts[i, 1]) - h / 2,
                     float(pts[i, 0]) + w / 2, float(pts[i, 1]) + h / 2],
            rtol=1e-6)


def test_approx_anchor_set_matches_mmdet_generator():
    """approx_wh_factors vs mmdet AnchorGenerator(octave_base_scale=4,
    scales_per_octave=3, ratios=[.5, 1, 2]): w = s*2^(i/3)/sqrt(r),
    h = s*2^(i/3)*sqrt(r) (anchor_generator.py gen_single_level_base_anchors
    with h_ratios=sqrt(ratios), w_ratios=1/sqrt(ratios))."""
    whs = approx_wh_factors(4.0, 3, (0.5, 1.0, 2.0))
    assert whs.shape == (9, 2)
    expect = []
    for i in range(3):
        s = 4.0 * 2 ** (i / 3)
        for r in (0.5, 1.0, 2.0):
            expect.append((s / np.sqrt(r), s * np.sqrt(r)))
    np.testing.assert_allclose(whs, np.asarray(expect), rtol=1e-6)


def test_ga_retina_predict_loc_filter_masks_scores():
    from erd_tpu.models.detectors.ga_retinanet import GARetinaNetDetector
    from tests.test_models import make_batch
    det = GARetinaNetDetector(num_classes=4, depth=18,
                              loc_filter_thr=0.99)  # filter everything
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    res = det.predict_jit(variables, make_batch(h=64, w=96))
    assert not bool(res.mask.any())  # all locations filtered -> no dets