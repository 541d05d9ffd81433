"""ATSS assigner parity vs a numpy oracle implementing the reference
algorithm (atss_assigner.py:74-254)."""
import numpy as np
import jax.numpy as jnp

from erd_tpu.task import AnchorGenerator, atss_assign, featmap_sizes_for
from tests.conftest import rand_boxes


def np_iou(b1, b2, eps=1e-6):
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area1[:, None] + area2[None, :] - inter, eps)


def np_atss(anchors, num_level, gts, topk=9):
    """Reference-faithful numpy ATSS (dynamic shapes, test oracle only)."""
    n, g = len(anchors), len(gts)
    overlaps = np_iou(anchors, gts)
    acx = (anchors[:, 0] + anchors[:, 2]) / 2
    acy = (anchors[:, 1] + anchors[:, 3]) / 2
    gcx = (gts[:, 0] + gts[:, 2]) / 2
    gcy = (gts[:, 1] + gts[:, 3]) / 2
    dist = np.sqrt((acx[:, None] - gcx[None, :])**2 +
                   (acy[:, None] - gcy[None, :])**2)
    cand = []
    start = 0
    for nl in num_level:
        k = min(topk, nl)
        d = dist[start:start + nl]
        idx = np.argsort(d, axis=0, kind='stable')[:k]
        cand.append(idx + start)
        start += nl
    cand = np.concatenate(cand, axis=0)  # (K, G)
    cols = np.arange(g)
    c_ov = overlaps[cand, cols[None, :]]
    thr = c_ov.mean(0) + c_ov.std(0, ddof=1)
    is_pos = c_ov >= thr[None, :]
    l_ = acx[cand] - gts[None, :, 0] if False else None  # noqa
    cx = acx[cand]
    cy = acy[cand]
    l_ = cx - gts[None, :, 0]
    t_ = cy - gts[None, :, 1]
    r_ = gts[None, :, 2] - cx
    b_ = gts[None, :, 3] - cy
    in_gt = np.stack([l_, t_, r_, b_], 1).min(1) > 0.01
    is_pos = is_pos & in_gt
    INF = 1e8
    ov_inf = np.full((n, g), -INF)
    for j in range(g):
        rows = cand[is_pos[:, j], j]
        ov_inf[rows, j] = overlaps[rows, j]
    mx = ov_inf.max(1)
    am = ov_inf.argmax(1)
    assigned = np.where(mx > -INF, am, -1)
    return assigned, mx


def test_atss_matches_oracle(rng):
    gen = AnchorGenerator()
    sizes = featmap_sizes_for((160, 224), gen.strides)
    anchors = gen.flat_anchors(sizes)
    nla = gen.num_level_anchors(sizes)
    for trial in range(4):
        g = rng.randint(1, 7)
        gts = rand_boxes(rng, g, w=224, h=160, min_size=10)
        labels = rng.randint(0, 5, g).astype(np.int32)
        # pad to MAX_GT=8
        G = 8
        gtp = np.zeros((G, 4), np.float32)
        gtp[:g] = gts
        lp = np.zeros((G,), np.int32)
        lp[:g] = labels
        maskp = np.zeros(G, bool)
        maskp[:g] = True

        res = atss_assign(jnp.asarray(anchors), nla, jnp.asarray(gtp),
                          jnp.asarray(lp), jnp.asarray(maskp))
        want_assign, want_mx = np_atss(anchors, nla, gts)

        got_pos = np.asarray(res.pos_mask)
        got_gt = np.asarray(res.gt_idx)
        want_pos = want_assign >= 0
        np.testing.assert_array_equal(got_pos, want_pos)
        np.testing.assert_array_equal(got_gt[got_pos], want_assign[want_pos])
        np.testing.assert_array_equal(
            np.asarray(res.labels)[got_pos], labels[want_assign[want_pos]])


def test_atss_no_gt():
    gen = AnchorGenerator()
    sizes = featmap_sizes_for((64, 64), gen.strides)
    anchors = gen.flat_anchors(sizes)
    nla = gen.num_level_anchors(sizes)
    G = 4
    res = atss_assign(jnp.asarray(anchors), nla,
                      jnp.zeros((G, 4)), jnp.zeros((G,), jnp.int32),
                      jnp.zeros((G,), bool))
    assert not np.asarray(res.pos_mask).any()


def test_atss_valid_flags_exclude(rng):
    """Anchors marked invalid must never become positive."""
    gen = AnchorGenerator()
    sizes = featmap_sizes_for((160, 224), gen.strides)
    anchors = gen.flat_anchors(sizes)
    nla = gen.num_level_anchors(sizes)
    gts = rand_boxes(rng, 3, w=224, h=160, min_size=20)
    G = 4
    gtp = np.zeros((G, 4), np.float32)
    gtp[:3] = gts
    maskp = np.zeros(G, bool)
    maskp[:3] = True
    valid = np.zeros(len(anchors), bool)  # nothing valid
    res = atss_assign(jnp.asarray(anchors), nla, jnp.asarray(gtp),
                      jnp.zeros((G,), jnp.int32), jnp.asarray(maskp),
                      valid_flags=jnp.asarray(valid))
    assert not np.asarray(res.pos_mask).any()


def test_anchor_generator_values():
    gen = AnchorGenerator()
    base = gen.base_anchors(8)
    np.testing.assert_allclose(base, [[-32, -32, 32, 32]])
    grid = gen.grid_anchors([(2, 3)])[0]
    assert grid.shape == (6, 4)
    # second cell of first row shifted by stride (level 0 -> stride 8)
    np.testing.assert_allclose(grid[1] - grid[0], [8, 0, 8, 0])


def test_sim_ota_basic(rng):
    """SimOTA: priors inside a gt's center region with good predictions get
    assigned; dynamic-k respected."""
    import jax
    from erd_tpu.task import sim_ota_assign

    n, g, c = 200, 3, 5
    pts = rand_boxes(rng, n, w=200, h=200)[:, :2]
    strides = np.full(n, 8.0, np.float32)
    gts = np.asarray([[20, 20, 80, 80], [100, 100, 180, 160],
                      [0, 0, 0, 0]], np.float32)
    mask = np.asarray([True, True, False])
    labels = np.asarray([1, 3, 0], np.int32)
    # predicted boxes: perfect for priors whose center is inside a gt
    decoded = np.tile(pts, (1, 2)).astype(np.float32)
    for i in range(n):
        for j in range(2):
            if (gts[j, 0] <= pts[i, 0] <= gts[j, 2] and
                    gts[j, 1] <= pts[i, 1] <= gts[j, 3]):
                decoded[i] = gts[j]
    scores = np.full((n, c), 0.5, np.float32)

    res = jax.jit(lambda *a: sim_ota_assign(*a))(
        jnp.asarray(pts), jnp.asarray(strides), jnp.asarray(decoded),
        jnp.asarray(scores), jnp.asarray(gts), jnp.asarray(labels),
        jnp.asarray(mask))
    pos = np.asarray(res.pos_mask)
    gi = np.asarray(res.gt_idx)
    assert pos.sum() > 0
    assert set(gi[pos].tolist()) <= {0, 1}  # never the padded gt
    lab = np.asarray(res.labels)
    assert set(lab[pos].tolist()) <= {1, 3}
    # every positive prior center lies inside its assigned gt box
    for i in np.where(pos)[0]:
        b = gts[gi[i]]
        assert b[0] <= pts[i, 0] <= b[2] and b[1] <= pts[i, 1] <= b[3]


def test_task_aligned_assign(rng):
    import jax
    from erd_tpu.task import task_aligned_assign

    n, g, c = 150, 2, 4
    pts = rand_boxes(rng, n, w=200, h=200)[:, :2]
    gts = np.asarray([[20, 20, 100, 100], [120, 120, 190, 190]],
                     np.float32)
    labels = np.asarray([0, 2], np.int32)
    mask = np.asarray([True, True])
    decoded = np.tile(pts, (1, 2)).astype(np.float32)
    decoded[:, :2] -= 10
    decoded[:, 2:] += 10
    scores = np.full((n, c), 0.5, np.float32)
    res = jax.jit(lambda *a: task_aligned_assign(*a))(
        jnp.asarray(pts), jnp.asarray(decoded), jnp.asarray(scores),
        jnp.asarray(gts), jnp.asarray(labels), jnp.asarray(mask))
    pos = np.asarray(res.pos_mask)
    gi = np.asarray(res.gt_idx)
    assert pos.sum() > 0
    # at most topk=13 positives per gt
    for j in range(g):
        assert (gi[pos] == j).sum() <= 13
    # all positive centers strictly inside the assigned gt
    for i in np.where(pos)[0]:
        b = gts[gi[i]]
        assert b[0] < pts[i, 0] < b[2] and b[1] < pts[i, 1] < b[3]
