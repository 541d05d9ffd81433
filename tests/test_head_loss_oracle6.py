"""Head-family numerical parity vs in-test torch oracles (round-3, set 6).

FoveaBox target painting (fovea_head.py:305-382): per-level scale-range
gating, the shrunken-fovea integer cell rectangle (ceil/floor with the
-0.5 offset and clamps), descending-area paint order so the SMALLEST gt
wins contested cells, and log-space (l, t, r, b)/base_edge targets
clamped to [1/16, 16] with background cells at log(1)=0. The oracle
replays the reference's sequential painting loop; ours is a dense vmapped
argmin — they must agree cell-for-cell.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.test_head_loss_oracle import _pad_gt, _rand_gt


def t_fovea_paint(featmap_sizes, strides, base_edges, scale_ranges,
                  gb, gl, num_classes, sigma=0.4):
    """Line-faithful _get_targets_single; returns flattened per-level
    (labels, log targets) concatenated in level order."""
    areas = torch.sqrt((gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1]))
    out_labels, out_targets = [], []
    for (fh, fw), stride, base_len, (lo, hi) in zip(
            featmap_sizes, strides, base_edges, scale_ranges):
        labels = torch.full((fh, fw), num_classes, dtype=torch.long)
        tgts = torch.ones((fh, fw, 4))
        xs = (torch.arange(fw, dtype=torch.float32) + 0.5) * stride
        ys = (torch.arange(fh, dtype=torch.float32) + 0.5) * stride
        x = xs[None, :].expand(fh, fw)
        y = ys[:, None].expand(fh, fw)
        hit = ((areas >= lo) & (areas <= hi)).nonzero().flatten()
        if len(hit):
            order = torch.sort(-areas[hit])[1]
            hit = hit[order]
            g = gb[hit] / stride
            half_w = 0.5 * (g[:, 2] - g[:, 0])
            half_h = 0.5 * (g[:, 3] - g[:, 1])
            px1 = (g[:, 0] + (1 - sigma) * half_w - 0.5).ceil().long() \
                .clamp(0, fw - 1)
            px2 = (g[:, 0] + (1 + sigma) * half_w - 0.5).floor().long() \
                .clamp(0, fw - 1)
            py1 = (g[:, 1] + (1 - sigma) * half_h - 0.5).ceil().long() \
                .clamp(0, fh - 1)
            py2 = (g[:, 1] + (1 + sigma) * half_h - 0.5).floor().long() \
                .clamp(0, fh - 1)
            for a, b, c, d, lab, (x1, y1, x2, y2) in zip(
                    px1, py1, px2, py2, gl[hit], gb[hit]):
                labels[b:d + 1, a:c + 1] = lab
                tgts[b:d + 1, a:c + 1, 0] = \
                    (x[b:d + 1, a:c + 1] - x1) / base_len
                tgts[b:d + 1, a:c + 1, 1] = \
                    (y[b:d + 1, a:c + 1] - y1) / base_len
                tgts[b:d + 1, a:c + 1, 2] = \
                    (x2 - x[b:d + 1, a:c + 1]) / base_len
                tgts[b:d + 1, a:c + 1, 3] = \
                    (y2 - y[b:d + 1, a:c + 1]) / base_len
            tgts = tgts.clamp(1.0 / 16, 16.0)
        out_labels.append(labels.reshape(-1))
        out_targets.append(tgts.log().reshape(-1, 4))
    return torch.cat(out_labels), torch.cat(out_targets)


@pytest.mark.parametrize('seed', list(range(4)))
def test_fovea_targets_parity(seed):
    from erd_tpu.models.heads.fovea_head import (BASE_EDGES, SCALE_RANGES,
                                                 fovea_targets)
    from erd_tpu.models.heads.fcos_head import FCOSPointContext

    size, C = 256, 4  # big enough canvas that several levels get hits
    ctx = FCOSPointContext.build((size, size))
    rng = np.random.RandomState(seed + 50)
    n = rng.randint(1, 6)
    # spread areas so multiple scale ranges hit, incl. overlapping boxes
    boxes = []
    for _ in range(n):
        edge = rng.uniform(12, 200)
        x1 = rng.uniform(0, size - edge)
        y1 = rng.uniform(0, size - edge)
        ar = rng.uniform(0.6, 1.6)
        boxes.append([x1, y1, min(x1 + edge * ar, size),
                      min(y1 + edge, size)])
    boxes = np.asarray(boxes, np.float32)
    labels = rng.randint(0, C, n)

    gt = jax.tree.map(lambda *xs: jnp.stack(xs), _pad_gt(boxes, labels))
    tgts = fovea_targets(ctx, gt, num_classes=C)

    strides = [8, 16, 32, 64, 128][:len(ctx.featmap_sizes)]
    o_labels, o_t = t_fovea_paint(
        ctx.featmap_sizes, strides, BASE_EDGES, SCALE_RANGES,
        torch.tensor(boxes), torch.tensor(labels), C)

    np.testing.assert_array_equal(np.asarray(tgts.labels[0]),
                                  o_labels.numpy())
    got_t = np.asarray(tgts.bbox_targets[0])
    # ours zeroes background rows; the oracle leaves log(1)=0 there too
    np.testing.assert_allclose(got_t, o_t.numpy(), rtol=1e-5, atol=1e-5)
    assert (o_labels != C).sum() > 0  # non-vacuous
