"""Bucketing box coder (SABL), dense/static-shape.

Behavioural mirror of
/root/reference/mmdet/models/task_modules/coders/bucketing_bbox_coder.py:
proposals are rescaled by ``scale_factor`` about their center and divided
into ``num_buckets`` per axis; each side (l/r/t/d) is localized by (i) a
per-bucket classification over the ``side_num = ceil(num_buckets/2)``
candidate bucket lines counted inward from that side and (ii) a fine
offset from the chosen bucket line, normalized by the bucket width.
Encoding emits one-hot bucket labels (the second-nearest bucket ignored
when within one bucket, cls_ignore_neighbor) and top-k(=2) offset targets
(the 2nd gated by offset_upperbound); decoding softmaxes the side scores,
takes the best bucket line and subtracts its predicted offset
(bucket2bbox), returning boxes + the mean top-score localization
confidence.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def bbox_rescale(boxes, scale_factor):
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = (boxes[..., 2] - boxes[..., 0]) * scale_factor
    h = (boxes[..., 3] - boxes[..., 1]) * scale_factor
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


def _buckets(proposals, num_buckets, scale_factor):
    p = bbox_rescale(proposals, scale_factor)
    side = int(math.ceil(num_buckets / 2.0))
    pw = p[..., 2] - p[..., 0]
    ph = p[..., 3] - p[..., 1]
    bw = pw / num_buckets
    bh = ph / num_buckets
    steps = 0.5 + jnp.arange(side, dtype=jnp.float32)
    l_b = p[..., 0:1] + steps[None] * bw[..., None]
    r_b = p[..., 2:3] - steps[None] * bw[..., None]
    t_b = p[..., 1:2] + steps[None] * bh[..., None]
    d_b = p[..., 3:4] - steps[None] * bh[..., None]
    return bw, bh, l_b, r_b, t_b, d_b


def bucket_encode(proposals, gt, num_buckets=14, scale_factor=3.0,
                  offset_topk=2, offset_upperbound=1.0,
                  cls_ignore_neighbor=True):
    """(n, 4) x2 -> (offsets, offset_weights, labels, cls_weights),
    each (n, 4*side)."""
    bw, bh, l_b, r_b, t_b, d_b = _buckets(proposals, num_buckets,
                                          scale_factor)
    offs = [
        (l_b - gt[..., 0:1]) / bw[..., None],
        (r_b - gt[..., 2:3]) / bw[..., None],
        (t_b - gt[..., 1:2]) / bh[..., None],
        (d_b - gt[..., 3:4]) / bh[..., None],
    ]
    side = l_b.shape[-1]
    out_off, out_ow, out_lab, out_cw = [], [], [], []
    for o in offs:
        a = jnp.abs(o)
        topv, topi = jax.lax.top_k(-a, min(offset_topk, side))
        topv = -topv
        ow = jnp.zeros_like(o)
        n_idx = jnp.arange(o.shape[0])
        for k in range(min(offset_topk, side)):
            w_k = 1.0 if k == 0 else (topv[:, k] <
                                      offset_upperbound).astype(o.dtype)
            ow = ow.at[n_idx, topi[:, k]].set(w_k)
        lab = jax.nn.one_hot(topi[:, 0], side, dtype=o.dtype)
        cw = jnp.ones_like(o)
        if cls_ignore_neighbor and side > 1:
            ignore = (topv[:, 1] < 1.0).astype(o.dtype)
            cw = cw.at[n_idx, topi[:, 1]].set(1.0 - ignore)
        out_off.append(o)
        out_ow.append(ow)
        out_lab.append(lab)
        out_cw.append(cw)
    return (jnp.concatenate(out_off, -1), jnp.concatenate(out_ow, -1),
            jnp.concatenate(out_lab, -1), jnp.concatenate(out_cw, -1))


def bucket_decode(proposals, cls_preds, offset_preds, num_buckets=14,
                  scale_factor=3.0, max_shape=None):
    """cls/offset (n, 4*side) -> (boxes (n, 4), loc_confidence (n,))."""
    n = proposals.shape[0]
    side = cls_preds.shape[-1] // 4
    bw, bh, l_b, r_b, t_b, d_b = _buckets(proposals, num_buckets,
                                          scale_factor)
    cls4 = cls_preds.reshape(n, 4, side)
    off4 = offset_preds.reshape(n, 4, side)
    scores = jax.nn.softmax(cls4, axis=-1)
    top2, idx2 = jax.lax.top_k(scores, min(2, side))
    best = idx2[..., 0]                                   # (n, 4)
    n_idx = jnp.arange(n)
    lines = jnp.stack([
        l_b[n_idx, best[:, 0]], r_b[n_idx, best[:, 1]],
        t_b[n_idx, best[:, 2]], d_b[n_idx, best[:, 3]]], axis=-1)
    o = jnp.stack([off4[n_idx, 0, best[:, 0]],
                   off4[n_idx, 1, best[:, 1]],
                   off4[n_idx, 2, best[:, 2]],
                   off4[n_idx, 3, best[:, 3]]], axis=-1)
    scale = jnp.stack([bw, bw, bh, bh], axis=-1)
    sides = lines - o * scale                             # l, r, t, d
    boxes = jnp.stack([sides[:, 0], sides[:, 2], sides[:, 1],
                       sides[:, 3]], axis=-1)
    if max_shape is not None:
        # reference bucket2bbox clamps to max_shape - 1 (:351-355)
        h, w = max_shape[0], max_shape[1]
        boxes = jnp.clip(boxes, 0, jnp.stack([w - 1, h - 1, w - 1, h - 1])
                         .astype(boxes.dtype))
    # bucketing-guided rescoring (:359-363): add the runner-up bucket's
    # score when it is the best bucket's immediate neighbor
    conf = top2[..., 0]
    if side > 1:
        neighbor = (jnp.abs(idx2[..., 0] - idx2[..., 1]) == 1)
        conf = conf + top2[..., 1] * neighbor.astype(conf.dtype)
    conf = conf.mean(axis=-1)
    return boxes, conf


class BucketingBBoxCoder:
    def __init__(self, num_buckets=14, scale_factor=3.0, offset_topk=2,
                 offset_upperbound=1.0, cls_ignore_neighbor=True):
        self.num_buckets = num_buckets
        self.scale_factor = scale_factor
        self.offset_topk = offset_topk
        self.offset_upperbound = offset_upperbound
        self.cls_ignore_neighbor = cls_ignore_neighbor

    def encode(self, proposals, gt):
        return bucket_encode(proposals, gt, self.num_buckets,
                             self.scale_factor, self.offset_topk,
                             self.offset_upperbound,
                             self.cls_ignore_neighbor)

    def decode(self, proposals, cls_preds, offset_preds, max_shape=None):
        return bucket_decode(proposals, cls_preds, offset_preds,
                             self.num_buckets, self.scale_factor,
                             max_shape)
