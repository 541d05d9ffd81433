#!/usr/bin/env python
"""A/B the pre-NMS candidate cap on synthetic crowded scenes.

Measures the mAP-risk of ``GFLTestConfig.pre_nms_total`` (the reference
feeds up to num_levels*nms_pre ~ 5000 candidates into CUDA NMS;
gfl_head.py:478-480): generates cluster-structured candidate sets (many
overlapping boxes per object, COCO-crowded statistics), runs
cap -> batched NMS -> top-100 at several caps, and reports object recall
plus agreement with the uncapped pipeline. Results recorded in
docs/ROUND2.md.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def make_crowded_scene(rs, n_objects=120, cands_per_obj=60, noise=4000,
                       w=1333, h=800, n_classes=8):
    """Cluster candidates around n_objects 'true' boxes + background noise.

    Per-object candidate scores decay with jitter so the best candidate is
    usually (not always) the tightest box; noise candidates get low scores
    typical of post-score_thr survivors.
    """
    objs = []
    for _ in range(n_objects):
        cx, cy = rs.uniform(0, w), rs.uniform(0, h)
        bw, bh = rs.uniform(20, 120), rs.uniform(20, 120)
        objs.append((cx, cy, bw, bh, rs.randint(n_classes)))
    boxes, scores, labels, obj_id = [], [], [], []
    for i, (cx, cy, bw, bh, c) in enumerate(objs):
        for _ in range(cands_per_obj):
            jx, jy = rs.normal(0, bw * 0.08), rs.normal(0, bh * 0.08)
            jw, jh = bw * rs.uniform(0.85, 1.15), bh * rs.uniform(0.85,
                                                                  1.15)
            x1 = np.clip(cx + jx - jw / 2, 0, w)
            y1 = np.clip(cy + jy - jh / 2, 0, h)
            boxes.append([x1, y1, min(x1 + jw, w), min(y1 + jh, h)])
            scores.append(np.clip(rs.beta(4, 6), 0.05, 1.0))
            labels.append(c)
            obj_id.append(i)
    for _ in range(noise):
        x1, y1 = rs.uniform(0, w - 30), rs.uniform(0, h - 30)
        bw, bh = rs.uniform(10, 80), rs.uniform(10, 80)
        boxes.append([x1, y1, min(x1 + bw, w), min(y1 + bh, h)])
        scores.append(np.clip(rs.beta(1.2, 14), 0.05, 0.6))
        labels.append(rs.randint(n_classes))
        obj_id.append(-1)
    return (np.asarray(boxes, np.float32), np.asarray(scores, np.float32),
            np.asarray(labels, np.int32), np.asarray(obj_id, np.int64),
            objs)


def run(cap, boxes, scores, labels, max_per_img=100, iou=0.6):
    import jax.numpy as jnp
    from erd_tpu.ops import cap_candidates, nms_select
    valid = jnp.ones(scores.shape[0], bool)
    s, v, b, l2 = cap_candidates(jnp.asarray(scores), valid, cap,
                                 jnp.asarray(boxes), jnp.asarray(labels))
    ob, os_, ol, om = nms_select(b, s, l2, iou, max_per_img, valid_mask=v)
    m = np.asarray(om)
    return np.asarray(ob)[m], np.asarray(os_)[m], np.asarray(ol)[m]


def object_recall(dets, det_labels, objs, thr=0.5):
    """Fraction of true objects matched by some kept det (IoU>thr, class)."""
    hit = 0
    for (cx, cy, bw, bh, c) in objs:
        tb = np.asarray([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                         cy + bh / 2])
        same = det_labels == c
        if not same.any():
            continue
        d = dets[same]
        lt = np.maximum(d[:, :2], tb[:2])
        rb = np.minimum(d[:, 2:], tb[2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        union = ((d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1]) +
                 bw * bh - inter)
        if (inter / np.maximum(union, 1e-9) > thr).any():
            hit += 1
    return hit / len(objs)


def main():
    rs = np.random.RandomState(0)
    caps = [1000, 2000, 5000, 20000]
    recalls = {c: [] for c in caps}
    agree = {c: [] for c in caps}
    for trial in range(5):
        boxes, scores, labels, _, objs = make_crowded_scene(rs)
        ref_d, ref_s, ref_l = run(len(scores), boxes, scores, labels)
        ref_key = {tuple(np.round(b, 2)) for b in ref_d}
        for cap in caps:
            d, s, l2 = run(cap, boxes, scores, labels)
            recalls[cap].append(object_recall(d, l2, objs))
            inter = sum(tuple(np.round(b, 2)) in ref_key for b in d)
            agree[cap].append(inter / max(len(ref_d), 1))
    out = {f'cap_{c}': {
        'object_recall': round(float(np.mean(recalls[c])), 4),
        'top100_agreement_vs_uncapped': round(float(np.mean(agree[c])), 4)}
        for c in caps}
    out['n_candidates'] = int(len(scores))
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
