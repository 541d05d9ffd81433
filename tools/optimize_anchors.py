"""K-means anchor optimization over a dataset's gt boxes.

Mirror of /root/reference/tools/analysis_tools/optimize_anchors.py
(k-means mode): cluster (w, h) of all training boxes at the train scale
with the IoU distance 1 - IoU(anchor, box), print the sorted anchors and
the average IoU (the YOLO anchor recipe).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import argparse

import numpy as np

from erd_tpu.apis.build import build_dataset
from erd_tpu.config import Config


def iou_wh(wh, anchors):
    inter = np.minimum(wh[:, None, 0], anchors[None, :, 0]) * \
        np.minimum(wh[:, None, 1], anchors[None, :, 1])
    union = wh[:, 0] * wh[:, 1]
    a = anchors[:, 0] * anchors[:, 1]
    return inter / np.clip(union[:, None] + a[None] - inter, 1e-9, None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--num-anchors', type=int, default=9)
    p.add_argument('--iters', type=int, default=100)
    p.add_argument('--input-size', type=int, nargs=2, default=[608, 608])
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg, cfg.train_dataloader,
                            cfg.get('data_root', ''))
    whs = []
    ih, iw = args.input_size
    for rec in dataset:
        if len(rec.bboxes) == 0:
            continue
        scale = min(iw / rec.width, ih / rec.height)
        wh = (rec.bboxes[:, 2:] - rec.bboxes[:, :2]) * scale
        whs.append(wh)
    wh = np.concatenate(whs)
    wh = wh[(wh > 1).all(axis=1)]
    rng = np.random.RandomState(0)
    anchors = wh[rng.choice(len(wh), args.num_anchors, replace=False)]
    for _ in range(args.iters):
        assign = iou_wh(wh, anchors).argmax(axis=1)
        new = np.stack([
            np.median(wh[assign == k], axis=0)
            if (assign == k).any() else anchors[k]
            for k in range(args.num_anchors)])
        if np.allclose(new, anchors):
            break
        anchors = new
    order = np.argsort(anchors.prod(axis=1))
    anchors = anchors[order]
    avg_iou = iou_wh(wh, anchors).max(axis=1).mean()
    print('anchors (w, h):')
    for a in anchors:
        print(f'  ({a[0]:.1f}, {a[1]:.1f})')
    print(f'average IoU: {avg_iou:.4f}')


if __name__ == '__main__':
    main()
