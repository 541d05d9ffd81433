#!/usr/bin/env python
"""Generate a tiny on-disk synthetic COCO dataset (colored rectangles) for
smoke-testing the full CLI workflow without real data.

Usage: python tools/make_toy_dataset.py [out_dir]
Writes train/ val/ annotations/ and a ready-to-run config 'toy_gfl.py'.
"""
import json
import os
import sys

import numpy as np

CONFIG = """# auto-generated toy config (tools/make_toy_dataset.py)
train_cfg = dict(epochs=2, val_interval=2)
optim = dict(lr=0.01, momentum=0.9, weight_decay=1e-4, warmup_iters=5,
             warmup_factor=0.01, milestones_epochs=(), gamma=0.1,
             grad_clip=35.0)
auto_scale_lr = dict(enable=False)
log_interval = 2
ckpt_interval_epochs = 2
work_dir = '{root}/work'
seed = 0
resume = False
data_root = '{root}/'
model = dict(type='GFL', num_classes=2, depth=18, compute_dtype='float32',
             frozen_stages=-1,
             test_cfg=dict(score_thr=0.05, nms_pre=1000,
                           nms_iou_threshold=0.6, max_per_img=100))
train_dataloader = dict(
    batch_size=4, num_workers=2, seed=0, drop_last=True, shuffle=True,
    dataset=dict(ann_file='annotations/train.json', img_prefix='train/',
                 min_size=8),
    pipeline=dict(scale=(96, 64), flip_prob=0.5, max_gt=8))
val_dataloader = dict(
    batch_size=4, num_workers=2, drop_last=False, shuffle=False,
    dataset=dict(ann_file='annotations/val.json', img_prefix='val/'),
    pipeline=dict(scale=(96, 64), flip_prob=0.0, max_gt=8))
val_evaluator = dict(classwise=False)
test_dataloader = val_dataloader
test_evaluator = dict(classwise=True)
"""


def main(root='/tmp/toy_coco', seed=0):
    import cv2
    rs = np.random.RandomState(seed)
    for sub in ('train', 'val', 'annotations'):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    colors = [(255, 60, 60), (60, 60, 255)]

    def make_split(split, n):
        images, anns = [], []
        aid = 1
        for i in range(1, n + 1):
            w, h = 96, 64
            img = np.full((h, w, 3), 110, np.uint8)
            for _ in range(rs.randint(1, 3)):
                bw, bh = rs.randint(20, 40), rs.randint(16, 30)
                x1, y1 = rs.randint(0, w - bw), rs.randint(0, h - bh)
                c = rs.randint(2)
                img[y1:y1 + bh, x1:x1 + bw] = colors[c]
                anns.append({'id': aid, 'image_id': i,
                             'category_id': c + 1,
                             'bbox': [int(x1), int(y1), int(bw), int(bh)],
                             'area': int(bw * bh), 'iscrowd': 0})
                aid += 1
            cv2.imwrite(os.path.join(root, split, f'{i}.jpg'), img)
            images.append({'id': i, 'file_name': f'{i}.jpg',
                           'width': w, 'height': h})
        with open(os.path.join(root, 'annotations',
                               f'{split}.json'), 'w') as f:
            json.dump({'images': images, 'annotations': anns,
                       'categories': [{'id': 1, 'name': 'person'},
                                      {'id': 2, 'name': 'bicycle'}]}, f)

    make_split('train', 16)
    make_split('val', 8)
    with open(os.path.join(root, 'toy_gfl.py'), 'w') as f:
        f.write(CONFIG.format(root=root))
    print(f'toy dataset + config written under {root}')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/toy_coco')
