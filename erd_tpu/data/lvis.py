"""LVIS v1 dataset.

Mirrors /root/reference/mmdet/datasets/lvis.py behaviourally: LVIS shares
the COCO json structure but (a) val images list annotations non-exhaustively
(``neg_category_ids`` / ``not_exhaustive_category_ids`` per image), and
(b) the 1203 categories come from the json itself; labels are contiguous in
category-id order. File names are derived from ``coco_url`` when present.
"""
from __future__ import annotations

import os
from typing import List

import numpy as np

from .coco import COCOJson, CocoDataset, ImageRecord


class LVISDataset(CocoDataset):

    def __init__(self, ann_file, img_prefix='', filter_empty_gt=True,
                 min_size=32, test_mode=False):
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.coco = COCOJson(ann_file)
        cats = sorted(self.coco.cats.values(), key=lambda c: c['id'])
        self.classes = tuple(c['name'] for c in cats)
        self.cat_ids = [c['id'] for c in cats]
        self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}
        self.label_names = list(self.classes)
        # LVIS v1 categories carry 'frequency' in {'r','c','f'} (rare /
        # common / frequent); drives the APr/APc/APf groups of LVISEval.
        self.frequencies = [c.get('frequency', 'f') for c in cats]
        self.test_mode = test_mode
        self.with_mask = False
        self.records = self._load()
        if not test_mode:
            self.records = self._filter(self.records, filter_empty_gt,
                                        min_size)

    def _load(self) -> List[ImageRecord]:
        out = []
        for img_id, img in self.coco.imgs.items():
            # LVIS images reference COCO files through coco_url
            file_name = img.get('file_name')
            if not file_name and 'coco_url' in img:
                file_name = '/'.join(img['coco_url'].split('/')[-2:])
            bboxes, labels, ignore = [], [], []
            for ann in self.coco.img_anns.get(img_id, []):
                if ann.get('category_id') not in self.cat2label:
                    continue
                x, y, w, h = ann['bbox']
                x1, y1 = max(x, 0), max(y, 0)
                x2 = min(x + w, img['width'])
                y2 = min(y + h, img['height'])
                if x2 <= x1 or y2 <= y1:
                    continue
                bboxes.append([x1, y1, x2, y2])
                labels.append(self.cat2label[ann['category_id']])
                ignore.append(False)
            out.append(ImageRecord(
                img_id=img_id,
                path=os.path.join(self.img_prefix, file_name or ''),
                width=img['width'], height=img['height'],
                bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int32),
                ignore=np.asarray(ignore, bool),
                neg_labels=frozenset(
                    self.cat2label[c]
                    for c in img.get('neg_category_ids', [])
                    if c in self.cat2label),
                not_exhaustive_labels=frozenset(
                    self.cat2label[c]
                    for c in img.get('not_exhaustive_category_ids', [])
                    if c in self.cat2label)))
        out.sort(key=lambda r: r.img_id)
        return out
