"""COCO dataset (pure-python json parsing; pycocotools-free).

Behavioural mirror of /root/reference/mmdet/datasets/coco.py:
  * METAINFO: the 80 COCO class names in canonical order (:17-31).
  * cat2label built from the categories PRESENT in the json, taken in
    METAINFO order (:70-72) — this is what makes category-split jsons
    (scripts/select_categories.py) "just work": a last-40 json yields labels
    0..39 for the last 40 METAINFO classes.
  * per-image instances carry xyxy bboxes, labels and ignore flags (iscrowd)
    (:102-159); train filtering drops empty-gt and <32px images (:161-196).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

COCO_CLASSES = (
    'person', 'bicycle', 'car', 'motorcycle', 'airplane', 'bus', 'train',
    'truck', 'boat', 'traffic light', 'fire hydrant', 'stop sign',
    'parking meter', 'bench', 'bird', 'cat', 'dog', 'horse', 'sheep', 'cow',
    'elephant', 'bear', 'zebra', 'giraffe', 'backpack', 'umbrella',
    'handbag', 'tie', 'suitcase', 'frisbee', 'skis', 'snowboard',
    'sports ball', 'kite', 'baseball bat', 'baseball glove', 'skateboard',
    'surfboard', 'tennis racket', 'bottle', 'wine glass', 'cup', 'fork',
    'knife', 'spoon', 'bowl', 'banana', 'apple', 'sandwich', 'orange',
    'broccoli', 'carrot', 'hot dog', 'pizza', 'donut', 'cake', 'chair',
    'couch', 'potted plant', 'bed', 'dining table', 'toilet', 'tv',
    'laptop', 'mouse', 'remote', 'keyboard', 'cell phone', 'microwave',
    'oven', 'toaster', 'sink', 'refrigerator', 'book', 'clock', 'vase',
    'scissors', 'teddy bear', 'hair drier', 'toothbrush')


class COCOJson:
    """Minimal COCO annotation container (replaces pycocotools.COCO)."""

    def __init__(self, path_or_dict):
        if isinstance(path_or_dict, (str, os.PathLike)):
            with open(path_or_dict) as f:
                d = json.load(f)
        else:
            d = path_or_dict
        self.dataset = d
        self.imgs = {img['id']: img for img in d.get('images', [])}
        self.cats = {c['id']: c for c in d.get('categories', [])}
        self.img_anns: Dict[int, List[dict]] = {i: [] for i in self.imgs}
        for ann in d.get('annotations', []):
            if ann['image_id'] in self.img_anns:
                self.img_anns[ann['image_id']].append(ann)

    def cat_ids_for_names(self, names):
        """Category ids of the given names, in the given name order,
        restricted to categories present in the json."""
        by_name = {c['name']: c['id'] for c in self.cats.values()}
        return [by_name[n] for n in names if n in by_name]


@dataclass
class ImageRecord:
    img_id: int
    path: str
    width: int
    height: int
    bboxes: np.ndarray    # (n, 4) xyxy float32
    labels: np.ndarray    # (n,) int32 contiguous dataset labels
    ignore: np.ndarray    # (n,) bool (iscrowd or invalid)
    polygons: list = None  # optional per-instance segmentation polygons
    # LVIS federated-annotation fields (lvis.py neg_category_ids /
    # not_exhaustive_category_ids, as contiguous label sets); empty for COCO.
    neg_labels: frozenset = frozenset()
    not_exhaustive_labels: frozenset = frozenset()


class CocoDataset:
    METAINFO = {'classes': COCO_CLASSES}

    def __init__(self, ann_file, img_prefix='', classes=None,
                 filter_empty_gt=True, min_size=32, test_mode=False,
                 with_mask=False):
        self.with_mask = with_mask
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.classes = tuple(classes) if classes else self.METAINFO['classes']
        self.coco = COCOJson(ann_file)
        self.cat_ids = self.coco.cat_ids_for_names(self.classes)
        self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}
        self.label_names = [self.coco.cats[c]['name'] for c in self.cat_ids]
        self.test_mode = test_mode
        self.records = self._load()
        if not test_mode:
            self.records = self._filter(self.records, filter_empty_gt,
                                        min_size)

    def _load(self) -> List[ImageRecord]:
        out = []
        for img_id, img in self.coco.imgs.items():
            bboxes, labels, ignore, polys = [], [], [], []
            for ann in self.coco.img_anns.get(img_id, []):
                if ann.get('category_id') not in self.cat2label:
                    continue
                x, y, w, h = ann['bbox']
                # clip to image, drop degenerate (mirrors parse_data_info)
                x1 = max(x, 0)
                y1 = max(y, 0)
                x2 = min(x + w, img['width'])
                y2 = min(y + h, img['height'])
                if x2 <= x1 or y2 <= y1 or ann.get('area', w * h) <= 0:
                    continue
                bboxes.append([x1, y1, x2, y2])
                labels.append(self.cat2label[ann['category_id']])
                ignore.append(bool(ann.get('iscrowd', 0)) or
                              bool(ann.get('ignore', 0)))
                if self.with_mask:
                    seg = ann.get('segmentation')
                    polys.append(seg if isinstance(seg, list) else [])
            out.append(ImageRecord(
                img_id=img_id,
                path=os.path.join(self.img_prefix, img['file_name']),
                width=img['width'], height=img['height'],
                bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int32),
                ignore=np.asarray(ignore, bool),
                polygons=polys if self.with_mask else None))
        out.sort(key=lambda r: r.img_id)
        return out

    @staticmethod
    def _filter(records, filter_empty_gt, min_size):
        kept = []
        for r in records:
            if filter_empty_gt and (~r.ignore).sum() == 0:
                continue
            if min(r.width, r.height) < min_size:
                continue
            kept.append(r)
        return kept

    def __len__(self):
        return len(self.records)

    def __getitem__(self, idx) -> ImageRecord:
        return self.records[idx]

    @property
    def num_classes(self):
        return len(self.classes)
