"""Pascal VOC dataset (XML annotations).

Mirrors /root/reference/mmdet/datasets/voc.py + xml_style.py behaviour:
parse ``Annotations/*.xml`` listed by an ImageSets split file, map the 20
VOC class names to contiguous labels, carry ``difficult`` as the ignore
flag. Produces the same ImageRecord stream as CocoDataset so every
downstream component (pipeline, loader, evaluator) is shared.
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List

import numpy as np

from .coco import ImageRecord

VOC_CLASSES = (
    'aeroplane', 'bicycle', 'bird', 'boat', 'bottle', 'bus', 'car', 'cat',
    'chair', 'cow', 'diningtable', 'dog', 'horse', 'motorbike', 'person',
    'pottedplant', 'sheep', 'sofa', 'train', 'tvmonitor')


class VOCDataset:
    METAINFO = {'classes': VOC_CLASSES}

    def __init__(self, data_root, split='trainval', year='2007',
                 classes=None, filter_empty_gt=True, min_size=32,
                 test_mode=False):
        self.data_root = data_root
        self.classes = tuple(classes) if classes else VOC_CLASSES
        self.cat2label = {n: i for i, n in enumerate(self.classes)}
        self.label_names = list(self.classes)
        self.cat_ids = list(range(1, len(self.classes) + 1))
        self.test_mode = test_mode
        split_file = os.path.join(data_root, 'ImageSets', 'Main',
                                  f'{split}.txt')
        with open(split_file) as f:
            ids = [line.strip() for line in f if line.strip()]
        self.records = [self._parse(i, idx) for idx, i in enumerate(ids)]
        if not test_mode:
            self.records = [
                r for r in self.records
                if (not filter_empty_gt or (~r.ignore).sum() > 0)
                and min(r.width, r.height) >= min_size
            ]

    def _parse(self, img_id: str, idx: int) -> ImageRecord:
        xml_path = os.path.join(self.data_root, 'Annotations',
                                f'{img_id}.xml')
        root = ET.parse(xml_path).getroot()
        size = root.find('size')
        w = int(size.find('width').text)
        h = int(size.find('height').text)
        bboxes, labels, ignore = [], [], []
        for obj in root.findall('object'):
            name = obj.find('name').text
            if name not in self.cat2label:
                continue
            difficult = obj.find('difficult')
            diff = int(difficult.text) if difficult is not None else 0
            bb = obj.find('bndbox')
            # VOC boxes are 1-based inclusive
            x1 = float(bb.find('xmin').text) - 1
            y1 = float(bb.find('ymin').text) - 1
            x2 = float(bb.find('xmax').text) - 1
            y2 = float(bb.find('ymax').text) - 1
            if x2 <= x1 or y2 <= y1:
                continue
            bboxes.append([x1, y1, x2, y2])
            labels.append(self.cat2label[name])
            ignore.append(bool(diff))
        return ImageRecord(
            img_id=idx,
            path=os.path.join(self.data_root, 'JPEGImages',
                              f'{img_id}.jpg'),
            width=w, height=h,
            bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int32),
            ignore=np.asarray(ignore, bool))

    def __len__(self):
        return len(self.records)

    def __getitem__(self, idx):
        return self.records[idx]

    @property
    def num_classes(self):
        return len(self.classes)
