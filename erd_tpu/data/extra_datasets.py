"""Additional dataset classes: CrowdHuman, Objects365 v1/v2, Cityscapes,
WIDERFace, DeepFashion.

Behavioural mirrors of the reference dataset zoo
(/root/reference/mmdet/datasets/):
- CrowdHumanDataset (crowdhuman.py): .odgt (one json per line) with
  ``gtboxes`` entries; ``fbox`` (x, y, w, h) full-body boxes; entries whose
  tag is not a known class or carry extra.ignore become ignore regions.
  Image sizes come from an ``extra_ann_file`` cache (id -> (h, w)) or a
  caller-provided default, never by decoding images at parse time.
- Objects365V1/V2Dataset (objects365.py): CocoDataset with the 365-name
  METAINFO (v2 drops/renames a handful); the json layout is plain COCO.
- CityscapesDataset (cityscapes.py): CocoDataset with the 8
  instance classes.
- WIDERFaceDataset (wider_face.py): VOC-style XML, single 'face' class.
- DeepFashionDataset (deepfashion.py): CocoDataset with the 15
  clothing-landmark categories.

All reuse the framework's ImageRecord contract (data/coco.py:62-75).
"""
from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET
from typing import List, Optional

import numpy as np

from .coco import CocoDataset, ImageRecord

CITYSCAPES_CLASSES = ('person', 'rider', 'car', 'truck', 'bus', 'train',
                      'motorcycle', 'bicycle')

DEEPFASHION_CLASSES = (
    'top', 'skirt', 'leggings', 'dress', 'outer', 'pants', 'bag',
    'neckwear', 'headwear', 'eyeglass', 'belt', 'footwear', 'hair',
    'skin', 'face')


class CrowdHumanDataset:
    METAINFO = {'classes': ('person',)}

    def __init__(self, ann_file, img_prefix='', extra_ann_file=None,
                 default_hw=(1080, 1920), filter_empty_gt=True,
                 test_mode=False):
        self.img_prefix = img_prefix
        sizes = {}
        if extra_ann_file and os.path.exists(extra_ann_file):
            with open(extra_ann_file) as f:
                sizes = json.load(f)
        classes = self.METAINFO['classes']
        self.records: List[ImageRecord] = []
        with open(ann_file) as f:
            lines = [ln for ln in f.read().strip().split('\n') if ln]
        for i, line in enumerate(lines):
            ann = json.loads(line)
            img_id = ann['ID']
            h, w = sizes.get(img_id, default_hw)
            boxes, labels, ignores = [], [], []
            for g in ann.get('gtboxes', []):
                ig = g.get('tag') not in classes
                if g.get('extra', {}).get('ignore', 0) != 0:
                    ig = True
                x, y, bw, bh = g['fbox']
                boxes.append([x, y, x + bw, y + bh])
                labels.append(0 if not ig else -1)
                ignores.append(ig)
            rec = ImageRecord(
                img_id=i, path=os.path.join(img_prefix, f'{img_id}.jpg'),
                width=w, height=h,
                bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int32),
                ignore=np.asarray(ignores, bool))
            keep = rec.bboxes.shape[0] > 0 and not rec.ignore.all()
            if test_mode or not filter_empty_gt or keep:
                self.records.append(rec)
        self.classes = classes
        self.label_names = list(classes)

    def __len__(self):
        return len(self.records)

    def __getitem__(self, idx):
        return self.records[idx]


class Objects365V1Dataset(CocoDataset):
    """Objects365 v1 uses a plain COCO json; class names come from the
    json's own categories (365 entries), taken in category-id order —
    matching the reference's sorted cat_ids contract."""
    METAINFO = {'classes': None}

    def __init__(self, ann_file, **kw):
        # derive classes from the json itself (365 names vary by release)
        from .coco import COCOJson
        coco = COCOJson(ann_file)
        names = tuple(coco.cats[c]['name']
                      for c in sorted(coco.cats))
        super().__init__(ann_file, classes=names, **kw)


class Objects365V2Dataset(Objects365V1Dataset):
    pass


class CityscapesDataset(CocoDataset):
    METAINFO = {'classes': CITYSCAPES_CLASSES}


class DeepFashionDataset(CocoDataset):
    METAINFO = {'classes': DEEPFASHION_CLASSES}


class WIDERFaceDataset:
    """VOC-style XML annotations, one 'face' class
    (reference wider_face.py)."""
    METAINFO = {'classes': ('face',)}

    def __init__(self, data_root, split_file, img_prefix='',
                 min_size=None, test_mode=False):
        self.data_root = data_root
        self.img_prefix = img_prefix or os.path.join(data_root, 'WIDER_train',
                                                     'images')
        with open(os.path.join(data_root, split_file)) as f:
            ids = [ln.strip() for ln in f if ln.strip()]
        self.records = [self._parse(i, idx) for idx, i in enumerate(ids)]
        self.classes = self.METAINFO['classes']
        self.label_names = list(self.classes)

    def _parse(self, img_id, idx):
        xml_path = os.path.join(self.data_root, 'Annotations',
                                f'{img_id}.xml')
        tree = ET.parse(xml_path)
        root = tree.getroot()
        size = root.find('size')
        w = int(size.find('width').text)
        h = int(size.find('height').text)
        folder = root.find('folder')
        folder = folder.text if folder is not None else ''
        boxes, labels, ignores = [], [], []
        for obj in root.findall('object'):
            bnd = obj.find('bndbox')
            box = [float(bnd.find('xmin').text), float(bnd.find('ymin').text),
                   float(bnd.find('xmax').text), float(bnd.find('ymax').text)]
            boxes.append(box)
            labels.append(0)
            diff = obj.find('difficult')
            ignores.append(diff is not None and int(diff.text) == 1)
        return ImageRecord(
            img_id=idx,
            path=os.path.join(self.img_prefix, folder, f'{img_id}.jpg'),
            width=w, height=h,
            bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int32),
            ignore=np.asarray(ignores, bool))

    def __len__(self):
        return len(self.records)

    def __getitem__(self, idx):
        return self.records[idx]
