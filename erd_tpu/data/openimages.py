"""OpenImages dataset (csv annotations + class hierarchy).

Behavioural mirror of /root/reference/mmdet/datasets/openimages.py:
- ``label_file`` csv maps MID label ids -> display names (row order
  defines the contiguous labels);
- box csv rows are (ImageID, Source, LabelName, Confidence, XMin, XMax,
  YMin, YMax, IsOccluded, IsTruncated, IsGroupOf, IsDepiction, IsInside)
  with NORMALIZED coordinates, grouped by image id (:63-130);
- the json hierarchy expands each class to include its ancestors; the
  (C, C) relation matrix (class -> is-descendant-of) is exposed for the
  metric's parent-class expansion (:152-208);
- optional image-level annotation csv lists verified image labels used
  by the evaluation protocol.
Image sizes come from a ``meta_file`` mapping (id -> (h, w)) since csv
annotations are normalized.
"""
from __future__ import annotations

import csv
import json
import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from .coco import ImageRecord


class OpenImagesDataset:

    def __init__(self, ann_file, label_file, hierarchy_file=None,
                 meta_file=None, image_level_ann_file=None, img_prefix='',
                 default_hw=(1024, 1024), test_mode=False):
        self.img_prefix = img_prefix
        self.classes, self.label_id_mapping = self._parse_label_file(
            label_file)
        self.label_names = list(self.classes)
        self.relation_matrix = (
            self._get_relation_matrix(hierarchy_file)
            if hierarchy_file else np.eye(len(self.classes), dtype=bool))
        self.image_level_labels = (
            self._parse_img_level_ann(image_level_ann_file)
            if image_level_ann_file else {})
        sizes = {}
        if meta_file:
            with open(meta_file) as f:
                sizes = json.load(f)

        per_img = defaultdict(list)
        order = []
        with open(ann_file) as f:
            reader = csv.reader(f)
            for i, line in enumerate(reader):
                if i == 0:
                    continue
                img_id = line[0]
                if img_id not in per_img:
                    order.append(img_id)
                per_img[img_id].append(line)
        self.records: List[ImageRecord] = []
        for idx, img_id in enumerate(order):
            h, w = sizes.get(img_id, default_hw)
            boxes, labels, ignores, group_of = [], [], [], []
            for line in per_img[img_id]:
                label = self.label_id_mapping[line[2]]
                boxes.append([float(line[4]) * w, float(line[6]) * h,
                              float(line[5]) * w, float(line[7]) * h])
                labels.append(label)
                ignores.append(False)
                group_of.append(len(line) > 10 and line[10] == '1')
            rec = ImageRecord(
                img_id=idx,
                path=os.path.join(img_prefix, f'{img_id}.jpg'),
                width=w, height=h,
                bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int32),
                ignore=np.asarray(ignores, bool))
            rec.group_of = np.asarray(group_of, bool)
            rec.image_id_str = img_id
            self.records.append(rec)

    @staticmethod
    def _parse_label_file(label_file):
        names, mapping = [], {}
        with open(label_file) as f:
            for i, line in enumerate(csv.reader(f)):
                mapping[line[0]] = i
                names.append(line[1])
        return tuple(names), mapping

    def _get_relation_matrix(self, hierarchy_file):
        with open(hierarchy_file) as f:
            hierarchy = json.load(f)
        n = len(self.classes)
        rel = np.eye(n, dtype=bool)

        def walk(node, parents):
            mid = node.get('LabelName')
            me = self.label_id_mapping.get(mid)
            chain = parents
            if me is not None:
                for p in parents:
                    rel[me, p] = True
                chain = parents + [me]
            for child in node.get('Subcategory', []):
                walk(child, chain)

        walk(hierarchy, [])
        return rel

    def _parse_img_level_ann(self, path):
        out = defaultdict(list)
        with open(path) as f:
            for i, line in enumerate(csv.reader(f)):
                if i == 0:
                    continue
                lab = self.label_id_mapping.get(line[2])
                if lab is not None:
                    out[line[0]].append((lab, float(line[3])))
        return dict(out)

    def __len__(self):
        return len(self.records)

    def __getitem__(self, idx):
        return self.records[idx]
