"""COCO panoptic dataset.

Behavioural mirror of /root/reference/mmdet/datasets/coco_panoptic.py:
panoptic annotation jsons carry one record per image with
``segments_info`` (id, category_id, bbox, iscrowd, area) referring to an
id-encoded PNG (id = R + G*256 + B*256^2). Thing segments become detection
instances (bbox + label + instance mask decoded from the PNG); stuff
segments form the per-pixel semantic map that trains PanopticFPN's
semantic head (stuff labels 0..S-1 in METAINFO order, value S for any
thing pixel, 255 for unlabeled). 80 thing + 53 stuff COCO classes.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from .coco import COCO_CLASSES

# the 53 COCO-panoptic stuff class names (reference coco_panoptic.py
# METAINFO tail)
COCO_STUFF_CLASSES = (
    'banner', 'blanket', 'bridge', 'cardboard', 'counter', 'curtain',
    'door-stuff', 'floor-wood', 'flower', 'fruit', 'gravel', 'house',
    'light', 'mirror-stuff', 'net', 'pillow', 'platform', 'playingfield',
    'railroad', 'river', 'road', 'roof', 'sand', 'sea', 'shelf', 'snow',
    'stairs', 'tent', 'towel', 'wall-brick', 'wall-stone', 'wall-tile',
    'wall-wood', 'water-other', 'window-blind', 'window-other',
    'tree-merged', 'fence-merged', 'ceiling-merged', 'sky-other-merged',
    'cabinet-merged', 'table-merged', 'floor-other-merged',
    'pavement-merged', 'mountain-merged', 'grass-merged', 'dirt-merged',
    'paper-merged', 'food-other-merged', 'building-other-merged',
    'rock-merged', 'wall-other-merged', 'rug-merged')


def decode_panoptic_png(png_rgb):
    """(H, W, 3) uint8 -> (H, W) int32 segment ids (panopticapi rgb2id)."""
    p = png_rgb.astype(np.int64)
    return (p[..., 0] + 256 * p[..., 1] + 256 * 256 * p[..., 2]) \
        .astype(np.int32)


@dataclass
class PanopticRecord:
    img_id: int
    file_name: str
    pan_file: str
    width: int
    height: int
    bboxes: np.ndarray        # (G, 4) thing boxes xyxy
    labels: np.ndarray        # (G,) thing labels
    segment_ids: np.ndarray   # (G,) thing segment ids in the PNG
    ignore_flags: np.ndarray  # (G,) iscrowd
    stuff_segments: List[dict] = field(default_factory=list)


class CocoPanopticDataset:
    METAINFO = {
        'thing_classes': COCO_CLASSES,
        'stuff_classes': COCO_STUFF_CLASSES,
    }

    def __init__(self, ann_file, img_prefix='', seg_prefix='',
                 filter_empty_gt=True, min_size=32, test_mode=False):
        self.img_prefix = img_prefix
        self.seg_prefix = seg_prefix
        with open(ann_file) as f:
            data = json.load(f)
        cats = {c['id']: c for c in data['categories']}
        thing_names = list(self.METAINFO['thing_classes'])
        stuff_names = list(self.METAINFO['stuff_classes'])
        self.thing_cat2label = {}
        self.stuff_cat2label = {}
        for cid, c in cats.items():
            if c.get('isthing', 1) == 1 and c['name'] in thing_names:
                self.thing_cat2label[cid] = thing_names.index(c['name'])
            elif c['name'] in stuff_names:
                self.stuff_cat2label[cid] = stuff_names.index(c['name'])
        images = {im['id']: im for im in data['images']}
        self.records: List[PanopticRecord] = []
        for ann in data['annotations']:
            im = images[ann['image_id']]
            boxes, labels, seg_ids, ignores, stuff = [], [], [], [], []
            for seg in ann['segments_info']:
                cid = seg['category_id']
                if cid in self.thing_cat2label:
                    x, y, w, h = seg['bbox']
                    boxes.append([x, y, x + w, y + h])
                    labels.append(self.thing_cat2label[cid])
                    seg_ids.append(seg['id'])
                    ignores.append(seg.get('iscrowd', 0))
                elif cid in self.stuff_cat2label:
                    stuff.append(dict(id=seg['id'],
                                      label=self.stuff_cat2label[cid]))
            rec = PanopticRecord(
                img_id=ann['image_id'],
                file_name=im['file_name'],
                pan_file=ann.get('file_name', ''),
                width=im['width'], height=im['height'],
                bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int32),
                segment_ids=np.asarray(seg_ids, np.int64),
                ignore_flags=np.asarray(ignores, bool),
                stuff_segments=stuff)
            if test_mode or not filter_empty_gt or len(boxes) > 0:
                # reference filter drops images whose SHORT side < min_size
                if test_mode or min(im['width'], im['height']) >= min_size:
                    self.records.append(rec)

    def __len__(self):
        return len(self.records)

    def __getitem__(self, idx) -> PanopticRecord:
        return self.records[idx]

    def semantic_map(self, record: PanopticRecord, pan_ids):
        """(H, W) segment-id map -> (H, W) semantic target:
        stuff label in [0, S), S for thing pixels, 255 for unlabeled."""
        num_stuff = len(self.METAINFO['stuff_classes'])
        sem = np.full(pan_ids.shape, 255, np.uint8)
        for seg in record.stuff_segments:
            sem[pan_ids == seg['id']] = seg['label']
        for sid in record.segment_ids:
            sem[pan_ids == sid] = num_stuff
        return sem

    def instance_masks(self, record: PanopticRecord, pan_ids):
        """(G, H, W) bool instance masks from the id map."""
        return np.stack([pan_ids == sid for sid in record.segment_ids]) \
            if len(record.segment_ids) else \
            np.zeros((0,) + pan_ids.shape, bool)

    def gt_panoptic(self, record: PanopticRecord, pan_ids):
        """Ground-truth panoptic map in the evaluator's encoding."""
        from ..evaluation.panoptic_metric import INSTANCE_OFFSET
        num_things = len(self.METAINFO['thing_classes'])
        num_stuff = len(self.METAINFO['stuff_classes'])
        out = np.full(pan_ids.shape, num_things + num_stuff, np.int64)
        for seg in record.stuff_segments:
            out[pan_ids == seg['id']] = num_things + seg['label']
        for i, sid in enumerate(record.segment_ids):
            out[pan_ids == sid] = int(record.labels[i]) + \
                INSTANCE_OFFSET * (i + 1)
        return out
