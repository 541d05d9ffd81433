"""Dump model predictions to a pickle file for offline evaluation.

Mirrors /root/reference/mmdet/evaluation/metrics/dump_det_results.py:
predictions only (no gt), with instance masks kept in compressed-RLE form
so the dump stays small. Exposes the same ``process_batch`` /
``compute_metrics`` interface as CocoMetric so it can ride
``engine.train_loop.run_evaluation`` directly or alongside a scoring
metric.
"""
from __future__ import annotations

import pickle
from typing import List

import numpy as np


class DumpDetResults:

    def __init__(self, out_file_path: str):
        assert out_file_path.endswith(('.pkl', '.pickle')), (
            f'out_file_path must end with .pkl or .pickle, '
            f'got {out_file_path}')
        self.out_file_path = out_file_path
        self.results: List[dict] = []

    def process_batch(self, det_results, metas, masks=None):
        """Accumulate one padded device batch (same layout as CocoMetric)."""
        bboxes = np.asarray(det_results.bboxes)
        scores = np.asarray(det_results.scores)
        labels = np.asarray(det_results.labels)
        mask = np.asarray(det_results.mask)
        img_ids = np.asarray(metas.img_id)
        valid = np.asarray(metas.valid)
        masks_np = np.asarray(masks, np.float32) if masks is not None \
            else None
        for i in range(len(img_ids)):
            if not valid[i] or img_ids[i] < 0:
                continue  # batch padding slot
            m = mask[i]
            row = {
                'img_id': int(img_ids[i]),
                'bboxes': bboxes[i][m].astype(np.float32),
                'scores': scores[i][m].astype(np.float32),
                'labels': labels[i][m].astype(np.int64),
            }
            if masks_np is not None:
                from .mask_utils import rle_encode
                # per-det probability masks stay box-local (28x28); encode
                # thresholded bitmaps as RLE to keep the pickle compact
                row['masks'] = [rle_encode(mk >= 0.5)
                                for mk in masks_np[i][m]]
            self.results.append(row)

    def compute_metrics(self):
        self.results.sort(key=lambda r: r['img_id'])
        with open(self.out_file_path, 'wb') as f:
            pickle.dump(self.results, f)
        return {'dumped_file': self.out_file_path,
                'num_images': float(len(self.results))}
