"""DetInferencer: one-object inference convenience API.

Mirrors /root/reference/mmdet/apis/det_inferencer.py:44-590 behaviourally:
construct from a config name/path (+ optional checkpoint), call with images,
get dict predictions; optional visualization to an output directory.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

import numpy as np

from ..config import Config
from ..data.coco import COCO_CLASSES
from .inference import inference_detector, init_detector


class DetInferencer:

    def __init__(self, model: Union[str, Config],
                 weights: Optional[str] = None, seed: int = 0,
                 class_names: Optional[Sequence[str]] = None):
        self.detector, self.variables, self.cfg = init_detector(
            model, weights, seed=seed)
        self.class_names = list(class_names) if class_names else \
            list(COCO_CLASSES[:self.detector.num_classes])

    def __call__(self, inputs, out_dir: Optional[str] = None,
                 pred_score_thr: float = 0.3):
        single = isinstance(inputs, (str, np.ndarray))
        items = [inputs] if single else list(inputs)
        results = inference_detector(self.detector, self.variables, items)
        if single:
            results = [results]
        preds = []
        for i, (item, res) in enumerate(zip(items, results)):
            preds.append({
                'bboxes': res.bboxes.tolist(),
                'scores': res.scores.tolist(),
                'labels': res.labels.tolist(),
            })
            if out_dir:
                from ..data.transforms import imread_rgb
                from ..visualization import save_visualization
                os.makedirs(out_dir, exist_ok=True)
                img = imread_rgb(item) if isinstance(item, str) else item
                name = os.path.basename(item) if isinstance(item, str) \
                    else f'{i}.jpg'
                save_visualization(
                    os.path.join(out_dir, name), img, res.bboxes,
                    res.scores, res.labels, self.class_names,
                    score_thr=pred_score_thr)
        return {'predictions': preds[0] if single else preds}
