"""Detection visualization (DetLocalVisualizer analogue).

Draws predicted/ground-truth boxes with class names and scores onto images
(cv2), mirroring /root/reference/mmdet/visualization/local_visualizer.py:20
behaviourally: per-class palette colours, score text, optional score
threshold, save-to-file.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _palette(n):
    rs = np.random.RandomState(42)
    return rs.randint(64, 255, (max(n, 1), 3)).tolist()


def draw_detections(image: np.ndarray, bboxes, scores=None, labels=None,
                    class_names: Optional[Sequence[str]] = None,
                    score_thr: float = 0.3,
                    thickness: int = 2) -> np.ndarray:
    """Return a copy of ``image`` (RGB uint8) with boxes drawn."""
    import cv2
    img = np.ascontiguousarray(image.copy())
    bboxes = np.asarray(bboxes).reshape(-1, 4)
    n = len(bboxes)
    scores = np.asarray(scores) if scores is not None else np.ones(n)
    labels = np.asarray(labels) if labels is not None else \
        np.zeros(n, np.int32)
    n_cls = (int(labels.max()) + 1) if n else 1
    colors = _palette(max(n_cls, len(class_names or [])))
    for b, s, l in zip(bboxes, scores, labels):
        if s < score_thr:
            continue
        color = tuple(int(c) for c in colors[int(l) % len(colors)])
        x1, y1, x2, y2 = (int(round(v)) for v in b)
        cv2.rectangle(img, (x1, y1), (x2, y2), color, thickness)
        name = class_names[int(l)] if class_names else str(int(l))
        text = f'{name} {s:.2f}'
        (tw, th), _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                                      1)
        cv2.rectangle(img, (x1, max(y1 - th - 4, 0)), (x1 + tw, y1), color,
                      -1)
        cv2.putText(img, text, (x1, max(y1 - 3, th)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1)
    return img


def save_visualization(path: str, image: np.ndarray, bboxes, scores=None,
                       labels=None, class_names=None, score_thr=0.3):
    import cv2
    img = draw_detections(image, bboxes, scores, labels, class_names,
                          score_thr)
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return path
