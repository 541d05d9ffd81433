"""User-facing inference API.

Mirrors /root/reference/mmdet/apis/inference.py (init_detector :24-100,
inference_detector) and the DetInferencer call path (det_inferencer.py:44):
build from config, load weights (orbax step dir or torch .pth), run the test
pipeline host-side and the jitted predict path on device.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.coco import ImageRecord
from ..data.transforms import DetPipeline, imread_rgb
from ..evaluation.coco_eval import DetectionResult
from .build import build_detector


def load_weights(detector, variables, checkpoint: str):
    """Load an orbax checkpoint dir (ours) or a torch .pth (reference)."""
    if os.path.isdir(checkpoint):
        import jax
        import jax.numpy as jnp

        from ..engine.checkpoints import load_checkpoint_raw
        state = load_checkpoint_raw(checkpoint)
        out = dict(variables)

        def _cast_like(saved, ref):
            return jax.tree.map(
                lambda s, r: jnp.asarray(s, r.dtype), saved, ref)

        out['params'] = _cast_like(state['params'], variables['params'])
        for k, v in (state.get('consts') or {}).items():
            out[k] = _cast_like(v, variables[k]) if k in variables else \
                jax.tree.map(jnp.asarray, v)
        return out
    from ..models.weight_import import load_torch_checkpoint_file
    out, _ = load_torch_checkpoint_file(variables, checkpoint)
    return out


def init_detector(config: Union[str, Config],
                  checkpoint: Optional[str] = None, seed: int = 0):
    """Returns (detector, variables, cfg)."""
    cfg = Config.fromfile(config) if isinstance(config, str) else config
    det = build_detector(cfg.model)
    variables = det.init(jax.random.PRNGKey(seed), image_shape=(64, 96))
    if checkpoint:
        variables = load_weights(det, variables, checkpoint)
    return det, variables, cfg


def inference_detector(detector, variables,
                       imgs: Union[str, np.ndarray,
                                   Sequence[Union[str, np.ndarray]]],
                       scale=(1333, 800)) -> List[DetectionResult]:
    """Run detection on one or more images (paths or RGB arrays)."""
    single = isinstance(imgs, (str, np.ndarray))
    if single:
        imgs = [imgs]
    pipe = DetPipeline(scale=scale, training=False)
    results = []
    for i, item in enumerate(imgs):
        img = imread_rgb(item) if isinstance(item, str) else item
        rec = ImageRecord(img_id=i, path='', width=img.shape[1],
                          height=img.shape[0],
                          bboxes=np.zeros((0, 4), np.float32),
                          labels=np.zeros((0,), np.int32),
                          ignore=np.zeros((0,), bool))
        canvas, gt, meta = pipe(rec, image=img)
        batch = dict(
            images=jnp.asarray(canvas[None]),
            gt=jax.tree.map(lambda x: jnp.asarray(x)[None], gt),
            meta=jax.tree.map(lambda x: jnp.asarray(x)[None], meta))
        res = detector.predict_jit(variables, batch)
        m = np.asarray(res.mask[0])
        results.append(DetectionResult(
            img_id=i, bboxes=np.asarray(res.bboxes[0])[m],
            scores=np.asarray(res.scores[0])[m],
            labels=np.asarray(res.labels[0])[m]))
    return results[0] if single else results
