"""Test-time augmentation: horizontal-flip merge.

Mirrors the role of DetTTAModel
(/root/reference/mmdet/models/test_time_augs/det_tta.py, wired by
tools/test.py:93-126): run the detector on the original and h-flipped
inputs, un-flip the flipped detections, concatenate and re-NMS. Implemented
as a pure function over the fixed-size DetResults containers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import nms_select
from ..structures import DetResults


def flip_boxes_h(bboxes, img_w):
    """Horizontally un-flip xyxy boxes given original image width."""
    x1 = img_w - bboxes[..., 2]
    x2 = img_w - bboxes[..., 0]
    return jnp.stack([x1, bboxes[..., 1], x2, bboxes[..., 3]], axis=-1)


def tta_predict(detector, variables, batch, iou_threshold=None,
                max_per_img=None):
    """Flip-TTA wrapper around detector.predict.

    batch['images'] is the padded canvas; flipping the full canvas keeps the
    image content aligned after un-flip because detections are rescaled to
    the ORIGINAL frame using ori width for the un-flip.
    """
    cfg = detector.test_cfg
    iou_threshold = iou_threshold or cfg.iou_threshold
    max_per_img = max_per_img or cfg.max_per_img

    res_a = detector.predict_jit(variables, batch)

    @jax.jit
    def flip_content(images, img_shapes):
        """Flip each image's CONTENT region, leaving right/bottom padding in
        place (the canvas is padded at high x, so a raw ::-1 would move the
        content off-origin and break img_shape clipping)."""

        def single(img, shape):
            w = shape[1].astype(jnp.int32)
            width = img.shape[1]
            x = jnp.arange(width)
            src = jnp.where(x < w, jnp.clip(w - 1 - x, 0, width - 1), x)
            return img[:, src]

        return jax.vmap(single)(images, img_shapes)

    flipped = dict(batch)
    flipped['images'] = flip_content(batch['images'],
                                     batch['meta'].img_shape)
    res_b = detector.predict_jit(variables, flipped)

    @jax.jit
    def merge(res_a: DetResults, res_b: DetResults, ori_shapes):
        def single(a, b, ori):
            w = ori[1]
            b_boxes = flip_boxes_h(b.bboxes, w)
            boxes = jnp.concatenate([a.bboxes, b_boxes])
            scores = jnp.concatenate([a.scores, b.scores])
            labels = jnp.concatenate([a.labels, b.labels])
            valid = jnp.concatenate([a.mask, b.mask])
            ob, os_, ol, om = nms_select(boxes, scores, labels,
                                         iou_threshold, max_per_img,
                                         valid_mask=valid)
            return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

        return jax.vmap(single)(res_a, res_b, ori_shapes)

    return merge(res_a, res_b, batch['meta'].ori_shape)
