"""Test-time augmentation: horizontal-flip and multi-scale merge.

Mirrors the role of DetTTAModel
(/root/reference/mmdet/models/test_time_augs/det_tta.py, wired by
tools/test.py:93-126): run the detector on augmented views (h-flip and/or
rescaled canvases), map detections back to the original frame
(merge_aug_bboxes, det_tta.py:53), concatenate and re-NMS. Implemented as
pure functions over the fixed-size DetResults containers; each distinct
scale compiles one extra detector variant (static canvas shapes).
"""
from __future__ import annotations

import math
from functools import partial

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


@jax.jit
def _flip_content(images, img_shapes):
    """Flip each image's CONTENT region, leaving right padding in place."""

    def single(img, shape):
        w = shape[1].astype(jnp.int32)
        width = img.shape[1]
        x = jnp.arange(width)
        src = jnp.where(x < w, jnp.clip(w - 1 - x, 0, width - 1), x)
        return img[:, src]

    return jax.vmap(single)(images, img_shapes)


@partial(jax.jit, static_argnums=(1, 2))
def _resize_canvas(images, h2, w2):
    b, _, _, c = images.shape
    return jax.image.resize(images, (b, h2, w2, c), 'bilinear')


def _rescale_batch(batch, scale, divisor=32):
    """Return a new batch with the padded canvas resized by ~``scale``.

    The whole canvas is resized (content scales with it; padding stays at
    high coordinates), canvas dims rounded up to ``divisor``. Metas are
    updated with the EXACT realized per-axis factors so predictions still
    rescale to the original frame.
    """
    images = batch['images']
    _, h, w, _ = images.shape
    h2 = int(math.ceil(h * scale / divisor) * divisor)
    w2 = int(math.ceil(w * scale / divisor) * divisor)
    sy, sx = h2 / h, w2 / w
    meta = batch['meta']
    out = dict(batch)
    out['images'] = _resize_canvas(images, h2, w2)
    out['meta'] = meta.replace(
        img_shape=meta.img_shape * jnp.asarray([sy, sx],
                                               meta.img_shape.dtype),
        scale_factor=meta.scale_factor * jnp.asarray(
            [sx, sy], meta.scale_factor.dtype))
    return out


@jax.jit
def _unflip_results(res: DetResults, ori_shapes):
    def single(r, ori):
        return r.replace(bboxes=flip_boxes_h(r.bboxes, ori[1]))

    return jax.vmap(single)(res, ori_shapes)


@partial(jax.jit, static_argnums=(1, 2))
def _merge_results(results, iou_threshold, max_per_img):
    def single(*rs):
        boxes = jnp.concatenate([r.bboxes for r in rs])
        scores = jnp.concatenate([r.scores for r in rs])
        labels = jnp.concatenate([r.labels for r in rs])
        valid = jnp.concatenate([r.mask for r in rs])
        ob, os_, ol, om = nms_select(boxes, scores, labels, iou_threshold,
                                     max_per_img, valid_mask=valid)
        return DetResults(bboxes=ob, scores=os_, labels=ol, mask=om)

    return jax.vmap(single)(*results)


def tta_predict_multiscale(detector, variables, batch,
                           scales=(0.75, 1.0, 1.25), flip=True,
                           iou_threshold=None, max_per_img=None):
    """Multi-scale (+flip) TTA: len(scales) * (1+flip) views, one re-NMS.

    Detections from every view land in the original image frame (predict
    divides by the per-view scale_factor), so the merge is a plain concat +
    NMS as in merge_aug_bboxes (det_tta.py:53-76).
    """
    cfg = detector.test_cfg
    iou_threshold = iou_threshold or cfg.iou_threshold
    max_per_img = max_per_img or cfg.max_per_img

    results = []
    for s in scales:
        b = _rescale_batch(batch, s) if s != 1.0 else batch
        results.append(detector.predict_jit(variables, b))
        if flip:
            fb = dict(b)
            fb['images'] = _flip_content(b['images'], b['meta'].img_shape)
            res_f = detector.predict_jit(variables, fb)
            results.append(_unflip_results(res_f,
                                           batch['meta'].ori_shape))
    return _merge_results(tuple(results), float(iou_threshold),
                          int(max_per_img))
