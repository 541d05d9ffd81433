"""Fixed-shape detection sample containers (the TPU answer to DetDataSample).

The reference carries per-image metadata and variable-length ground truth in
``DetDataSample`` objects (/root/reference/mmdet/structures/det_data_sample.py:7).
On TPU everything must be a static-shape pytree, so ground truth is padded to a
fixed capacity with a validity mask and metadata becomes small arrays that ride
through jit. All containers are registered as pytrees via
``flax.struct.dataclass`` so they can cross jit/vmap/pjit boundaries.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class GTInstances:
    """Padded ground-truth for one image (or a batch when leading dim added).

    bboxes: (MAX_GT, 4) xyxy in the network input frame (post resize/flip).
    labels: (MAX_GT,) int32 class indices; arbitrary where invalid.
    mask:   (MAX_GT,) bool validity.
    """
    bboxes: jnp.ndarray
    labels: jnp.ndarray
    mask: jnp.ndarray
    # optional (MAX_GT, R, R) uint8 box-normalized instance-mask crops
    masks: jnp.ndarray = None

    @staticmethod
    def pad(bboxes, labels, max_gt, ignore=None, masks=None):
        """Host-side constructor from variable-length numpy arrays."""
        n = min(len(bboxes), max_gt)
        out_b = np.zeros((max_gt, 4), np.float32)
        out_l = np.zeros((max_gt,), np.int32)
        out_m = np.zeros((max_gt,), bool)
        out_b[:n] = np.asarray(bboxes, np.float32)[:n]
        out_l[:n] = np.asarray(labels, np.int32)[:n]
        out_m[:n] = True
        if ignore is not None:
            out_m[:n] &= ~np.asarray(ignore, bool)[:n]
        out_masks = None
        if masks is not None:
            r = masks[0].shape[0] if len(masks) else 56
            out_masks = np.zeros((max_gt, r, r), np.uint8)
            for i, mk in enumerate(masks[:max_gt]):
                out_masks[i] = mk
        return GTInstances(bboxes=out_b, labels=out_l, mask=out_m,
                           masks=out_masks)


@flax.struct.dataclass
class ImageMeta:
    """Per-image geometry metadata threaded through the padded batch.

    Mirrors the metainfo stamped by DetDataPreprocessor
    (/root/reference/mmdet/models/data_preprocessors/data_preprocessor.py:121-143).

    img_shape: (2,) float32 (H, W) of the resized image inside the padded canvas.
    ori_shape: (2,) float32 (H, W) of the original image on disk.
    scale_factor: (2,) float32 (sx, sy) resize factors (new/old).
    flip: () bool horizontal flip applied.
    img_id: () int32 COCO image id (or -1).
    valid: () bool — False for batch-padding slots.
    """
    img_shape: jnp.ndarray
    ori_shape: jnp.ndarray
    scale_factor: jnp.ndarray
    flip: jnp.ndarray
    img_id: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def make(img_shape, ori_shape, scale_factor, flip=False, img_id=-1,
             valid=True):
        return ImageMeta(
            img_shape=np.asarray(img_shape, np.float32),
            ori_shape=np.asarray(ori_shape, np.float32),
            scale_factor=np.asarray(scale_factor, np.float32),
            flip=np.asarray(flip, bool),
            img_id=np.asarray(img_id, np.int32),
            valid=np.asarray(valid, bool))


@flax.struct.dataclass
class DetResults:
    """Fixed-capacity detections for one image (post-NMS).

    bboxes: (MAX_DET, 4) xyxy in the original image frame.
    scores: (MAX_DET,)
    labels: (MAX_DET,) int32
    mask:   (MAX_DET,) bool validity (True for kept detections).
    """
    bboxes: jnp.ndarray
    scores: jnp.ndarray
    labels: jnp.ndarray
    mask: jnp.ndarray
