"""Host-side image pipeline: decode, keep-ratio resize, flip, bucket-pad, pack.

Replaces the reference's transform chain (LoadImageFromFile -> LoadAnnotations
-> Resize(keep_ratio, (1333, 800)) -> RandomFlip(0.5) -> PackDetInputs;
configs/_base_/datasets/coco_detection.py:20-36) plus the device-side pad of
DetDataPreprocessor. TPU twist: instead of padding each batch to its own max
shape (dynamic), every image lands in one of two STATIC canvases —
(800, 1344) landscape / (1344, 800) portrait — so XLA compiles exactly two
bucket programs. Batches are orientation-homogeneous (the
AspectRatioBatchSampler idea, batch_sampler.py:11-68, folded into bucketing).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from ..structures.det_sample import GTInstances, ImageMeta
from .coco import ImageRecord

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    from PIL import Image
    _HAS_CV2 = False


def imread_rgb(path: str) -> np.ndarray:
    """(H, W, 3) uint8 RGB."""
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    img = Image.open(path).convert('RGB')  # pragma: no cover
    return np.asarray(img)  # pragma: no cover


def rescale_size(h: int, w: int, scale: Tuple[int, int]) -> Tuple[int, int]:
    """mmcv-style keep-ratio size: long edge <= scale[0], short <= scale[1]."""
    long_edge, short_edge = max(scale), min(scale)
    f = min(long_edge / max(h, w), short_edge / min(h, w))
    return int(h * f + 0.5), int(w * f + 0.5)


def resize_image(img: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    h, w = size_hw
    if _HAS_CV2:
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    from PIL import Image  # pragma: no cover
    return np.asarray(
        Image.fromarray(img).resize((w, h), Image.BILINEAR))


def bucket_shape(h: int, w: int, scale=(1333, 800), divisor=32):
    """Static canvas for an image's orientation."""
    long_edge = int(np.ceil(max(scale) / divisor) * divisor)
    short_edge = int(np.ceil(min(scale) / divisor) * divisor)
    return (short_edge, long_edge) if w >= h else (long_edge, short_edge)


@dataclass
class DetPipeline:
    """record -> (canvas uint8, GTInstances, ImageMeta), all static shapes.

    ``ms_scales``: optional list of alternative (long, short) scales for
    multi-scale training (the RandomChoiceResize of ms-2x recipes). All
    choices must fit the canvas of ``scale`` — smaller scales simply pad
    more, so the compiled bucket shapes never change.
    """
    scale: Tuple[int, int] = (1333, 800)
    flip_prob: float = 0.5
    max_gt: int = 100
    divisor: int = 32
    training: bool = True
    ms_scales: Optional[Tuple[Tuple[int, int], ...]] = None
    mask_res: int = 56  # box-normalized gt-mask crop resolution

    def __call__(self, record: ImageRecord,
                 rng: Optional[np.random.RandomState] = None,
                 image: Optional[np.ndarray] = None):
        img = image if image is not None else imread_rgb(record.path)
        return self.pack(img, record.bboxes, record.labels, record.ignore,
                         rng, record=record)

    def pack(self, img, bboxes, labels, ignore, rng,
             record: Optional[ImageRecord] = None, masks=None):
        """Resize/flip/bucket-pad an (img, boxes) pair into the static batch
        layout. ``record`` supplies img_id and mask polygons when present;
        ``masks`` (box-normalized crops) overrides them when a mask-aware
        strong-aug stage already produced transformed crops."""
        ori_h, ori_w = img.shape[:2]
        scale = self.scale
        if self.training and self.ms_scales and rng is not None:
            scale = self.ms_scales[rng.randint(len(self.ms_scales))]
            assert max(scale) <= max(self.scale) and \
                min(scale) <= min(self.scale), \
                f'ms scale {scale} exceeds canvas scale {self.scale}'
        new_h, new_w = rescale_size(ori_h, ori_w, scale)
        img = resize_image(img, (new_h, new_w))
        sx, sy = new_w / ori_w, new_h / ori_h

        boxes = bboxes * np.array([sx, sy, sx, sy], np.float32)

        flip = bool(self.training and rng is not None and
                    rng.rand() < self.flip_prob)
        if flip:
            img = img[:, ::-1]
            x1 = new_w - boxes[:, 2]
            x2 = new_w - boxes[:, 0]
            boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], axis=-1)

        ch, cw = bucket_shape(ori_h, ori_w, self.scale, self.divisor)
        canvas = np.zeros((ch, cw, 3), np.uint8)
        canvas[:new_h, :new_w] = img

        mask_crops = None
        if masks is not None:
            # box-normalized crops from a mask-aware strong-aug stage;
            # scale-invariant, a flip just mirrors the crop
            mask_crops = [np.asarray(c) for c in masks[:self.max_gt]]
            if flip:
                mask_crops = [c[:, ::-1] for c in mask_crops]
        elif record is not None and record.polygons is not None:
            from .masks import polygons_to_boxmask
            # box-normalized crops are scale-invariant: rasterize from the
            # ORIGINAL polygons/boxes; a flip just mirrors the crop.
            mask_crops = [
                polygons_to_boxmask(p, record.bboxes[i], self.mask_res)
                for i, p in enumerate(record.polygons[:self.max_gt])
            ]
            if flip:
                mask_crops = [c[:, ::-1] for c in mask_crops]
        gt = GTInstances.pad(boxes, labels, self.max_gt,
                             ignore=ignore, masks=mask_crops)
        meta = ImageMeta.make((new_h, new_w), (ori_h, ori_w), (sx, sy),
                              flip=flip,
                              img_id=record.img_id if record else -1)
        return canvas, gt, meta


@dataclass
class AugPipeline(DetPipeline):
    """DetPipeline + strong-aug stages (Mosaic/MixUp/affine/crop/color).

    ``transforms`` run on the decoded original-resolution sample BEFORE the
    standard resize/flip/bucket-pad; multi-image transforms draw extra
    images from ``dataset`` through the per-item RandomState, so epochs
    remain deterministic. The final canvas stays static — strong-aug
    recipes (YOLOX/RTMDet/SSD) therefore compile exactly like plain ones.

    Mirrors the MultiImageMixDataset + transform-pipeline composition of
    the reference (mmdet/datasets/transforms/transforms.py; dataset
    wrapper mix_results protocol) without the wrapper indirection.
    """
    transforms: Tuple = ()
    dataset: Optional[object] = None  # CocoDataset-like, for mix sampling

    # transforms that carry Sample.masks through geometry/composition;
    # everything else would silently misalign crop<->box, so masks +
    # other transforms is an explicit error
    _MASK_AWARE = ('InstaBoost', 'CopyPaste')

    def _load_sample(self, record: ImageRecord,
                     image: Optional[np.ndarray] = None):
        from .strong_aug import Sample
        img = image if image is not None else imread_rgb(record.path)
        masks = None
        if record.polygons is not None:
            from .masks import polygons_to_boxmask
            masks = [polygons_to_boxmask(p, record.bboxes[i],
                                         self.mask_res)
                     for i, p in enumerate(record.polygons)]
        return Sample(img=img, boxes=record.bboxes.copy(),
                      labels=record.labels.copy(),
                      ignore=record.ignore.copy(), masks=masks)

    def __call__(self, record: ImageRecord,
                 rng: Optional[np.random.RandomState] = None,
                 image: Optional[np.ndarray] = None):
        if record.polygons is not None:
            bad = [type(t).__name__ for t in self.transforms
                   if type(t).__name__ not in self._MASK_AWARE]
            assert not bad, \
                f'strong augs {bad} do not carry instance masks; ' \
                f'mask datasets support only {self._MASK_AWARE}'
        rng = rng or np.random.RandomState(0)
        sample = self._load_sample(record, image)

        def sampler(r):
            assert self.dataset is not None, \
                'multi-image transforms need AugPipeline(dataset=...)'
            idx = r.randint(len(self.dataset))
            return self._load_sample(self.dataset[idx])

        for t in self.transforms:
            sample = t(sample, rng, sampler)
        canvas, gt, meta = self.pack(sample.img, sample.boxes,
                                     sample.labels, sample.ignore, rng,
                                     masks=sample.masks)
        meta = meta.replace(img_id=np.asarray(record.img_id, np.int32))
        return canvas, gt, meta
