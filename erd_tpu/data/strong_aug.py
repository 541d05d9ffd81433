"""Strong train-time augmentations (host-side numpy, static-canvas friendly).

Behavioural mirrors of the reference transforms
(/root/reference/mmdet/datasets/transforms/transforms.py):

  * Mosaic          (:2062) — 4-image 2x-canvas composite
  * MixUp           (:2322) — YOLOX-style jitter/flip/crop 0.5-blend
  * RandomAffine    (:2545) — rotate/scale/shear/translate warp
  * RandomCrop      (:602)
  * PhotoMetricDistortion (:892)
  * Expand          (:1022)
  * MinIoURandomCrop (:1146)
  * YOLOXHSVRandomAug

Differences from the reference, by design:
  * every transform takes an explicit ``np.random.RandomState`` (the loader
    derives one per (seed, epoch, index), so augmentation is reproducible
    and independent of worker scheduling — the reference uses global
    ``numpy.random`` state in worker processes);
  * images are RGB throughout (the reference is BGR; the HSV round-trips
    are color-space symmetric);
  * multi-image transforms pull their extra images through a ``sampler``
    callable instead of a MultiImageMixDataset wrapper.

All of this runs on CPU workers ahead of the device step; the output still
lands in one static canvas per orientation bucket so XLA never recompiles.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

from .transforms import resize_image


@dataclass
class Sample:
    """One image + its box annotations, absolute pixel coords (xyxy)."""
    img: np.ndarray      # (H, W, 3) uint8 RGB
    boxes: np.ndarray    # (N, 4) float32
    labels: np.ndarray   # (N,) int32
    ignore: np.ndarray   # (N,) bool
    # optional per-instance box-normalized (R, R) mask crops, aligned with
    # boxes; carried by the mask-aware transforms (InstaBoost, CopyPaste)
    masks: Optional[list] = None


def _filter_inside(s: Sample, h, w, clip=True) -> Sample:
    """Clip boxes to [0, w]x[0, h] and drop the ones fully outside."""
    b = s.boxes.copy()
    if clip:
        b[:, 0::2] = b[:, 0::2].clip(0, w)
        b[:, 1::2] = b[:, 1::2].clip(0, h)
    inside = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
    return Sample(img=s.img, boxes=b[inside], labels=s.labels[inside],
                  ignore=s.ignore[inside])


# ---------------------------------------------------------------------------
# Mosaic (transforms.py:2062)
# ---------------------------------------------------------------------------
@dataclass
class Mosaic:
    img_scale: Tuple[int, int] = (640, 640)   # (w, h), reference order
    center_ratio_range: Tuple[float, float] = (0.5, 1.5)
    pad_val: int = 114
    prob: float = 1.0

    def __call__(self, s: Sample, rng: np.random.RandomState,
                 sampler: Callable[[np.random.RandomState], Sample]):
        if rng.rand() > self.prob:
            return s
        sw, sh = self.img_scale
        canvas = np.full((2 * sh, 2 * sw, 3), self.pad_val, np.uint8)
        cx = int(rng.uniform(*self.center_ratio_range) * sw)
        cy = int(rng.uniform(*self.center_ratio_range) * sh)
        parts = [s] + [sampler(rng) for _ in range(3)]
        all_boxes, all_labels, all_ignore = [], [], []
        for loc, p in zip(('tl', 'tr', 'bl', 'br'), parts):
            h_i, w_i = p.img.shape[:2]
            r = min(sh / h_i, sw / w_i)
            img_i = resize_image(p.img, (int(h_i * r), int(w_i * r)))
            hi, wi = img_i.shape[:2]
            if loc == 'tl':
                x1, y1, x2, y2 = max(cx - wi, 0), max(cy - hi, 0), cx, cy
                cx1, cy1 = wi - (x2 - x1), hi - (y2 - y1)
            elif loc == 'tr':
                x1, y1 = cx, max(cy - hi, 0)
                x2, y2 = min(cx + wi, 2 * sw), cy
                cx1, cy1 = 0, hi - (y2 - y1)
            elif loc == 'bl':
                x1, y1 = max(cx - wi, 0), cy
                x2, y2 = cx, min(2 * sh, cy + hi)
                cx1, cy1 = wi - (x2 - x1), 0
            else:
                x1, y1 = cx, cy
                x2, y2 = min(cx + wi, 2 * sw), min(2 * sh, cy + hi)
                cx1, cy1 = 0, 0
            canvas[y1:y2, x1:x2] = img_i[cy1:cy1 + (y2 - y1),
                                         cx1:cx1 + (x2 - x1)]
            padw, padh = x1 - cx1, y1 - cy1
            if len(p.boxes):
                b = p.boxes * r
                b[:, 0::2] += padw
                b[:, 1::2] += padh
                all_boxes.append(b)
                all_labels.append(p.labels)
                all_ignore.append(p.ignore)
        boxes = (np.concatenate(all_boxes) if all_boxes
                 else np.zeros((0, 4), np.float32))
        labels = (np.concatenate(all_labels) if all_labels
                  else np.zeros((0,), np.int32))
        ignore = (np.concatenate(all_ignore) if all_ignore
                  else np.zeros((0,), bool))
        return _filter_inside(
            Sample(canvas, boxes.astype(np.float32), labels, ignore),
            2 * sh, 2 * sw)


# ---------------------------------------------------------------------------
# MixUp (transforms.py:2322)
# ---------------------------------------------------------------------------
@dataclass
class MixUp:
    img_scale: Tuple[int, int] = (640, 640)  # (w, h) dynamic scale
    ratio_range: Tuple[float, float] = (0.5, 1.5)
    flip_ratio: float = 0.5
    pad_val: int = 114
    max_iters: int = 15

    def __call__(self, s: Sample, rng: np.random.RandomState,
                 sampler: Callable[[np.random.RandomState], Sample]):
        other = None
        for _ in range(self.max_iters):
            cand = sampler(rng)
            if len(cand.boxes):
                other = cand
                break
        if other is None:
            return s
        sw, sh = self.img_scale
        jit = rng.uniform(*self.ratio_range)
        do_flip = rng.uniform(0, 1) > self.flip_ratio

        out = np.full((sh, sw, 3), self.pad_val, np.uint8)
        r = min(sh / other.img.shape[0], sw / other.img.shape[1])
        ri = resize_image(other.img, (int(other.img.shape[0] * r),
                                      int(other.img.shape[1] * r)))
        out[:ri.shape[0], :ri.shape[1]] = ri
        scale_ratio = r * jit
        out = resize_image(out, (int(out.shape[0] * jit),
                                 int(out.shape[1] * jit)))
        if do_flip:
            out = out[:, ::-1]

        oh, ow = out.shape[:2]
        th, tw = s.img.shape[:2]
        padded = np.full((max(oh, th), max(ow, tw), 3), self.pad_val,
                         np.uint8)
        padded[:oh, :ow] = out
        yo = rng.randint(0, padded.shape[0] - th + 1)
        xo = rng.randint(0, padded.shape[1] - tw + 1)
        cropped = padded[yo:yo + th, xo:xo + tw]

        b = other.boxes * scale_ratio
        b[:, 0::2] = b[:, 0::2].clip(0, ow)
        b[:, 1::2] = b[:, 1::2].clip(0, oh)
        if do_flip:
            flipped = b.copy()
            flipped[:, 0] = ow - b[:, 2]
            flipped[:, 2] = ow - b[:, 0]
            b = flipped
        b[:, 0::2] -= xo
        b[:, 1::2] -= yo

        img = (0.5 * s.img.astype(np.float32) +
               0.5 * cropped.astype(np.float32)).astype(np.uint8)
        merged = Sample(
            img,
            np.concatenate([s.boxes, b.astype(np.float32)]),
            np.concatenate([s.labels, other.labels]),
            np.concatenate([s.ignore, other.ignore]))
        return _filter_inside(merged, th, tw)


# ---------------------------------------------------------------------------
# CachedMosaic / CachedMixUp (transforms.py:3124, :3359 — RTMDet recipe)
# ---------------------------------------------------------------------------
@dataclass
class CachedMosaic(Mosaic):
    """Mosaic whose 3 partners come from a rolling cache of recent samples
    instead of fresh dataset reads (reference CachedMosaic: append to
    cache, random-pop above ``max_cached_images``, skip while the cache
    holds <= 4). Each transform instance owns its cache; access is locked
    because the loader may drive the pipeline from several threads."""
    max_cached_images: int = 40
    random_pop: bool = True

    def __post_init__(self):
        import threading
        assert self.max_cached_images >= 4
        self._cache = []
        self._lock = threading.Lock()

    def __call__(self, s: Sample, rng: np.random.RandomState,
                 sampler=None):
        with self._lock:
            self._cache.append(s)
            if len(self._cache) > self.max_cached_images:
                idx = rng.randint(0, len(self._cache)) \
                    if self.random_pop else 0
                self._cache.pop(idx)
            if len(self._cache) <= 4:
                return s
            cache = list(self._cache)

        def cache_sampler(r):
            return cache[r.randint(0, len(cache))]

        return Mosaic.__call__(self, s, rng, cache_sampler)


@dataclass
class CachedMixUp(MixUp):
    """MixUp partner drawn from a rolling cache (reference CachedMixUp:
    skip while the cache holds <= 1; up to 10 retries for a non-empty
    partner)."""
    max_cached_images: int = 20
    random_pop: bool = True
    prob: float = 1.0

    def __post_init__(self):
        import threading
        assert self.max_cached_images >= 2
        self._cache = []
        self._lock = threading.Lock()

    def __call__(self, s: Sample, rng: np.random.RandomState,
                 sampler=None):
        with self._lock:
            self._cache.append(s)
            if len(self._cache) > self.max_cached_images:
                idx = rng.randint(0, len(self._cache)) \
                    if self.random_pop else 0
                self._cache.pop(idx)
            if len(self._cache) <= 1:
                return s
            cache = list(self._cache)
        if rng.uniform(0, 1) > self.prob:
            return s

        def cache_sampler(r):
            return cache[r.randint(0, len(cache))]

        return MixUp.__call__(self, s, rng, cache_sampler)


# ---------------------------------------------------------------------------
# RandomAffine (transforms.py:2545)
# ---------------------------------------------------------------------------
@dataclass
class RandomAffine:
    max_rotate_degree: float = 10.0
    max_translate_ratio: float = 0.1
    scaling_ratio_range: Tuple[float, float] = (0.5, 1.5)
    max_shear_degree: float = 2.0
    border: Tuple[int, int] = (0, 0)   # (x, y); mosaic recipes use -scale/2
    border_val: Tuple[int, int, int] = (114, 114, 114)

    def __call__(self, s: Sample, rng: np.random.RandomState, sampler=None):
        import cv2
        h = s.img.shape[0] + self.border[1] * 2
        w = s.img.shape[1] + self.border[0] * 2

        rot = rng.uniform(-self.max_rotate_degree, self.max_rotate_degree)
        a = np.deg2rad(rot)
        rotation = np.array([[np.cos(a), -np.sin(a), 0],
                             [np.sin(a), np.cos(a), 0], [0, 0, 1]],
                            np.float32)
        scale = rng.uniform(*self.scaling_ratio_range)
        scaling = np.diag([scale, scale, 1]).astype(np.float32)
        sx = np.tan(np.deg2rad(rng.uniform(-self.max_shear_degree,
                                           self.max_shear_degree)))
        sy = np.tan(np.deg2rad(rng.uniform(-self.max_shear_degree,
                                           self.max_shear_degree)))
        shear = np.array([[1, sx, 0], [sy, 1, 0], [0, 0, 1]], np.float32)
        tx = rng.uniform(-self.max_translate_ratio,
                         self.max_translate_ratio) * w
        ty = rng.uniform(-self.max_translate_ratio,
                         self.max_translate_ratio) * h
        translate = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float32)
        # reference order: T @ Shear @ R @ Scale, about the origin
        # (transforms.py:2665-2666)
        warp = translate @ shear @ rotation @ scaling
        img = cv2.warpPerspective(s.img, warp, dsize=(w, h),
                                  borderValue=self.border_val)

        if len(s.boxes):
            n = len(s.boxes)
            corners = np.ones((n * 4, 3), np.float32)
            corners[:, :2] = s.boxes[:, [0, 1, 2, 1, 2, 3, 0, 3]].reshape(
                n * 4, 2)
            warped = (warp @ corners.T).T
            warped = warped[:, :2] / np.maximum(warped[:, 2:3], 1e-6)
            xs = warped[:, 0].reshape(n, 4)
            ys = warped[:, 1].reshape(n, 4)
            boxes = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)],
                             -1).astype(np.float32)
        else:
            boxes = s.boxes
        return _filter_inside(replace(s, img=img, boxes=boxes), h, w)


# ---------------------------------------------------------------------------
# RandomCrop (transforms.py:602)
# ---------------------------------------------------------------------------
@dataclass
class RandomRatioResize:
    """Keep-ratio resize to ``scale`` jittered by a uniformly drawn ratio —
    the reference's RandomResize(scale, ratio_range) (transforms.py
    RandomResize), used by the NAS-FPN / simple-copy-paste crop recipes."""
    scale: Tuple[int, int] = (640, 640)       # (w, h) reference order
    ratio_range: Tuple[float, float] = (0.8, 1.2)

    def __call__(self, s: Sample, rng: np.random.RandomState, sampler=None):
        from .transforms import rescale_size, resize_image
        ratio = rng.uniform(*self.ratio_range)
        target = (int(self.scale[0] * ratio), int(self.scale[1] * ratio))
        h, w = s.img.shape[:2]
        nh, nw = rescale_size(h, w, target)
        img = resize_image(s.img, (nh, nw))
        b = s.boxes.copy()
        b[:, 0::2] *= nw / w
        b[:, 1::2] *= nh / h
        return replace(s, img=img, boxes=b)


@dataclass
class RandomCrop:
    crop_size: Tuple[int, int] = (640, 640)   # (w, h) reference order
    crop_type: str = 'absolute'  # 'absolute' | 'relative' | *_range
    allow_negative_crop: bool = False

    def _size(self, h, w, rng):
        cw, ch = self.crop_size
        if self.crop_type == 'absolute':
            return min(int(ch), h), min(int(cw), w)
        if self.crop_type == 'absolute_range':
            ch_ = rng.randint(min(h, int(self.crop_size[0])),
                              min(h, int(self.crop_size[1])) + 1)
            cw_ = rng.randint(min(w, int(self.crop_size[0])),
                              min(w, int(self.crop_size[1])) + 1)
            return ch_, cw_
        if self.crop_type == 'relative':
            return int(h * ch + 0.5), int(w * cw + 0.5)
        # relative_range
        scale_h = self.crop_size[1] + rng.rand() * (1 - self.crop_size[1])
        scale_w = self.crop_size[0] + rng.rand() * (1 - self.crop_size[0])
        return int(h * scale_h + 0.5), int(w * scale_w + 0.5)

    def __call__(self, s: Sample, rng: np.random.RandomState, sampler=None):
        h, w = s.img.shape[:2]
        ch, cw = self._size(h, w, rng)
        yo = rng.randint(0, max(h - ch, 0) + 1)
        xo = rng.randint(0, max(w - cw, 0) + 1)
        img = s.img[yo:yo + ch, xo:xo + cw]
        b = s.boxes.copy()
        b[:, 0::2] -= xo
        b[:, 1::2] -= yo
        out = _filter_inside(replace(s, img=img, boxes=b), ch, cw)
        if len(out.boxes) == 0 and len(s.boxes) and \
                not self.allow_negative_crop:
            return s  # keep the uncropped sample rather than lose all gt
        return out


# ---------------------------------------------------------------------------
# PhotoMetricDistortion (transforms.py:892)
# ---------------------------------------------------------------------------
@dataclass
class PhotoMetricDistortion:
    brightness_delta: int = 32
    contrast_range: Tuple[float, float] = (0.5, 1.5)
    saturation_range: Tuple[float, float] = (0.5, 1.5)
    hue_delta: int = 18

    def __call__(self, s: Sample, rng: np.random.RandomState, sampler=None):
        import cv2
        img = s.img.astype(np.float32)
        mode = rng.randint(2)
        if rng.randint(2):
            img += rng.uniform(-self.brightness_delta, self.brightness_delta)
        alpha = rng.uniform(*self.contrast_range)
        contrast_flag = rng.randint(2)
        if mode == 1 and contrast_flag:
            img *= alpha
        # float32 HSV: H in [0, 360], S in [0, 1]
        hsv = cv2.cvtColor(img.clip(0, 255) / 255.0, cv2.COLOR_RGB2HSV)
        if rng.randint(2):
            sat = rng.uniform(*self.saturation_range)
            hsv[..., 1] *= sat
            if sat > 1:
                hsv[..., 1] = hsv[..., 1].clip(0, 1)
        if rng.randint(2):
            hsv[..., 0] += rng.uniform(-self.hue_delta, self.hue_delta)
            hsv[..., 0][hsv[..., 0] > 360] -= 360
            hsv[..., 0][hsv[..., 0] < 0] += 360
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB) * 255.0
        if mode == 0 and contrast_flag:
            img *= alpha
        if rng.randint(2):
            img = img[..., rng.permutation(3)]
        return replace(s, img=img.clip(0, 255).astype(np.uint8))


# ---------------------------------------------------------------------------
# YOLOXHSVRandomAug
# ---------------------------------------------------------------------------
@dataclass
class YOLOXHSVRandomAug:
    hue_delta: int = 5
    saturation_delta: int = 30
    value_delta: int = 30

    def __call__(self, s: Sample, rng: np.random.RandomState, sampler=None):
        import cv2
        dh = rng.uniform(-1, 1) * self.hue_delta
        ds = rng.uniform(-1, 1) * self.saturation_delta
        dv = rng.uniform(-1, 1) * self.value_delta
        hsv = cv2.cvtColor(s.img, cv2.COLOR_RGB2HSV).astype(np.int16)
        hsv[..., 0] = (hsv[..., 0] + int(dh)) % 180
        hsv[..., 1] = (hsv[..., 1] + int(ds)).clip(0, 255)
        hsv[..., 2] = (hsv[..., 2] + int(dv)).clip(0, 255)
        img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
        return replace(s, img=img)


# ---------------------------------------------------------------------------
# Expand (transforms.py:1022)
# ---------------------------------------------------------------------------
@dataclass
class Expand:
    mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    ratio_range: Tuple[float, float] = (1.0, 4.0)
    prob: float = 0.5

    def __call__(self, s: Sample, rng: np.random.RandomState, sampler=None):
        if rng.uniform(0, 1) > self.prob:
            return s
        h, w = s.img.shape[:2]
        ratio = rng.uniform(*self.ratio_range)
        nh, nw = int(h * ratio), int(w * ratio)
        canvas = np.empty((nh, nw, 3), s.img.dtype)
        canvas[...] = np.asarray(self.mean, s.img.dtype)
        top = int(rng.uniform(0, nh - h))
        left = int(rng.uniform(0, nw - w))
        canvas[top:top + h, left:left + w] = s.img
        b = s.boxes.copy()
        b[:, 0::2] += left
        b[:, 1::2] += top
        return replace(s, img=canvas, boxes=b)


# ---------------------------------------------------------------------------
# MinIoURandomCrop (transforms.py:1146)
# ---------------------------------------------------------------------------
@dataclass
class MinIoURandomCrop:
    min_ious: Tuple[float, ...] = (0.1, 0.3, 0.5, 0.7, 0.9)
    min_crop_size: float = 0.3

    def __call__(self, s: Sample, rng: np.random.RandomState, sampler=None):
        h, w = s.img.shape[:2]
        sample_modes = (1, *self.min_ious, 0)
        while True:
            mode = sample_modes[rng.randint(len(sample_modes))]
            if mode == 1:
                return s
            min_iou = mode
            for _ in range(50):
                new_w = rng.uniform(self.min_crop_size * w, w)
                new_h = rng.uniform(self.min_crop_size * h, h)
                if new_h / new_w < 0.5 or new_h / new_w > 2:
                    continue
                left = rng.uniform(0, w - new_w)
                top = rng.uniform(0, h - new_h)
                patch = np.array([int(left), int(top), int(left + new_w),
                                  int(top + new_h)])
                if patch[2] == patch[0] or patch[3] == patch[1]:
                    continue
                if len(s.boxes):
                    lt = np.maximum(s.boxes[:, :2], patch[:2])
                    rb = np.minimum(s.boxes[:, 2:], patch[2:])
                    wh = (rb - lt).clip(0)
                    inter = wh[:, 0] * wh[:, 1]
                    area_b = ((s.boxes[:, 2] - s.boxes[:, 0]) *
                              (s.boxes[:, 3] - s.boxes[:, 1]))
                    area_p = (patch[2] - patch[0]) * (patch[3] - patch[1])
                    ious = inter / np.maximum(
                        area_b + area_p - inter, 1e-10)
                    if len(ious) and ious.min() < min_iou:
                        continue
                    centers = (s.boxes[:, :2] + s.boxes[:, 2:]) / 2
                    keep = ((centers[:, 0] > patch[0]) &
                            (centers[:, 1] > patch[1]) &
                            (centers[:, 0] < patch[2]) &
                            (centers[:, 1] < patch[3]))
                    if not keep.any():
                        continue
                    b = s.boxes[keep].copy()
                    b[:, 0::2] = b[:, 0::2].clip(patch[0], patch[2])
                    b[:, 1::2] = b[:, 1::2].clip(patch[1], patch[3])
                    b[:, 0::2] -= patch[0]
                    b[:, 1::2] -= patch[1]
                    labels = s.labels[keep]
                    ignore = s.ignore[keep]
                else:
                    b, labels, ignore = s.boxes, s.labels, s.ignore
                img = s.img[patch[1]:patch[3], patch[0]:patch[2]]
                return Sample(img, b.astype(np.float32), labels, ignore)


# ---------------------------------------------------------------------------
# CopyPaste (transforms.py:2773, configs/simple_copy_paste)
# ---------------------------------------------------------------------------
def _crop_to_bitmap(crop, box, h, w):
    """Box-normalized mask crop -> full-image bitmap."""
    from .transforms import resize_image
    x1, y1, x2, y2 = [int(round(v)) for v in box]
    x1, y1 = max(x1, 0), max(y1, 0)
    x2, y2 = min(x2, w), min(y2, h)
    out = np.zeros((h, w), np.uint8)
    if x2 > x1 and y2 > y1:
        # cv2.resize drops a trailing singleton channel -> keep it 2D
        patch = resize_image((crop * 255).astype(np.uint8),
                             (y2 - y1, x2 - x1))
        out[y1:y2, x1:x2] = patch.reshape(y2 - y1, x2 - x1) >= 128
    return out


def _bitmap_to_crop(bitmap, box, res):
    from .transforms import resize_image
    h, w = bitmap.shape
    x1, y1, x2, y2 = [int(round(v)) for v in box]
    x1, y1 = max(x1, 0), max(y1, 0)
    x2, y2 = min(max(x2, x1 + 1), w), min(max(y2, y1 + 1), h)
    patch = bitmap[y1:y2, x1:x2].astype(np.uint8) * 255
    return (resize_image(patch, (res, res)).reshape(res, res) >=
            128).astype(np.float32)


@dataclass
class CopyPaste:
    """Simple Copy-Paste (transforms.py:2773): paste a random subset of
    another image's instances onto this one; destination instances keep
    only their un-occluded remainder (boxes recomputed from the updated
    bitmaps, instances dropped when the box moved more than
    ``bbox_occluded_thr`` px on every side AND the remaining mask area is
    below ``mask_occluded_thr``). Operates on the repo's box-normalized
    mask-crop layout by round-tripping through full-image bitmaps.
    """
    max_num_pasted: int = 100
    bbox_occluded_thr: int = 10
    mask_occluded_thr: int = 300
    mask_res: int = 56

    def __call__(self, sample: Sample, rng: np.random.RandomState,
                 sampler: Callable):
        """Pipeline protocol: draw the paste source via ``sampler`` and
        composite; masks ride on ``Sample.masks``. The source is rescaled
        onto the destination canvas first (the reference guarantees equal
        sizes via its shared RandomResize; transforms here run
        pre-resize)."""
        assert sample.masks is not None, \
            'CopyPaste needs instance masks (with_mask dataset)'
        src = sampler(rng)
        if src.masks is None:
            return sample
        h, w = sample.img.shape[:2]
        sh, sw = src.img.shape[:2]
        if (sh, sw) != (h, w):
            scale = np.array([w / sw, h / sh, w / sw, h / sh], np.float32)
            src = replace(src, img=resize_image(src.img, (h, w)),
                          boxes=src.boxes * scale)
        out, out_masks = self.paste(sample, sample.masks, src, src.masks,
                                    rng)
        return replace(out, masks=out_masks)

    def paste(self, dst: Sample, dst_masks, src: Sample, src_masks,
              rng: np.random.RandomState):
        """masks: per-instance box-normalized crops (list of (r, r))."""
        h, w = dst.img.shape[:2]
        n_src = len(src.boxes)
        if n_src == 0:
            return dst, dst_masks
        n_sel = rng.randint(0, min(n_src, self.max_num_pasted)) + 1
        sel = rng.choice(n_src, size=min(n_sel, n_src), replace=False)
        src_bitmaps = [
            _crop_to_bitmap(src_masks[i], src.boxes[i], h, w)
            for i in sel]
        composed = np.zeros((h, w), np.uint8)
        for m in src_bitmaps:
            composed |= m
        # occlude destination instances
        dst_bitmaps = [
            _crop_to_bitmap(dst_masks[i], dst.boxes[i], h, w) & ~composed
            for i in range(len(dst.boxes))]
        new_boxes = []
        keep = []
        for i, m in enumerate(dst_bitmaps):
            ys, xs = np.nonzero(m)
            if len(ys) == 0:
                # fully occluded: empty-mask box is all-zero (reference
                # get_bboxes on an empty BitmapMask) -> fails the box test
                nb = np.zeros(4, np.float32)
            else:
                nb = np.asarray([xs.min(), ys.min(), xs.max() + 1,
                                 ys.max() + 1], np.float32)
            new_boxes.append(nb)
            moved = np.abs(nb - dst.boxes[i])
            keep.append(bool((moved <= self.bbox_occluded_thr).all() or
                             m.sum() > self.mask_occluded_thr))
        keep = np.asarray(keep, bool)
        src_img = src.img
        if src_img.shape[:2] != (h, w):  # same-canvas requirement
            from .transforms import resize_image
            src_img = resize_image(src_img, (h, w))
        img = (dst.img * (1 - composed[..., None]) +
               src_img * composed[..., None]).astype(dst.img.dtype)
        out_boxes = [b for b, k in zip(new_boxes, keep) if k]
        out_boxes += [src.boxes[i] for i in sel]
        out_labels = np.concatenate([dst.labels[keep],
                                     src.labels[sel]]).astype(np.int32)
        out_ignore = np.concatenate([dst.ignore[keep],
                                     np.zeros(len(sel), bool)])
        out_masks = [
            _bitmap_to_crop(m, b, self.mask_res)
            for m, b, k in zip(dst_bitmaps, new_boxes, keep) if k]
        out_masks += [_bitmap_to_crop(b2, src.boxes[i], self.mask_res)
                      for b2, i in zip(src_bitmaps, sel)]
        out = Sample(img=img,
                     boxes=np.asarray(out_boxes, np.float32).reshape(-1, 4),
                     labels=out_labels, ignore=out_ignore)
        return out, out_masks


# ---------------------------------------------------------------------------
# InstaBoost (datasets/transforms/instaboost.py + configs/instaboost)
# ---------------------------------------------------------------------------
@dataclass
class InstaBoost:
    """InstaBoost (arXiv 1908.07801): probability-map-guided copy-paste of
    an image's OWN instances. The reference wraps the external
    ``instaboostfast`` package (instaboost.py:66-79) with
    action_candidate=('normal','horizontal','skip'), action_prob=(1,0,0)
    — i.e. the shipped configs only ever take the 'normal' action: each
    instance is cut out via its mask, randomly rescaled
    (``scale``=(0.8,1.2)), shifted by up to width/``dx`` x height/``dy``
    and rotated by ``theta`` degrees, the hole is background-inpainted,
    and the instance is pasted back at the jittered placement. Applied to
    a whole image with probability ``aug_ratio``.

    This is a from-the-paper reimplementation of that 'normal' action on
    the repo's box-normalized mask-crop layout (no external dep; the
    heatmap-guided hflag=False path, matching every reference config).
    """
    scale: Tuple[float, float] = (0.8, 1.2)
    dx: int = 15
    dy: int = 15
    theta: Tuple[float, float] = (-1.0, 1.0)
    aug_ratio: float = 0.5
    mask_res: int = 56

    def __call__(self, sample: Sample, rng: np.random.RandomState,
                 sampler: Callable = None):
        assert sample.masks is not None, \
            'InstaBoost needs instance masks (with_mask dataset)'
        if rng.rand() >= self.aug_ratio or len(sample.boxes) == 0:
            return sample
        import cv2
        h, w = sample.img.shape[:2]
        img = sample.img.copy()
        boxes = sample.boxes.copy()
        masks = list(sample.masks)

        # cut all instances out and inpaint the holes once
        bitmaps = [_crop_to_bitmap(masks[i], boxes[i], h, w)
                   for i in range(len(boxes))]
        hole = np.zeros((h, w), np.uint8)
        for m in bitmaps:
            hole |= m
        background = cv2.inpaint(img, hole * 255, 3, cv2.INPAINT_TELEA)

        out = background
        new_boxes, new_masks, keep = [], [], []
        for i, m in enumerate(bitmaps):
            bw = boxes[i, 2] - boxes[i, 0]
            bh = boxes[i, 3] - boxes[i, 1]
            cx = (boxes[i, 0] + boxes[i, 2]) / 2
            cy = (boxes[i, 1] + boxes[i, 3]) / 2
            s = rng.uniform(*self.scale)
            tx = rng.uniform(-bw / self.dx, bw / self.dx)
            ty = rng.uniform(-bh / self.dy, bh / self.dy)
            ang = rng.uniform(*self.theta)
            rot = cv2.getRotationMatrix2D((float(cx), float(cy)), ang, s)
            rot[:, 2] += (tx, ty)
            warped = cv2.warpAffine(m, rot, (w, h),
                                    flags=cv2.INTER_NEAREST)
            pix = cv2.warpAffine(img * m[..., None], rot, (w, h),
                                 flags=cv2.INTER_LINEAR)
            ys, xs = np.nonzero(warped)
            if len(ys) == 0:
                keep.append(False)
                continue
            keep.append(True)
            out = np.where(warped[..., None] > 0, pix, out)
            nb = np.asarray([xs.min(), ys.min(), xs.max() + 1,
                             ys.max() + 1], np.float32)
            new_boxes.append(nb)
            new_masks.append(_bitmap_to_crop(warped, nb, self.mask_res))
        keep = np.asarray(keep, bool)
        return Sample(img=out.astype(np.uint8),
                      boxes=np.asarray(new_boxes, np.float32).reshape(-1, 4),
                      labels=sample.labels[keep],
                      ignore=sample.ignore[keep],
                      masks=new_masks)
