"""Image corruptions for robustness benchmarking (host-side numpy/cv2).

Counterpart of the `imagecorruptions` package driving the reference's
tools/analysis_tools/test_robustness.py (mmdet passes
``corruption``/``severity`` through its test pipeline). Each corruption
maps (H, W, 3) uint8 RGB -> uint8 at severity 1..5, implemented from the
published benchmark definitions (Hendrycks & Dietterich, ICLR 2019) in
original numpy/cv2 code.

`frost` needs bundled frost textures and `glass_blur`'s iterated pixel
shuffle is pathologically slow — both are intentionally absent (the
reference's own benchmark config lets you pick subsets); `elastic` uses
cv2.remap. The registry order groups noise / blur / weather / digital
like the benchmark does.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _as_float(img):
    return np.asarray(img, np.float32) / 255.0


def _to_uint8(x):
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# noise
# ---------------------------------------------------------------------------
def gaussian_noise(img, severity=1, rng=None):
    c = [0.08, 0.12, 0.18, 0.26, 0.38][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = _as_float(img)
    return _to_uint8(x + rng.normal(size=x.shape, scale=c))


def shot_noise(img, severity=1, rng=None):
    c = [60, 25, 12, 5, 3][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = _as_float(img)
    return _to_uint8(rng.poisson(x * c) / float(c))


def impulse_noise(img, severity=1, rng=None):
    """Salt-and-pepper: flip a fraction of pixels to 0 or 1."""
    c = [0.03, 0.06, 0.09, 0.17, 0.27][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = _as_float(img).copy()
    flip = rng.uniform(size=x.shape[:2])
    x[flip < c / 2] = 0.0
    x[flip > 1 - c / 2] = 1.0
    return _to_uint8(x)


def speckle_noise(img, severity=1, rng=None):
    c = [0.15, 0.2, 0.35, 0.45, 0.6][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = _as_float(img)
    return _to_uint8(x + x * rng.normal(size=x.shape, scale=c))


# ---------------------------------------------------------------------------
# blur
# ---------------------------------------------------------------------------
def _disk_kernel(radius, alias_blur=0.1):
    size = max(int(radius) * 2 + 1, 3)
    xs = np.arange(-(size // 2), size // 2 + 1)
    xx, yy = np.meshgrid(xs, xs)
    k = ((xx ** 2 + yy ** 2) <= radius ** 2).astype(np.float32)
    if cv2 is not None and alias_blur > 0:
        k = cv2.GaussianBlur(k, (3, 3), alias_blur)
    return k / k.sum()


def defocus_blur(img, severity=1, rng=None):
    radius, alias = [(3, 0.1), (4, 0.5), (6, 0.5), (8, 0.5),
                     (10, 0.5)][severity - 1]
    k = _disk_kernel(radius, alias)
    x = _as_float(img)
    return _to_uint8(cv2.filter2D(x, -1, k))


def motion_blur(img, severity=1, rng=None):
    size, angle = [(10, 45), (15, 45), (15, 30), (20, 30),
                   (25, 20)][severity - 1]
    k = np.zeros((size, size), np.float32)
    k[size // 2, :] = 1.0
    m = cv2.getRotationMatrix2D((size / 2 - 0.5, size / 2 - 0.5), angle,
                                1.0)
    k = cv2.warpAffine(k, m, (size, size))
    k /= k.sum()
    x = _as_float(img)
    return _to_uint8(cv2.filter2D(x, -1, k))


def gaussian_blur(img, severity=1, rng=None):
    c = [1, 2, 3, 4, 6][severity - 1]
    x = _as_float(img)
    return _to_uint8(cv2.GaussianBlur(x, (0, 0), c))


def zoom_blur(img, severity=1, rng=None):
    zooms = [np.arange(1, 1.11, 0.01), np.arange(1, 1.16, 0.01),
             np.arange(1, 1.21, 0.02), np.arange(1, 1.26, 0.02),
             np.arange(1, 1.31, 0.03)][severity - 1]
    x = _as_float(img)
    h, w = x.shape[:2]
    out = np.zeros_like(x)
    for z in zooms:
        zh, zw = int(np.ceil(h * z)), int(np.ceil(w * z))
        zoomed = cv2.resize(x, (zw, zh), interpolation=cv2.INTER_LINEAR)
        top = (zh - h) // 2
        left = (zw - w) // 2
        out += zoomed[top:top + h, left:left + w]
    return _to_uint8((x + out) / (len(zooms) + 1))


# ---------------------------------------------------------------------------
# weather
# ---------------------------------------------------------------------------
def _plasma_fractal(size=256, wibbledecay=3.0, rng=None):
    """Diamond-square heightmap in [0, 1] for fog."""
    rng = rng or np.random.RandomState(0)
    n = 1 << int(np.ceil(np.log2(size)))
    arr = np.zeros((n + 1, n + 1), np.float32)
    step = n
    wibble = 100.0
    while step > 1:
        half = step // 2
        # diamond
        blocks = arr[0:n:step, 0:n:step]
        mids = (blocks + np.roll(blocks, -1, 0) + np.roll(blocks, -1, 1) +
                np.roll(np.roll(blocks, -1, 0), -1, 1)) / 4.0
        arr[half:n:step, half:n:step] = mids + rng.uniform(
            -wibble, wibble, mids.shape)
        # square
        for (oy, ox) in ((half, 0), (0, half)):
            ys = np.arange(oy, n + (oy > 0), step)
            xs = np.arange(ox, n + (ox > 0), step)
            yy, xx = np.meshgrid(ys, xs, indexing='ij')
            s = (arr[(yy - half) % n, xx % n] + arr[(yy + half) % n, xx % n] +
                 arr[yy % n, (xx - half) % n] + arr[yy % n, (xx + half) % n]) / 4.0
            arr[yy % (n + 1), xx % (n + 1)] = s + rng.uniform(
                -wibble, wibble, s.shape)
        step = half
        wibble /= wibbledecay
    arr = arr[:size, :size]
    arr -= arr.min()
    return arr / max(arr.max(), 1e-6)


def fog(img, severity=1, rng=None):
    c, decay = [(1.5, 2.0), (2.0, 2.0), (2.5, 1.7), (2.5, 1.5),
                (3.0, 1.4)][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = _as_float(img)
    h, w = x.shape[:2]
    size = 1 << int(np.ceil(np.log2(max(h, w))))
    plasma = _plasma_fractal(size, decay, rng)[:h, :w]
    mx = x.max()
    x = x + c * plasma[..., None]
    return _to_uint8(x * mx / max(x.max(), 1e-6))


def snow(img, severity=1, rng=None):
    loc, scale, zoom, thresh, blur, blend = [
        (0.1, 0.3, 3.0, 0.5, 10, 0.8), (0.2, 0.3, 2.0, 0.5, 12, 0.7),
        (0.55, 0.3, 4.0, 0.9, 12, 0.7), (0.55, 0.3, 4.5, 0.85, 12, 0.65),
        (0.55, 0.3, 2.5, 0.85, 12, 0.6)][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = _as_float(img)
    h, w = x.shape[:2]
    layer = rng.normal(size=(h // 4, w // 4), loc=loc, scale=scale)
    layer = cv2.resize(layer, (w, h), interpolation=cv2.INTER_LINEAR)
    layer[layer < thresh] = 0.0
    k = np.zeros((blur, blur), np.float32)
    k[blur // 2, :] = 1.0 / blur  # streaks
    m = cv2.getRotationMatrix2D((blur / 2 - 0.5, blur / 2 - 0.5),
                                rng.uniform(-135, -45), 1.0)
    k = cv2.warpAffine(k, m, (blur, blur))
    layer = cv2.filter2D(layer, -1, k)
    layer = np.clip(layer * zoom, 0, 1)[..., None]
    gray = cv2.cvtColor((x * 255).astype(np.uint8),
                        cv2.COLOR_RGB2GRAY)[..., None] / 255.0
    x = blend * x + (1 - blend) * np.maximum(x, gray * 1.5 + 0.5)
    return _to_uint8(np.clip(x + layer + np.rot90(layer, 2), 0, 1))


# ---------------------------------------------------------------------------
# digital
# ---------------------------------------------------------------------------
def brightness(img, severity=1, rng=None):
    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    return _to_uint8(_as_float(img) + c)


def contrast(img, severity=1, rng=None):
    c = [0.4, 0.3, 0.2, 0.1, 0.05][severity - 1]
    x = _as_float(img)
    mean = x.mean(axis=(0, 1), keepdims=True)
    return _to_uint8((x - mean) * c + mean)


def saturate(img, severity=1, rng=None):
    mult, add = [(0.3, 0), (0.1, 0), (2.0, 0), (5.0, 0.1),
                 (20.0, 0.2)][severity - 1]
    hsv = cv2.cvtColor(np.asarray(img, np.uint8),
                       cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * mult + add * 255, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def pixelate(img, severity=1, rng=None):
    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = img.shape[:2]
    small = cv2.resize(np.asarray(img, np.uint8),
                       (max(int(w * c), 1), max(int(h * c), 1)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def jpeg_compression(img, severity=1, rng=None):
    c = [25, 18, 15, 10, 7][severity - 1]
    ok, enc = cv2.imencode('.jpg', cv2.cvtColor(np.asarray(img, np.uint8),
                                                cv2.COLOR_RGB2BGR),
                           [int(cv2.IMWRITE_JPEG_QUALITY), c])
    assert ok
    return cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR),
                        cv2.COLOR_BGR2RGB)


def elastic_transform(img, severity=1, rng=None):
    alpha, sigma = [(2.0, 0.7), (2.0, 0.08), (0.05, 0.01), (0.07, 0.01),
                    (0.12, 0.01)][severity - 1]
    rng = rng or np.random.RandomState(0)
    h, w = img.shape[:2]
    scale = min(h, w)
    dx = cv2.GaussianBlur(
        rng.uniform(-1, 1, (h, w)).astype(np.float32), (0, 0),
        sigma * scale) * alpha * scale * 0.05
    dy = cv2.GaussianBlur(
        rng.uniform(-1, 1, (h, w)).astype(np.float32), (0, 0),
        sigma * scale) * alpha * scale * 0.05
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    return cv2.remap(np.asarray(img, np.uint8), xx + dx, yy + dy,
                     cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


CORRUPTIONS = {
    'gaussian_noise': gaussian_noise,
    'shot_noise': shot_noise,
    'impulse_noise': impulse_noise,
    'speckle_noise': speckle_noise,
    'defocus_blur': defocus_blur,
    'motion_blur': motion_blur,
    'gaussian_blur': gaussian_blur,
    'zoom_blur': zoom_blur,
    'fog': fog,
    'snow': snow,
    'brightness': brightness,
    'contrast': contrast,
    'saturate': saturate,
    'pixelate': pixelate,
    'jpeg_compression': jpeg_compression,
    'elastic_transform': elastic_transform,
}

# the reference's default benchmark subset (imagecorruptions 15 minus the
# asset-dependent 'frost' and iterated 'glass_blur')
BENCHMARK_CORRUPTIONS = (
    'gaussian_noise', 'shot_noise', 'impulse_noise', 'defocus_blur',
    'motion_blur', 'zoom_blur', 'fog', 'snow', 'brightness', 'contrast',
    'pixelate', 'jpeg_compression', 'elastic_transform',
)


def corrupt(img, corruption: str, severity: int, seed: int = 0):
    """Apply a named corruption at severity 1..5 (0 = identity)."""
    if severity == 0:
        return np.asarray(img, np.uint8)
    assert 1 <= severity <= 5, severity
    fn = CORRUPTIONS[corruption]
    return fn(np.asarray(img, np.uint8), severity,
              rng=np.random.RandomState(seed))
