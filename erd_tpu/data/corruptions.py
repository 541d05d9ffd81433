"""Image corruptions for robustness benchmarking (host-side numpy/cv2).

Counterpart of the `imagecorruptions` package driving the reference's
tools/analysis_tools/test_robustness.py (mmdet passes
``corruption``/``severity`` through its test pipeline). Each corruption
maps (H, W, 3) uint8 RGB -> uint8 at severity 1..5, implemented from the
published benchmark definitions (Hendrycks & Dietterich, ICLR 2019) in
original numpy/cv2 code.

All 15 benchmark corruptions ship: `frost` synthesizes its texture
procedurally (the published op overlays bundled frost photographs; this
environment has zero egress), and `glass_blur` uses the standard
vectorized batched-gather form of the published per-pixel swap loop.
`elastic` uses cv2.remap. The registry order groups noise / blur /
weather / digital like the benchmark does.
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


def _frost_texture(h, w, rng):
    """Procedural frost: plasma-fractal ridges sharpened into crystalline
    streaks (stands in for imagecorruptions' bundled frost photographs —
    zero-egress environment, so the texture is synthesized)."""
    size = 1 << int(np.ceil(np.log2(max(h, w, 2))))
    base = _plasma_fractal(size=size, wibbledecay=2.0, rng=rng)[:h, :w]
    # ridge transform: distance from the mid-level set makes vein-like
    # structures; a directional motion blur elongates them into streaks
    veins = 1.0 - np.abs(base - 0.5) * 2.0
    veins = np.clip(veins, 0, 1) ** 4
    if cv2 is not None:
        k = np.zeros((9, 9), np.float32)
        k[4, :] = 1.0 / 9
        ang = rng.uniform(0, 180)
        m = cv2.getRotationMatrix2D((4, 4), ang, 1.0)
        k = cv2.warpAffine(k, m, (9, 9))
        veins = cv2.filter2D(veins.astype(np.float32), -1, k)
        veins = cv2.GaussianBlur(veins, (0, 0), 0.8)
    sparkle = (rng.rand(h, w) < 0.02).astype(np.float32)
    return np.clip(veins * 0.9 + sparkle, 0, 1)


def frost(img, severity=1, rng=None):
    c = [(1.0, 0.4), (0.8, 0.6), (0.7, 0.7), (0.65, 0.7),
         (0.6, 0.75)][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = _as_float(img)
    h, w = x.shape[:2]
    tex = _frost_texture(h, w, rng)[..., None]
    # frost overlays as a bright icy film (the published op is
    # c0*x + c1*frost_image; the texture here is synthesized white frost)
    frost_rgb = tex * np.asarray([0.92, 0.95, 1.0], np.float32)
    return _to_uint8(c[0] * x + c[1] * frost_rgb)


def glass_blur(img, severity=1, rng=None):
    """Vectorized glass blur: gaussian blur, then ``iterations`` rounds of
    per-pixel random-neighbor displacement (the published version's python
    double loop performs sequential swaps; the batched gather here is the
    standard fast approximation), then a final blur."""
    c = [(0.7, 1, 2), (0.9, 2, 1), (1, 2, 3), (1.1, 3, 2),
         (1.5, 4, 2)][severity - 1]
    sigma, max_delta, iters = c
    rng = rng or np.random.RandomState(0)
    x = _as_float(img)
    if cv2 is not None:
        x = cv2.GaussianBlur(x, (0, 0), sigma)
    h, w = x.shape[:2]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    for _ in range(iters):
        dy = rng.randint(-max_delta, max_delta + 1, (h, w))
        dx = rng.randint(-max_delta, max_delta + 1, (h, w))
        yy = np.clip(ys + dy, 0, h - 1)
        xx = np.clip(xs + dx, 0, w - 1)
        x = x[yy, xx]
    if cv2 is not None:
        x = cv2.GaussianBlur(x, (0, 0), sigma)
    return _to_uint8(x)


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
    'frost': frost,
    'glass_blur': glass_blur,
}

# the reference's default benchmark subset (the imagecorruptions 15;
# 'frost' uses a synthesized texture, 'glass_blur' the vectorized form)
BENCHMARK_CORRUPTIONS = (
    'gaussian_noise', 'shot_noise', 'impulse_noise', 'defocus_blur',
    'glass_blur', 'motion_blur', 'zoom_blur', 'frost', 'fog', 'snow',
    'brightness', 'contrast', 'pixelate', 'jpeg_compression',
    'elastic_transform',
)


def corrupt(img, corruption: str, severity: int, seed: int = 0):
    """Apply a named corruption at severity 1..5 (0 = identity)."""
    if severity == 0:
        return np.asarray(img, np.uint8)
    assert 1 <= severity <= 5, severity
    fn = CORRUPTIONS[corruption]
    return fn(np.asarray(img, np.uint8), severity,
              rng=np.random.RandomState(seed))
