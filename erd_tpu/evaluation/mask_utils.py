"""Host-side instance-mask utilities for segm evaluation.

Covers the reference's mask scoring path without pycocotools:

  * ``paste_masks``: numpy mirror of FCNMaskHead._predict_by_feat /
    _do_paste_mask (/root/reference/mmdet/models/roi_heads/mask_heads/
    fcn_mask_head.py:278-400): bilinear grid-sample of the 28x28 probability
    map into the original image frame (align_corners=False, zero padding),
    thresholded at 0.5.
  * COCO-compatible RLE encode/decode (column-major runs; the compressed
    'counts' string uses the pycocotools 6-bit/continuation-bit scheme with
    delta coding, so dumped segm json is consumable by pycocotools).
  * ``mask_iou``: (D, G) IoU on RLE masks with IoF for crowd columns
    (maskUtils.iou semantics).
  * ``polygons_to_bitmap``: gt rasterization via cv2.fillPoly.

Evaluation runs offline on the host, so plain numpy is the right tool; the
detection masks come off the TPU as fixed-size (max_per_img, 28, 28) arrays.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Pasting (device mask crops -> full image frame)
# ---------------------------------------------------------------------------
def paste_mask(mask: np.ndarray, box, h: int, w: int,
               threshold: float = 0.5) -> np.ndarray:
    """Paste one (m, m) probability mask into an (h, w) bool canvas.

    Mirrors _do_paste_mask with skip_empty: sampling happens only inside the
    integer-clipped box; grid_sample(align_corners=False, padding='zeros')
    semantics.
    """
    m = mask.shape[0]
    x0 = max(int(np.floor(box[0])) - 1, 0)
    y0 = max(int(np.floor(box[1])) - 1, 0)
    x1 = min(int(np.ceil(box[2])) + 1, w)
    y1 = min(int(np.ceil(box[3])) + 1, h)
    out = np.zeros((h, w), bool)
    if x1 <= x0 or y1 <= y0:
        return out
    bw = max(box[2] - box[0], 1e-6)
    bh = max(box[3] - box[1], 1e-6)
    # normalized [-1, 1] coords of target pixel centers within the box
    gy = ((np.arange(y0, y1) + 0.5) - box[1]) / bh * 2 - 1
    gx = ((np.arange(x0, x1) + 0.5) - box[0]) / bw * 2 - 1
    # align_corners=False: ix = ((gx + 1) * M - 1) / 2
    fy = ((gy + 1) * m - 1) / 2
    fx = ((gx + 1) * m - 1) / 2
    y0i = np.floor(fy).astype(np.int64)
    x0i = np.floor(fx).astype(np.int64)
    wy = fy - y0i
    wx = fx - x0i

    def sample(yy, xx):
        oky = (yy >= 0) & (yy < m)
        okx = (xx >= 0) & (xx < m)
        yc = np.clip(yy, 0, m - 1)
        xc = np.clip(xx, 0, m - 1)
        v = mask[yc[:, None], xc[None, :]].astype(np.float32)
        return v * (oky[:, None] & okx[None, :])

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    wyc = wy[:, None].astype(np.float32)
    wxc = wx[None, :].astype(np.float32)
    patch = (v00 * (1 - wyc) * (1 - wxc) + v01 * (1 - wyc) * wxc +
             v10 * wyc * (1 - wxc) + v11 * wyc * wxc)
    out[y0:y1, x0:x1] = patch >= threshold
    return out


def paste_masks(masks: np.ndarray, boxes: np.ndarray, h: int, w: int,
                threshold: float = 0.5) -> List[np.ndarray]:
    """(D, m, m) probability masks + (D, 4) xyxy -> D (h, w) bool bitmaps."""
    return [paste_mask(masks[i], boxes[i], h, w, threshold)
            for i in range(len(masks))]


# ---------------------------------------------------------------------------
# RLE (COCO column-major run-length encoding)
# ---------------------------------------------------------------------------
def rle_encode(bitmap: np.ndarray) -> Dict:
    """(h, w) bool -> {'size': [h, w], 'counts': np.ndarray of runs}.

    Runs are column-major (Fortran order) alternating background/foreground,
    starting with background, exactly like pycocotools.
    """
    h, w = bitmap.shape
    flat = np.asfortranarray(bitmap).reshape(-1, order='F').astype(np.int8)
    # run boundaries
    diff = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], diff, [flat.size]])
    counts = np.diff(idx)
    if flat.size and flat[0] == 1:
        counts = np.concatenate([[0], counts])
    if flat.size == 0:
        counts = np.asarray([0], np.int64)
    return {'size': [int(h), int(w)], 'counts': counts.astype(np.int64)}


def rle_decode(rle: Dict) -> np.ndarray:
    h, w = rle['size']
    counts = np.asarray(rle['counts'], np.int64)
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    if flat.size < h * w:
        flat = np.concatenate([flat, np.zeros(h * w - flat.size, np.uint8)])
    return flat.reshape((h, w), order='F').astype(bool)


def rle_area(rle: Dict) -> int:
    counts = np.asarray(rle['counts'], np.int64)
    return int(counts[1::2].sum())


def rle_to_string(rle: Dict) -> str:
    """Compress integer runs into the pycocotools 'counts' string."""
    cnts = [int(c) for c in rle['counts']]
    out = []
    for i, x in enumerate(cnts):
        if i > 2:
            x -= cnts[i - 2]
        more = True
        while more:
            c = x & 0x1f
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return ''.join(out)


def string_to_rle(s: str, h: int, w: int) -> Dict:
    cnts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1f) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return {'size': [h, w], 'counts': np.asarray(cnts, np.int64)}


# ---------------------------------------------------------------------------
# IoU
# ---------------------------------------------------------------------------
def mask_iou(dt_rles: Sequence[Dict], gt_rles: Sequence[Dict],
             iscrowd: np.ndarray) -> np.ndarray:
    """(D, G) mask IoU; crowd gt columns use intersection / det area."""
    D, G = len(dt_rles), len(gt_rles)
    if D == 0 or G == 0:
        return np.zeros((D, G))
    d = np.stack([rle_decode(r).reshape(-1) for r in dt_rles]).astype(
        np.float32)
    g = np.stack([rle_decode(r).reshape(-1) for r in gt_rles]).astype(
        np.float32)
    inter = d @ g.T
    da = d.sum(axis=1)[:, None]
    ga = g.sum(axis=1)[None, :]
    union = np.where(np.asarray(iscrowd, bool)[None, :], da,
                     da + ga - inter)
    return inter / np.maximum(union, 1e-10)


def polygons_to_bitmap(polygons: Sequence[np.ndarray], h: int,
                       w: int) -> np.ndarray:
    """Rasterize absolute-coordinate polygons into an (h, w) bool bitmap."""
    import cv2
    out = np.zeros((h, w), np.uint8)
    pts = [np.round(np.asarray(p, np.float32).reshape(-1, 2)).astype(
        np.int32) for p in polygons if len(np.asarray(p).reshape(-1)) >= 6]
    if pts:
        cv2.fillPoly(out, pts, 1)
    return out.astype(bool)
