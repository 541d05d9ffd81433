"""Anchor generation (host-side, static per shape bucket).

Reproduces mmdet's ``AnchorGenerator`` for the GFL configuration
(/root/reference/mmdet/models/task_modules/prior_generators/anchor_generator.py:18-497):
square base anchors of size ``octave_base_scale * stride`` centered at
(0, 0) (center_offset=0), shifted onto the stride grid, plus per-image valid
flags derived from the image's pad-to-divisor shape. Anchors are constants of
a shape bucket, so they are computed once in numpy and closed over by the
jitted step (XLA folds them into the executable).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import numpy as np


@dataclass(frozen=True)
class AnchorGenerator:
    """Multi-level anchor generator.

    Attributes mirror the reference config
    (configs/gfl_increment/*.py anchor_generator): one square anchor per cell
    for GFL (ratios=[1.0], scales_per_octave=1, octave_base_scale=8).
    """
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    ratios: Tuple[float, ...] = (1.0,)
    octave_base_scale: int = 8
    scales_per_octave: int = 1
    center_offset: float = 0.0
    # explicit scale list (YOLOF: scales=[1,2,4,8,16]); overrides octaves
    scales: Tuple[float, ...] = None

    @property
    def num_levels(self):
        return len(self.strides)

    @property
    def num_base_anchors(self):
        if self.scales is not None:
            return len(self.ratios) * len(self.scales)
        return len(self.ratios) * self.scales_per_octave

    def base_anchors(self, stride):
        """(A, 4) base anchors for one stride, centered at center_offset*stride."""
        if self.scales is not None:
            scales = np.asarray(self.scales, np.float64)
        else:
            octave_scales = np.array(
                [2**(i / self.scales_per_octave)
                 for i in range(self.scales_per_octave)])
            scales = octave_scales * self.octave_base_scale
        anchors = []
        cx = self.center_offset * stride
        cy = self.center_offset * stride
        for ratio in self.ratios:
            h_ratio = math.sqrt(ratio)
            w_ratio = 1.0 / h_ratio
            for scale in scales:
                w = stride * scale * w_ratio
                h = stride * scale * h_ratio
                anchors.append([cx - 0.5 * w, cy - 0.5 * h,
                                cx + 0.5 * w, cy + 0.5 * h])
        return np.asarray(anchors, np.float32)

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]):
        """Per-level (H*W*A, 4) anchors for the given feature map sizes."""
        out = []
        for (h, w), stride in zip(featmap_sizes, self.strides):
            base = self.base_anchors(stride)  # (A, 4)
            sx = np.arange(w, dtype=np.float32) * stride
            sy = np.arange(h, dtype=np.float32) * stride
            gx, gy = np.meshgrid(sx, sy)  # (h, w)
            shifts = np.stack([gx, gy, gx, gy], axis=-1).reshape(-1, 1, 4)
            anchors = (shifts + base[None]).reshape(-1, 4)
            out.append(anchors.astype(np.float32))
        return out

    def flat_anchors(self, featmap_sizes):
        """All-level anchors concatenated: (sum_l H_l*W_l*A, 4)."""
        return np.concatenate(self.grid_anchors(featmap_sizes), axis=0)

    def num_level_anchors(self, featmap_sizes):
        return [h * w * self.num_base_anchors for h, w in featmap_sizes]

    def valid_flags_np(self, featmap_sizes, pad_shape):
        """Host-side per-level valid flags for one image (numpy)."""
        ph, pw = pad_shape
        flags = []
        for (h, w), stride in zip(featmap_sizes, self.strides):
            vh = min(int(np.ceil(ph / stride)), h)
            vw = min(int(np.ceil(pw / stride)), w)
            vy = np.arange(h) < vh
            vx = np.arange(w) < vw
            f = (vy[:, None] & vx[None, :]).reshape(-1)
            flags.append(np.repeat(f, self.num_base_anchors))
        return np.concatenate(flags)


def valid_flags_jax(featmap_sizes, strides, pad_shape, num_base_anchors=1):
    """Traced valid flags from a (possibly traced) per-image pad shape.

    Mirrors AnchorGenerator.single_level_valid_flags with
    valid_size = ceil(pad_shape / stride)
    (/root/reference/mmdet/models/dense_heads/anchor_head.py:164-199).
    """
    import jax.numpy as jnp
    ph, pw = pad_shape[0], pad_shape[1]
    flags = []
    for (h, w), stride in zip(featmap_sizes, strides):
        vh = jnp.ceil(ph / stride)
        vw = jnp.ceil(pw / stride)
        vy = jnp.arange(h) < vh
        vx = jnp.arange(w) < vw
        f = (vy[:, None] & vx[None, :]).reshape(-1)
        if num_base_anchors != 1:
            f = jnp.repeat(f, num_base_anchors)
        flags.append(f)
    return jnp.concatenate(flags)


def featmap_sizes_for(image_shape: Tuple[int, int], strides) -> List[Tuple[int, int]]:
    """Feature sizes produced by a stride-s conv stack: ceil(dim / stride)."""
    h, w = image_shape
    return [(int(math.ceil(h / s)), int(math.ceil(w / s))) for s in strides]


@dataclass(frozen=True)
class MlvlPointGenerator:
    """Point priors (FCOS-style heads). Offset 0.5 by default."""
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    offset: float = 0.5

    @property
    def num_levels(self):
        return len(self.strides)

    def grid_points(self, featmap_sizes, with_stride=False):
        out = []
        for (h, w), stride in zip(featmap_sizes, self.strides):
            sx = (np.arange(w, dtype=np.float32) + self.offset) * stride
            sy = (np.arange(h, dtype=np.float32) + self.offset) * stride
            gx, gy = np.meshgrid(sx, sy)
            pts = [gx.reshape(-1), gy.reshape(-1)]
            if with_stride:
                pts += [np.full(h * w, stride, np.float32),
                        np.full(h * w, stride, np.float32)]
            out.append(np.stack(pts, axis=-1))
        return out
