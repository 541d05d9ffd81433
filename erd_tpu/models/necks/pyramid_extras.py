"""More pyramid necks: BFP (Libra R-CNN), HRFPN (HRNet), FPN_CARAFE.

Behavioural mirrors of /root/reference/mmdet/models/necks/bfp.py (gather
levels to the refine level by max-pool/nearest-resize, average, refine
(conv or embedded-gaussian non-local), scatter back residually),
hrfpn.py (bilinear-upsample concat -> 1x1 reduction -> avg-pool pyramid ->
3x3 convs) and fpn_carafe.py (FPN whose top-down upsample is the CARAFE
op; reference default up_kernel=5, compressed 64ch).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.carafe import CARAFEPack
from ..layers import nearest_upsample_to, torch_pad


def _adaptive_max_pool(x, out_hw):
    """(..., H, W, C) -> (..., h, w, C) torch adaptive_max_pool2d."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    assert h % oh == 0 and w % ow == 0, (h, w, out_hw)
    kh, kw = h // oh, w // ow
    return nn.max_pool(x, (kh, kw), strides=(kh, kw))


class NonLocal2d(nn.Module):
    """Embedded-gaussian non-local block (mmcv NonLocal2d, use_scale=False,
    reduction=1)."""
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        g = nn.Conv(self.channels, (1, 1), name='g')(x).reshape(b, -1, c)
        theta = nn.Conv(self.channels, (1, 1),
                        name='theta')(x).reshape(b, -1, c)
        phi = nn.Conv(self.channels, (1, 1), name='phi')(x).reshape(b, -1, c)
        attn = jax.nn.softmax(
            jnp.einsum('bic,bjc->bij', theta, phi).astype(jnp.float32),
            axis=-1).astype(x.dtype)
        y = jnp.einsum('bij,bjc->bic', attn, g).reshape(b, h, w, c)
        y = nn.Conv(x.shape[-1], (1, 1),
                    kernel_init=nn.initializers.zeros, name='conv_out')(y)
        return x + y


class BFP(nn.Module):
    """Balanced Feature Pyramid (Libra R-CNN)."""
    num_levels: int = 5
    refine_level: int = 2
    refine_type: str = 'non_local'  # None | 'conv' | 'non_local'

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == self.num_levels
        size = inputs[self.refine_level].shape[-3:-1]
        feats = []
        for i, x in enumerate(inputs):
            if i < self.refine_level:
                feats.append(_adaptive_max_pool(x, size))
            else:
                feats.append(nearest_upsample_to(x, size))
        bsf = sum(feats) / len(feats)
        if self.refine_type == 'conv':
            bsf = nn.Conv(bsf.shape[-1], (3, 3),
                          padding=[torch_pad(3)] * 2, name='refine')(bsf)
        elif self.refine_type == 'non_local':
            bsf = NonLocal2d(bsf.shape[-1], name='refine')(bsf)
        outs = []
        for i, x in enumerate(inputs):
            hw = x.shape[-3:-1]
            if i < self.refine_level:
                res = nearest_upsample_to(bsf, hw)
            else:
                res = _adaptive_max_pool(bsf, hw)
            outs.append(x + res)
        return tuple(outs)


class HRFPN(nn.Module):
    """HRNet feature pyramid: upsample-concat all branches, 1x1 reduce,
    avg-pool pyramid, per-level 3x3 conv."""
    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, inputs):
        size = inputs[0].shape[-3:-1]
        ups = [inputs[0]]
        for x in inputs[1:]:
            ups.append(jax.image.resize(
                x, x.shape[:-3] + (size[0], size[1], x.shape[-1]),
                method='bilinear'))
        cat = jnp.concatenate(ups, axis=-1)
        out = nn.Conv(self.out_channels, (1, 1), name='reduction')(cat)
        levels = [out]
        for i in range(1, self.num_outs):
            k = 2 ** i
            levels.append(nn.avg_pool(out, (k, k), strides=(k, k)))
        return tuple(
            nn.Conv(self.out_channels, (3, 3), padding=[torch_pad(3)] * 2,
                    name=f'fpn_conv_{i}')(lv)
            for i, lv in enumerate(levels))


class FPNCARAFE(nn.Module):
    """FPN with CARAFE top-down upsampling (fpn_carafe.py, upsample='carafe')."""
    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0

    @nn.compact
    def __call__(self, inputs):
        used = list(range(self.start_level, len(inputs)))
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f'lateral_{i}')(
                inputs[i]) for i in used
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = CARAFEPack(self.out_channels, up_factor=2,
                            name=f'carafe_{i}')(laterals[i])
            # CARAFE doubles exactly; crop to the lateral's odd sizes
            th, tw = laterals[i - 1].shape[-3:-1]
            laterals[i - 1] = laterals[i - 1] + up[..., :th, :tw, :]
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[torch_pad(3)] * 2,
                    name=f'fpn_conv_{j}')(laterals[j])
            for j in range(len(laterals))
        ]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
