"""FCN mask head (Mask R-CNN).

Behavioural mirror of /root/reference/mmdet/models/roi_heads/mask_heads/
fcn_mask_head.py: 4x conv256 + 2x deconv upsample + 1x1 conv to C class
masks; training supervises the target-class 28x28 mask of positive RoIs
with BCE; inference thresholds the sigmoid of the detected class's mask.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...losses import binary_cross_entropy_with_logits
from ..layers import torch_pad


class FCNMaskHead(nn.Module):
    num_classes: int
    num_convs: int = 4
    feat_channels: int = 256
    # configs/gn: mask_head=dict(norm_cfg=GN) — GN(32) after each conv
    norm: str = ''  # '' | 'gn'
    conv_ws: bool = False

    @nn.compact
    def __call__(self, roi_feats):
        """(R, 14, 14, C_in) -> (R, 28, 28, num_classes) mask logits."""
        x = roi_feats
        for i in range(self.num_convs):
            if self.conv_ws:
                from ..layers import WSConv
                x = WSConv(self.feat_channels, kernel_size=3,
                           use_bias=False, name=f'conv_{i}')(x)
            else:
                x = nn.Conv(self.feat_channels, (3, 3),
                            padding=[torch_pad(3)] * 2,
                            use_bias=self.norm != 'gn',
                            name=f'conv_{i}')(x)
            if self.norm == 'gn':
                x = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 name=f'gn_{i}')(x)
            x = nn.relu(x)
        x = nn.relu(nn.ConvTranspose(self.feat_channels, (2, 2),
                                     strides=(2, 2), name='upsample')(x))
        return nn.Conv(self.num_classes, (1, 1), name='conv_logits')(x)


def mask_loss(mask_logits, mask_targets, labels, is_pos):
    """BCE on the target-class channel of positive RoIs.

    mask_logits: (R, 28, 28, C); mask_targets: (R, 28, 28) in [0, 1];
    labels: (R,) assigned classes; is_pos: (R,) validity.
    """
    c = mask_logits.shape[-1]
    safe = jnp.clip(labels, 0, c - 1)
    picked = jnp.take_along_axis(
        mask_logits, safe[:, None, None, None], axis=-1)[..., 0]
    bce = binary_cross_entropy_with_logits(picked, mask_targets)
    per_roi = bce.mean(axis=(1, 2))
    n_pos = jnp.maximum(is_pos.sum(), 1.0)
    return (per_roi * is_pos).sum() / n_pos
