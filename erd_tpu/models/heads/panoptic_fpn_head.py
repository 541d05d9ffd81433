"""PanopticFPN semantic head.

Behavioural mirror of /root/reference/mmdet/models/seg_heads/
panoptic_fpn_head.py: each FPN level (P2..P5) passes through
(3x3 conv + GN + ReLU [+ 2x bilinear upsample])^k until it reaches the P2
(stride-4) resolution, the level outputs are summed, and a 1x1 conv
produces ``num_stuff_classes + 1`` logits (the +1 channel merges all
*thing* classes). Cross-entropy loss at stride 4 against the semantic map
(target downsampled with nearest, loss weight 0.5 in the reference
panoptic_fpn config).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...losses import cross_entropy_int
from ..layers import ConvModule


class PanopticFPNHead(nn.Module):
    num_stuff_classes: int = 53
    inner_channels: int = 128
    num_levels: int = 4  # P2..P5

    @nn.compact
    def __call__(self, feats):
        """feats: FPN levels [P2, P3, P4, P5] -> stride-4 logits (B,H,W,S+1)."""
        target_hw = feats[0].shape[-3:-1]
        acc = None
        for lvl in range(self.num_levels):
            x = feats[lvl]
            steps = max(lvl, 1)  # P2 gets one conv without upsample
            for s in range(steps):
                x = ConvModule(self.inner_channels, 3, norm='gn',
                               num_groups=32,
                               name=f'lvl{lvl}_conv{s}')(x)
                if lvl > 0:
                    h, w = x.shape[-3] * 2, x.shape[-2] * 2
                    x = jax.image.resize(
                        x, x.shape[:-3] + (h, w, x.shape[-1]),
                        method='bilinear')
            x = x[..., :target_hw[0], :target_hw[1], :]
            acc = x if acc is None else acc + x
        logits = nn.Conv(self.num_stuff_classes + 1, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         name='conv_logits')(acc)
        return logits.astype(jnp.float32)


def semantic_loss(logits, sem_target, num_stuff_classes, ignore_index=255,
                  loss_weight=0.5):
    """logits (B, h, w, S+1) at stride 4; sem_target (B, H, W) int
    (0..S-1 stuff, S = merged things, 255 = unlabeled)."""
    b, h, w, c = logits.shape
    tgt = jax.image.resize(sem_target.astype(jnp.float32), (b, h, w),
                           method='nearest').astype(jnp.int32)
    valid = (tgt != ignore_index) & (tgt < c)
    safe = jnp.where(valid, tgt, 0)
    ce = cross_entropy_int(logits.reshape(-1, c), safe.reshape(-1))
    ce = ce.reshape(b, h, w) * valid
    return loss_weight * ce.sum() / jnp.maximum(valid.sum(), 1.0)
