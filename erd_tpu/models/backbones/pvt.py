"""PVTv2 backbone (Pyramid Vision Transformer v2), flax.linen NHWC.

Behavioural mirror of /root/reference/mmdet/models/backbones/pvt.py
(PyramidVisionTransformerV2): overlapping patch embeddings (7x7/s4 stem,
3x3/s2 between stages), per-stage transformer blocks with
spatial-reduction attention (kv pooled by the stage's sr_ratio through a
strided conv + LN) and the v2 mix-FFN (3x3 depthwise conv between the fc
layers), layer norm after each stage. Arch table mirrors the reference's
b0-b2 settings (embed_dims 32/64-scaled, depths, heads, sr_ratios
(8, 4, 2, 1)).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

ARCHS = {
    'b0': dict(dims=(32, 64, 160, 256), depths=(2, 2, 2, 2),
               heads=(1, 2, 5, 8)),
    'b1': dict(dims=(64, 128, 320, 512), depths=(2, 2, 2, 2),
               heads=(1, 2, 5, 8)),
    'b2': dict(dims=(64, 128, 320, 512), depths=(3, 4, 6, 3),
               heads=(1, 2, 5, 8)),
}
SR_RATIOS = (8, 4, 2, 1)


class SRAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, C) -> same."""
        b, h, w, c = x.shape
        q = nn.Dense(c, name='q')(x.reshape(b, -1, c))
        if self.sr_ratio > 1:
            r = self.sr_ratio
            kv_in = nn.Conv(c, (r, r), strides=(r, r), name='sr')(x)
            kv_in = nn.LayerNorm(name='sr_norm')(kv_in)
            kv_in = kv_in.reshape(b, -1, c)
        else:
            kv_in = x.reshape(b, -1, c)
        k = nn.Dense(c, name='k')(kv_in)
        v = nn.Dense(c, name='v')(kv_in)
        hd = c // self.num_heads
        qh = q.reshape(b, -1, self.num_heads, hd)
        kh = k.reshape(b, -1, self.num_heads, hd)
        vh = v.reshape(b, -1, self.num_heads, hd)
        attn = jnp.einsum('bqhd,bkhd->bhqk', qh, kh) / jnp.sqrt(hd)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, vh).reshape(b, -1, c)
        return nn.Dense(c, name='proj')(out).reshape(b, h, w, c)


class MixFFN(nn.Module):
    dim: int
    ratio: int = 4

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = c * self.ratio
        y = nn.Dense(hidden, name='fc1')(x)
        y = nn.Conv(hidden, (3, 3), padding='SAME',
                    feature_group_count=hidden, name='dwconv')(y)
        y = nn.gelu(y)
        return nn.Dense(c, name='fc2')(y)


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x):
        y = SRAttention(self.dim, self.num_heads, self.sr_ratio,
                        name='attn')(nn.LayerNorm(name='norm1')(x))
        x = x + y
        y = MixFFN(self.dim, name='ffn')(nn.LayerNorm(name='norm2')(x))
        return x + y


class PVTv2(nn.Module):
    arch: str = 'b0'
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = ARCHS[self.arch]
        x = x.astype(self.compute_dtype)
        outs = []
        for stage in range(4):
            dim = cfg['dims'][stage]
            if stage == 0:
                x = nn.Conv(dim, (7, 7), strides=(4, 4), padding='SAME',
                            name='patch_embed0')(x)
            else:
                x = nn.Conv(dim, (3, 3), strides=(2, 2), padding='SAME',
                            name=f'patch_embed{stage}')(x)
            x = nn.LayerNorm(name=f'embed_norm{stage}')(x)
            for blk in range(cfg['depths'][stage]):
                x = PVTBlock(dim, cfg['heads'][stage], SR_RATIOS[stage],
                             name=f'stage{stage}_block{blk}')(x)
            x = nn.LayerNorm(name=f'stage_norm{stage}')(x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)
