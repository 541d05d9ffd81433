"""Swin Transformer backbone (windowed attention), flax.linen NHWC.

Behavioural mirror of /root/reference/mmdet/models/backbones/swin.py
(Swin-T/S/B layouts): 4x4 patch embed, window MSA with relative position
bias, shifted windows every other block (cyclic roll + attention mask),
MLP ratio 4, patch-merging downsample between stages, per-stage LayerNorm
on outputs. TPU notes: window partition is pure reshape/transpose (no
gather); the shifted-window attention mask is a static constant per
(H, W, shift) so everything jits once per bucket.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ARCHS = {
    'tiny': dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    'small': dict(embed_dim=96, depths=(2, 2, 18, 2),
                  num_heads=(3, 6, 12, 24)),
    'base': dict(embed_dim=128, depths=(2, 2, 18, 2),
                 num_heads=(4, 8, 16, 32)),
}


def window_partition(x, ws):
    """(B, H, W, C) -> (B*nW, ws*ws, C); H, W divisible by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, c)


def window_reverse(x, ws, h, w):
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, -1)


def relative_position_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing='ij'))  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shift_attn_mask(h, w, ws, shift):
    """Static attention mask for shifted windows: (nW, N, N) additive."""
    img_mask = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wslice in (slice(0, -ws), slice(-ws, -shift),
                       slice(-shift, None)):
            img_mask[hs, wslice] = cnt
            cnt += 1
    mw = window_partition(jnp.asarray(img_mask[None, :, :, None]),
                          ws)[:, :, 0]  # (nW, N)
    diff = mw[:, :, None] - mw[:, None, :]
    return jnp.where(diff == 0, 0.0, -100.0).astype(jnp.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x (B_, N, C); mask (nW, N, N) or None."""
        b_, n, c = x.shape
        ws = self.window_size
        head_dim = c // self.num_heads
        qkv = nn.Dense(c * 3, name='qkv')(x).reshape(
            b_, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        q = jnp.swapaxes(q, 1, 2) * (head_dim ** -0.5)  # (B_, h, N, d)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        attn = q @ jnp.swapaxes(k, -1, -2)  # (B_, h, N, N)

        rpbt = self.param('relative_position_bias_table',
                          nn.initializers.normal(0.02),
                          ((2 * ws - 1) ** 2, self.num_heads))
        idx = relative_position_index(ws).reshape(-1)
        bias = rpbt[idx].reshape(n, n, self.num_heads)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n) + \
                mask[None, :, None]
            attn = attn.reshape(b_, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v)
        out = jnp.swapaxes(out, 1, 2).reshape(b_, n, c)
        return nn.Dense(c, name='proj')(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, C) with H, W divisible by window_size."""
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        y = nn.LayerNorm(name='norm1')(x)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = shift_attn_mask(h, w, ws, self.shift)
        else:
            mask = None
        windows = window_partition(y, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws,
                               name='attn')(windows, mask)
        y = window_reverse(attn, ws, h, w)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + y
        z = nn.LayerNorm(name='norm2')(x)
        z = nn.Dense(int(c * self.mlp_ratio), name='mlp_fc1')(z)
        z = nn.Dense(c, name='mlp_fc2')(nn.gelu(z))
        return x + z


class PatchMerging(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(name='norm')(x)
        return nn.Dense(self.out_dim, use_bias=False,
                        name='reduction')(x)


class SwinTransformer(nn.Module):
    arch: str = 'tiny'
    window_size: int = 7
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = ARCHS[self.arch]
        dim = cfg['embed_dim']
        x = x.astype(self.compute_dtype)
        # pad to multiples of 4*window_size so every stage partitions evenly
        mult = 4 * self.window_size * 2  # covers 3 downsamples
        ph = (-x.shape[1]) % mult
        pw = (-x.shape[2]) % mult
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = nn.Conv(dim, (4, 4), strides=(4, 4), name='patch_embed')(x)
        x = nn.LayerNorm(name='patch_norm')(x)

        outs = []
        for stage, (depth, heads) in enumerate(zip(cfg['depths'],
                                                   cfg['num_heads'])):
            for blk in range(depth):
                x = SwinBlock(dim, heads, self.window_size,
                              shift=0 if blk % 2 == 0 else
                              self.window_size // 2,
                              name=f'stage{stage}_block{blk}')(x)
            if stage in self.out_indices:
                outs.append(nn.LayerNorm(name=f'out_norm{stage}')(x))
            if stage < len(cfg['depths']) - 1:
                x = PatchMerging(dim * 2, name=f'downsample{stage}')(x)
                dim *= 2
        return tuple(outs)
