"""Backbone stage plugins: GCNet ContextBlock + GeneralizedAttention.

Behavioural mirrors of the mmcv plugins the reference enables through
``plugins=[dict(cfg=dict(type=...), stages=..., position=...)]`` in
configs/gcnet/* (ContextBlock, ratio 1/4 or 1/16, after_conv3) and
configs/empirical_attention/* (GeneralizedAttention '1111', 8 heads,
kv_stride 2, after_conv2):

- ContextBlock (GCNet): softmax-attention global context pooling (a 1x1
  conv scores every position, the softmax-weighted sum gives a (1,1,C)
  context vector) followed by a bottleneck transform 1x1 -> LayerNorm ->
  ReLU -> 1x1 added back to every position (channel_add fusion).
- GeneralizedAttention: multi-head attention whose energy is the '1111'
  four-term sum (q*k content, q*geom position, appr_bias*k saliency,
  geom_bias*geom prior) with keys/values on a kv_stride-subsampled grid.
  Documented deviation: the relative-position embedding is a learned
  Dense projection of sinusoidal features (mmcv builds the same shape
  embedding from scaled position indices); attention masks for
  spatial_range>=0 are not implemented (the detection configs use -1 =
  global).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ContextBlock(nn.Module):
    ratio: float = 0.25

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        planes = max(int(c * self.ratio), 1)
        b, h, w, _ = x.shape
        scores = nn.Conv(1, (1, 1), name='conv_mask')(x)
        attn = jax.nn.softmax(scores.reshape(b, h * w, 1), axis=1)
        context = jnp.einsum('bpc,bpk->bkc', x.reshape(b, h * w, c), attn)
        t = nn.Conv(planes, (1, 1), name='channel_add_conv1')(
            context[:, :, None, :].reshape(b, 1, 1, c))
        t = nn.LayerNorm(name='ln')(t)
        t = nn.relu(t)
        t = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                    name='channel_add_conv2')(t)
        return x + t


def _sine_feats(rel, dim, base=100.0):
    """Sinusoidal features of relative offsets (mmcv position feats)."""
    freqs = base ** (jnp.arange(dim // 2) / max(dim // 2, 1))
    ang = rel[..., None] / freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class GeneralizedAttention(nn.Module):
    num_heads: int = 8
    kv_stride: int = 2
    q_downsample: bool = False
    position_embedding_dim: int = 64
    # four energy-term flags, mmcv order: [query-content x key-content,
    # query-content x relative-position, key-content saliency bias,
    # relative-position prior bias]
    attention_type: str = '1111'

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        nh = self.num_heads
        dh = c // nh  # qk_embed_dim per head (mmcv in_channels//num_heads)
        kv = x[:, ::self.kv_stride, ::self.kv_stride, :]
        hk, wk = kv.shape[1:3]
        q = nn.Conv(nh * dh, (1, 1), use_bias=False,
                    name='query_conv')(x).reshape(b, h * w, nh, dh)
        k = nn.Conv(nh * dh, (1, 1), use_bias=False,
                    name='key_conv')(kv).reshape(b, hk * wk, nh, dh)
        v = nn.Conv(nh * dh, (1, 1), use_bias=False,
                    name='value_conv')(kv).reshape(b, hk * wk, nh, dh)
        appr_bias = self.param('appr_bias', nn.initializers.normal(0.01),
                               (nh, dh), jnp.float32)
        geom_bias = self.param('geom_bias', nn.initializers.normal(0.01),
                               (nh, dh), jnp.float32)
        # relative geometry embedding between the q grid and the kv grid
        qy, qx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing='ij')
        ky, kx = jnp.meshgrid(jnp.arange(hk) * self.kv_stride,
                              jnp.arange(wk) * self.kv_stride,
                              indexing='ij')
        rel_y = (qy.reshape(-1)[:, None] -
                 ky.reshape(-1)[None, :]).astype(jnp.float32)
        rel_x = (qx.reshape(-1)[:, None] -
                 kx.reshape(-1)[None, :]).astype(jnp.float32)
        pd = self.position_embedding_dim // 2
        feats = jnp.concatenate([_sine_feats(rel_y, pd),
                                 _sine_feats(rel_x, pd)], axis=-1)
        geom = nn.Dense(nh * dh, use_bias=False,
                        name='geom_proj')(feats).reshape(
            h * w, hk * wk, nh, dh)
        scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        at = self.attention_type
        energy = jnp.zeros((b, h * w, hk * wk, nh), jnp.float32)
        if at[0] == '1':
            energy = energy + jnp.einsum('bqnd,bknd->bqkn', q, k)
        if at[1] == '1':
            energy = energy + jnp.einsum('bqnd,qknd->bqkn', q, geom)
        if at[2] == '1':
            energy = energy + jnp.einsum('nd,bknd->bkn',
                                         appr_bias, k)[:, None]
        if at[3] == '1':
            energy = energy + jnp.einsum('nd,qknd->qkn',
                                         geom_bias, geom)[None]
        energy = energy * scale
        attn = jax.nn.softmax(energy, axis=2)
        out = jnp.einsum('bqkn,bknd->bqnd', attn, v).reshape(
            b, h, w, nh * dh)
        out = nn.Conv(c, (1, 1), use_bias=False,
                      kernel_init=nn.initializers.zeros,
                      name='proj_conv')(out)
        return x + out
