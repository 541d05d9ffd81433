"""CARAFE content-aware upsampling (TPU-native).

Replaces mmcv.ops.CARAFEPack (used by the reference's FPN_CARAFE neck,
necks/fpn_carafe.py): a kernel-prediction branch (channel compressor 1x1 ->
content encoder KeXKe conv -> pixel-shuffle to up^2 maps of Kup^2 logits ->
softmax) and the reassembly step, where every upsampled pixel is a
softmax-weighted sum of the Kup x Kup input neighborhood around its source
pixel. The reassembly is expressed as an im2col gather + einsum so the
contraction runs as one batched reduction; no scalar loops.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

def torch_pad(kernel_size):
    """Symmetric torch-style 'same' padding for odd kernels."""
    p = (kernel_size - 1) // 2
    return (p, p)


def carafe_reassemble(x, kernels, up=2, k_up=5):
    """x (H, W, C); kernels (H*up, W*up, k_up*k_up) softmaxed -> upsampled
    (H*up, W*up, C)."""
    h, w, c = x.shape
    pad = (k_up - 1) // 2
    xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    # neighborhood patches of each SOURCE pixel: (H, W, k*k, C)
    idx_y = jnp.arange(h)[:, None] + jnp.arange(k_up)[None]
    idx_x = jnp.arange(w)[:, None] + jnp.arange(k_up)[None]
    patches = xp[idx_y[:, None, :, None], idx_x[None, :, None, :]]
    patches = patches.reshape(h, w, k_up * k_up, c)
    # each output pixel (i, j) sources patch (i//up, j//up)
    kern = kernels.reshape(h, up, w, up, k_up * k_up)
    out = jnp.einsum('hawbk,hwkc->hawbc', kern, patches)
    return out.reshape(h * up, w * up, c)


class CARAFEPack(nn.Module):
    """Kernel-prediction + reassembly (mmcv CARAFEPack layout)."""
    channels: int
    up_factor: int = 2
    up_kernel: int = 5
    encoder_kernel: int = 3
    compressed_channels: int = 64

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        up, ku = self.up_factor, self.up_kernel
        comp = nn.Conv(self.compressed_channels, (1, 1),
                       name='channel_compressor')(x)
        ke = self.encoder_kernel
        logits = nn.Conv(ku * ku * up * up, (ke, ke),
                         padding=[torch_pad(ke)] * 2,
                         kernel_init=nn.initializers.normal(0.001),
                         name='content_encoder')(comp)
        b, h, w, _ = logits.shape
        # pixel-shuffle the up^2 groups into the upsampled grid
        lg = logits.reshape(b, h, w, up, up, ku * ku)
        lg = lg.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * up, w * up,
                                                    ku * ku)
        kernels = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)

        def single(xi, ki):
            return carafe_reassemble(xi.astype(jnp.float32), ki, up, ku)

        out = jax.vmap(single)(x, kernels)
        return out.astype(x.dtype)
