"""Deformable convolution v1/v2 (gather-based, TPU-native).

Replaces mmcv's DeformConv2d / ModulatedDeformConv2d CUDA kernels
(SURVEY.md section 2.9: "gather-based deform-conv" is the listed TPU
answer; used by the reference's strongest GFL configs, resnet.py:134 dcn
plugin, RepPoints, VFNet, DetectoRS).

Design: deformable conv is bilinear-sample + im2col + matmul. The sampling
is a vectorized gather over (H_out*W_out*K*K) locations with per-corner
zero-padding (the mmcv boundary rule); the contraction
(patches @ weight) is a single large matmul that XLA tiles onto the MXU —
so the op's FLOP-heavy part runs at matmul speed and only the gather rides
the VPU. No scalar loops, fully static shapes, jit/vmap/grad friendly.

Offset/mask channel layout: [deform_group, kernel_idx, (dy, dx)] — matching
the mmcv kernel's per-group interleaved (y, x) pairs; the modulation mask is
[deform_group, kernel_idx], sigmoid applied by the caller/module.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_zero(img, ys, xs):
    """img (H, W, C); ys/xs (...,) float -> (..., C), zero outside.

    Per-corner zero padding: each of the 4 corners contributes only if its
    integer index is inside the map (mmcv deformable-im2col semantics).
    """
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def corner(yy, xx):
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        v = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return v * ok[..., None]

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
            v10 * wy * (1 - wx) + v11 * wy * wx)


def deform_conv2d(x, offset, weight, mask=None, stride=1, padding=1,
                  dilation=1, deform_groups=1, bias=None, conv_groups=1):
    """One image. NHWC layout.

    Args:
        x: (H, W, Cin).
        offset: (Ho, Wo, dg, K*K, 2) learned (dy, dx) per kernel point.
        weight: (K, K, Cin // conv_groups, Cout) conv kernel.
        mask: optional (Ho, Wo, dg, K*K) modulation (already sigmoided)
            for DCNv2; None = DCNv1.
        stride/padding/dilation: ints (square).
        conv_groups: grouped-conv width (ResNeXt's grouped deformable 3x3,
            torch Conv2d ``groups`` semantics: output block g reads input
            block g). The GEMM becomes one (G,)-batched matmul.
    Returns (Ho, Wo, Cout).
    """
    k = weight.shape[0]
    cin = x.shape[-1]
    ho, wo = offset.shape[0], offset.shape[1]
    dg = deform_groups
    assert offset.shape[2] == dg and offset.shape[3] == k * k
    assert cin % dg == 0

    # base sampling grid: (Ho, Wo, K*K) y/x before offsets
    oy = jnp.arange(ho) * stride - padding
    ox = jnp.arange(wo) * stride - padding
    ky, kx = jnp.meshgrid(jnp.arange(k), jnp.arange(k), indexing='ij')
    base_y = oy[:, None, None] + (ky.reshape(-1) * dilation)[None, None, :]
    base_x = ox[None, :, None] + (kx.reshape(-1) * dilation)[None, None, :]

    # per deform group: sample that group's channel slice at shifted points
    group_ch = cin // dg
    patches = []
    for g in range(dg):
        ys = base_y + offset[:, :, g, :, 0]
        xs = base_x + offset[:, :, g, :, 1]
        samp = _bilinear_zero(x[..., g * group_ch:(g + 1) * group_ch],
                              ys, xs)  # (Ho, Wo, K*K, gch)
        if mask is not None:
            samp = samp * mask[:, :, g, :, None]
        patches.append(samp)
    patches = jnp.concatenate(patches, axis=-1) if dg > 1 else patches[0]
    if conv_groups == 1:
        # (Ho, Wo, K*K, Cin) -> (Ho*Wo, K*K*Cin) @ (K*K*Cin, Cout):
        # one MXU GEMM
        flat = patches.reshape(ho * wo, k * k * cin)
        wmat = weight.reshape(k * k * cin, -1)
        out = jnp.dot(flat, wmat,
                      preferred_element_type=jnp.float32).reshape(ho, wo, -1)
    else:
        g = conv_groups
        cg = cin // g
        cout = weight.shape[-1]
        cog = cout // g
        assert cin % g == 0 and cout % g == 0 and weight.shape[2] == cg
        # (Ho*Wo, K*K, G, cg) -> (G, Ho*Wo, K*K*cg)
        pg = patches.reshape(ho * wo, k * k, g, cg).transpose(2, 0, 1, 3) \
            .reshape(g, ho * wo, k * k * cg)
        # (K, K, cg, G*cog) -> (G, K*K*cg, cog)
        wg = weight.reshape(k * k, cg, g, cog).transpose(2, 0, 1, 3) \
            .reshape(g, k * k * cg, cog)
        out = jnp.matmul(pg, wg, preferred_element_type=jnp.float32)
        out = out.transpose(1, 0, 2).reshape(ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


class ModulatedDeformConv(nn.Module):
    """DCNv2 block: zero-init offset/mask conv + deformable conv (batched).

    Mirrors mmcv ModulatedDeformConv2dPack: a regular 3x3 conv predicts
    (dy, dx, mask_logit) per deform group and kernel point (zero-initialized
    so training starts as a plain conv with mask=sigmoid(0)=0.5 — the
    reference's init), then the deformable sampling + GEMM above.
    Set ``modulated=False`` for DCNv1 (no mask).
    """
    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    deform_groups: int = 1
    modulated: bool = True
    use_bias: bool = False
    feature_group_count: int = 1  # torch Conv2d groups (ResNeXt)

    @nn.compact
    def __call__(self, x):  # (B, H, W, Cin)
        k = self.kernel_size
        dg = self.deform_groups
        per_point = 3 if self.modulated else 2
        n_out = dg * k * k * per_point
        pad = self.dilation * (k // 2)
        off = nn.Conv(n_out, (k, k), strides=(self.strides, self.strides),
                      padding=[(pad, pad)] * 2,
                      kernel_dilation=(self.dilation, self.dilation),
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name='conv_offset')(x.astype(jnp.float32))
        b, ho, wo = off.shape[0], off.shape[1], off.shape[2]
        off = off.reshape(b, ho, wo, dg, k * k, per_point)
        offset = off[..., :2]
        mask = jax.nn.sigmoid(off[..., 2]) if self.modulated else None

        weight = self.param(
            'kernel', nn.initializers.he_normal(),
            (k, k, x.shape[-1] // self.feature_group_count, self.features),
            jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None

        def single(xi, oi, mi):
            return deform_conv2d(xi.astype(jnp.float32), oi, weight,
                                 mask=mi, stride=self.strides,
                                 padding=self.dilation * (k // 2),
                                 dilation=self.dilation,
                                 deform_groups=dg, bias=bias,
                                 conv_groups=self.feature_group_count)

        if mask is None:
            out = jax.vmap(lambda xi, oi: single(xi, oi, None))(x, offset)
        else:
            out = jax.vmap(single)(x, offset, mask)
        return out.astype(x.dtype)
