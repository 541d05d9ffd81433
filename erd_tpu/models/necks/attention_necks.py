"""DyHead, NAS-FPN and SSH necks.

Behavioural mirrors of /root/reference/mmdet/models/necks/dyhead.py
(scale/spatial/task attentions: shared DCNv2 offsets+masks predicted from
each level, neighbor levels deform-conved and fused with per-feature
hard-sigmoid scale attention, DyReLU task attention), nas_fpn.py (the
searched merge-cell topology over P3-P7 with SumCell / GlobalPoolingCell
binary ops from mmcv.ops.merge_cells: gp(x1, x2) = x2 + sigmoid(gap(x2))
* x1), and ssh.py (the SSH face-detection context module: 3x3 head plus
5x5- and 7x7-equivalent stacked-3x3 context branches, channel-concat).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.deform_conv import deform_conv2d
from ..layers import nearest_upsample_to, torch_pad


def hard_sigmoid(x, bias=3.0, divisor=6.0):
    return jnp.clip((x + bias) / divisor, 0.0, 1.0)


class DyDCNv2(nn.Module):
    """3x3 modulated deform conv with EXTERNAL offset/mask + GN."""
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, offset, mask):
        weight = self.param('kernel', nn.initializers.normal(0.01),
                            (3, 3, x.shape[-1], self.out_channels),
                            jnp.float32)

        def single(xi, oi, mi):
            return deform_conv2d(xi.astype(jnp.float32),
                                 oi[:, :, None], weight, mask=mi[:, :, None],
                                 stride=self.stride, padding=1)

        y = jax.vmap(single)(x, offset, mask)
        return nn.GroupNorm(num_groups=16, name='gn')(y)


class DyReLU(nn.Module):
    """Dynamic ReLU (channel-wise piecewise-linear with learned coeffs)."""
    channels: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2))
        s = nn.relu(nn.Dense(self.channels // self.reduction,
                             name='fc1')(s))
        coeffs = nn.Dense(4 * self.channels, name='fc2')(s)
        coeffs = hard_sigmoid(coeffs, bias=0.0, divisor=1.0) * 2 - 1
        a1 = 1.0 + coeffs[:, :self.channels]
        b1 = coeffs[:, self.channels:2 * self.channels] * 0.5
        a2 = coeffs[:, 2 * self.channels:3 * self.channels]
        b2 = coeffs[:, 3 * self.channels:] * 0.5
        y1 = x * a1[:, None, None] + b1[:, None, None]
        y2 = x * a2[:, None, None] + b2[:, None, None]
        return jnp.maximum(y1, y2)


class DyHeadBlock(nn.Module):
    out_channels: int = 256

    @nn.compact
    def __call__(self, feats):
        conv_off = nn.Conv(3 * 3 * 3, (3, 3), padding=[torch_pad(3)] * 2,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           name='spatial_conv_offset')
        high = DyDCNv2(self.out_channels, name='spatial_conv_high')
        mid = DyDCNv2(self.out_channels, name='spatial_conv_mid')
        low = DyDCNv2(self.out_channels, stride=2,
                      name='spatial_conv_low')
        attn_conv = nn.Conv(1, (1, 1), name='scale_attn_conv')
        task = DyReLU(self.out_channels, name='task_attn')

        def scale_attn(f):
            s = f.mean(axis=(1, 2), keepdims=True)
            return hard_sigmoid(nn.relu(attn_conv(s)))

        outs = []
        for lvl in range(len(feats)):
            om = conv_off(feats[lvl]).astype(jnp.float32)
            b, h, w, _ = om.shape
            offset = om[..., :18].reshape(b, h, w, 9, 2)
            mask = jax.nn.sigmoid(om[..., 18:]).reshape(b, h, w, 9)
            mid_f = mid(feats[lvl], offset, mask)
            acc = mid_f * scale_attn(mid_f)
            n = 1
            if lvl > 0:
                low_f = low(feats[lvl - 1], offset, mask)
                acc = acc + low_f * scale_attn(low_f)
                n += 1
            if lvl < len(feats) - 1:
                hf = high(feats[lvl + 1],
                          _resize_om(offset, feats[lvl + 1].shape[1:3]),
                          _resize_om(mask, feats[lvl + 1].shape[1:3]))
                hf = jax.image.resize(
                    hf, hf.shape[:1] + feats[lvl].shape[1:3] +
                    hf.shape[-1:], method='bilinear')
                acc = acc + hf * scale_attn(hf)
                n += 1
            outs.append(task(acc / n))
        return outs


def _resize_om(x, hw):
    """Resize offset/mask fields to a neighbor level's grid."""
    lead = x.shape[:1]
    tail = x.shape[3:]
    return jax.image.resize(x, lead + tuple(hw) + tail, method='nearest')


class DyHead(nn.Module):
    num_blocks: int = 6
    out_channels: int = 256

    @nn.compact
    def __call__(self, feats):
        feats = list(feats)
        for i in range(self.num_blocks):
            feats = DyHeadBlock(self.out_channels, name=f'block{i}')(feats)
        return tuple(feats)


class _MergeOut(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        # mmcv merge-cell out conv: ReLU -> conv -> GN ("act first")
        import math
        y = nn.Conv(self.channels, (3, 3), padding=[torch_pad(3)] * 2,
                    name='conv')(nn.relu(x))
        return nn.GroupNorm(num_groups=math.gcd(32, self.channels),
                            name='gn')(y)


def _to_size(x, hw):
    h, w = x.shape[1:3]
    th, tw = hw
    if (h, w) == (th, tw):
        return x
    if h >= th and w >= tw:
        # adaptive max pool: replicate-pad up to an exact multiple so odd
        # sizes (e.g. 3 -> 2) keep every target cell populated — floor
        # pooling would drop a row/col and desync from the anchor grid
        kh, kw = -(-h // th), -(-w // tw)
        ph, pw = kh * th - h, kw * tw - w
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode='edge')
        return nn.max_pool(x, (kh, kw), strides=(kh, kw))
    if h <= th and w <= tw:
        return nearest_upsample_to(x, hw)
    # mixed up/down (degenerate tiny pyramids only)
    return jax.image.resize(x, x.shape[:1] + (th, tw) + x.shape[3:],
                            method='nearest')


class NASFPN(nn.Module):
    """The searched NAS-FPN topology (nas_fpn.py:90-130)."""
    in_channels: Tuple[int, ...] = (512, 1024, 2048)
    out_channels: int = 256
    stack_times: int = 7

    @nn.compact
    def __call__(self, inputs):
        c = self.out_channels
        # laterals for C3..C5 -> P3..P5, extra stride-2 convs -> P6, P7
        p = [nn.Conv(c, (1, 1), name=f'lateral_{i}')(f)
             for i, f in enumerate(inputs)]
        p.append(nn.max_pool(p[-1], (1, 1), strides=(2, 2)))
        p.append(nn.max_pool(p[-1], (1, 1), strides=(2, 2)))
        p3, p4, p5, p6, p7 = p

        def gp(x1, x2):
            att = jax.nn.sigmoid(x2.mean(axis=(1, 2), keepdims=True))
            return x2 + att * x1

        for s in range(self.stack_times):
            hw4 = p4.shape[1:3]
            p4_1 = gp(_to_size(p6, hw4), p4)
            p4_1 = _MergeOut(c, name=f's{s}_gp_64_4')(p4_1)
            p4_2 = _MergeOut(c, name=f's{s}_sum_44_4')(p4_1 + p4)
            hw3 = p3.shape[1:3]
            p3 = _MergeOut(c, name=f's{s}_sum_43_3')(
                _to_size(p4_2, hw3) + p3)
            p4 = _MergeOut(c, name=f's{s}_sum_34_4')(
                _to_size(p3, hw4) + p4_2)
            hw5 = p5.shape[1:3]
            gp43 = gp(_to_size(p4, hw5), _to_size(p3, hw5))
            p5 = _MergeOut(c, name=f's{s}_sum_55_5')(gp43 + p5)
            hw7 = p7.shape[1:3]
            gp54 = gp(_to_size(p5, hw7), _to_size(p4_2, hw7))
            p7 = _MergeOut(c, name=f's{s}_sum_77_7')(gp54 + p7)
            hw6 = p6.shape[1:3]
            p6 = _MergeOut(c, name=f's{s}_gp_75_6')(
                gp(_to_size(p7, hw6), _to_size(p5, hw6)))
        return (p3, p4, p5, p6, p7)


class SSHContextModule(nn.Module):
    """SSH detection/context module (ssh.py): half-channel 3x3 branch +
    quarter-channel 5x5/7x7-equivalent stacked-3x3 branches, concat."""
    out_channels: int = 256

    @nn.compact
    def __call__(self, x):
        half = self.out_channels // 2
        quarter = self.out_channels // 4
        b3 = nn.Conv(half, (3, 3), padding=[torch_pad(3)] * 2,
                     name='conv3x3')(x)
        ctx = nn.relu(nn.Conv(quarter, (3, 3), padding=[torch_pad(3)] * 2,
                              name='ctx_conv1')(x))
        b5 = nn.Conv(quarter, (3, 3), padding=[torch_pad(3)] * 2,
                     name='conv5x5')(ctx)
        c7 = nn.relu(nn.Conv(quarter, (3, 3), padding=[torch_pad(3)] * 2,
                             name='ctx_conv2')(ctx))
        b7 = nn.Conv(quarter, (3, 3), padding=[torch_pad(3)] * 2,
                     name='conv7x7')(c7)
        return nn.relu(jnp.concatenate([b3, b5, b7], axis=-1))


class SSH(nn.Module):
    """Per-level SSH context modules (the SSH neck)."""
    out_channels: int = 256

    @nn.compact
    def __call__(self, feats):
        return tuple(
            SSHContextModule(self.out_channels, name=f'ssh_{i}')(f)
            for i, f in enumerate(feats))
