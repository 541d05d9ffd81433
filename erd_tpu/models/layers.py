"""NN building blocks (flax.linen, NHWC).

TPU-native equivalents of the mmcv.cnn blocks used by the reference
(gfl_head.py:8 ConvModule/Scale; resnet.py build_norm_layer). Convolutions use
EXPLICIT torch-style padding (pad 1 for 3x3 etc.) rather than XLA 'SAME':
for even spatial sizes and stride 2 the two conventions place windows
differently, which would silently break parity with imported torch weights.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_pad(k: int) -> Tuple[int, int]:
    """torch Conv2d padding=k//2 on both sides for odd kernels."""
    p = k // 2
    return (p, p)


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always uses stored running statistics.

    The reference trains ResNet with ``norm_eval=True`` (resnet.py:648-658):
    BN never updates running stats during detection training, and gamma/beta
    remain trainable (except in frozen stages, handled by the optimizer mask).
    Stats live in the 'batch_stats' collection and are never mutated.
    """
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((self.features,), jnp.float32))
        inv = jax.lax.rsqrt(var.value + self.eps) * scale
        inv = inv.astype(x.dtype)
        shift = (bias - mean.value * jax.lax.rsqrt(var.value + self.eps) *
                 scale).astype(x.dtype)
        return x * inv + shift


class Scale(nn.Module):
    """Learnable scalar multiplier (per-FPN-level reg scale in GFL)."""
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param('scale',
                       lambda key: jnp.asarray(self.init_value, jnp.float32))
        return x * s.astype(x.dtype)


class ConvModule(nn.Module):
    """Conv2d + optional norm (GN/frozen-BN) + optional ReLU, torch padding.

    Conv and GroupNorm both compute in the INPUT dtype (params stay fp32):
    flax's default dtype=None promotes bf16 activations back to fp32
    against the fp32 kernels, which silently runs "bf16" towers in fp32
    and doubles HBM traffic. dtype=x.dtype keeps the tower in the dtype
    the stem cast established (GN statistics still accumulate in fp32
    inside flax).
    """
    features: int
    kernel_size: int = 3
    strides: int = 1
    norm: Optional[str] = 'gn'  # 'gn' | 'bn' | None
    num_groups: int = 32
    act: bool = True
    use_bias: Optional[bool] = None
    kernel_init: Callable = nn.initializers.normal(0.01)
    bias_init: Callable = nn.initializers.zeros
    name_conv: str = 'conv'

    @nn.compact
    def __call__(self, x):
        use_bias = self.use_bias
        if use_bias is None:
            use_bias = self.norm is None  # norm layers absorb the bias
        x = nn.Conv(
            self.features, (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[torch_pad(self.kernel_size)] * 2,
            use_bias=use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=x.dtype,
            name=self.name_conv)(x)
        if self.norm == 'gn':
            x = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                             dtype=x.dtype, name='gn')(x)
        elif self.norm == 'bn':
            x = FrozenBatchNorm(self.features, name='bn')(x)
        if self.act:
            x = nn.relu(x)
        return x


def max_pool_torch(x, window: int, stride: int, padding: int):
    """torch MaxPool2d with explicit symmetric padding (pads with -inf)."""
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((padding, padding), (padding, padding)))


def nearest_upsample_to(x, out_hw: Tuple[int, int]):
    """Nearest-neighbour resize matching torch F.interpolate(mode='nearest').

    torch maps output index i -> floor(i * in/out); jax.image.resize uses
    pixel-center sampling which differs for non-integer ratios, so we gather
    explicitly.
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    idx_h = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    idx_w = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[..., idx_h[:, None], idx_w[None, :], :]


def bias_init_prob(prior_prob: float) -> Callable:
    """Focal-style bias init: sigmoid(bias) == prior_prob."""
    import math
    v = -math.log((1 - prior_prob) / prior_prob)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, v, dtype)

    return init


def cast_compute_params(variables, dtype):
    """Cast floating params to the compute dtype at the apply boundary.

    flax's dtype=None promotion means fp32 params silently pull bf16
    activations back to fp32 after every layer; casting the param tree
    once per apply keeps the whole network in the compute dtype. The cast
    lives inside jit (grads transpose back to fp32 master params), and
    non-param collections (batch_stats) stay fp32 for stable statistics.
    """
    if dtype == jnp.float32 or 'params' not in variables:
        return variables

    def cast(x):
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    out = dict(variables)
    out['params'] = jax.tree.map(cast, variables['params'])
    return out


class WSConv(nn.Module):
    """Weight-standardized conv (mmcv ConvWS2d; the reference's gn+ws
    configs conv_cfg=dict(type='ConvWS')): the kernel is normalized to
    zero mean / unit std over (kh, kw, cin) per output channel before the
    convolution, pairing with GroupNorm for batch-size-robust training.
    """
    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    use_bias: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param('kernel', nn.initializers.he_normal(),
                            (k, k, x.shape[-1], self.features),
                            jnp.float32)
        # standardization statistics in f32 even when the param tree was
        # cast to the compute dtype (cast_compute_params); the conv itself
        # runs in the activation dtype so bf16 stays on the MXU fast path
        kernel = kernel.astype(jnp.float32)
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        std = kernel.std(axis=(0, 1, 2), keepdims=True)
        kernel = ((kernel - mean) / (std + self.eps)).astype(x.dtype)
        pad = self.dilation * (k // 2)
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(self.strides, self.strides),
            padding=[(pad, pad)] * 2,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + self.param('bias', nn.initializers.zeros,
                               (self.features,), jnp.float32).astype(
                                   jnp.float32)
        return y.astype(x.dtype)


class NormedLinear(nn.Module):
    """Cosine classifier (mmdet layers/normed_predictor.py NormedLinear,
    used by the seesaw_loss configs' cls_predictor_cfg): both the weight
    rows and the input features are L2-normalized (raised to ``power``)
    and the normalized input is scaled by ``temperature`` before the
    affine map. (The reference spells the arg 'tempearture'.)"""
    features: int
    temperature: float = 20.0
    power: float = 1.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param('kernel', nn.initializers.normal(0.01),
                       (x.shape[-1], self.features), jnp.float32)
        b = self.param('bias', nn.initializers.zeros, (self.features,),
                       jnp.float32)
        x = x.astype(jnp.float32)
        w = w / (jnp.power(jnp.linalg.norm(w, axis=0, keepdims=True),
                           self.power) + self.eps)
        x = x / (jnp.power(jnp.linalg.norm(x, axis=-1, keepdims=True),
                           self.power) + self.eps)
        return x * self.temperature @ w + b
