from .convnext import ConvNeXt
from .csp_darknet import CSPDarknet
from .darknet import Darknet
from .hourglass import HourglassNet
from .hrnet import HRNet
from .efficientnet import EfficientNet
from .mobilenet_v2 import MobileNetV2
from .pvt import PVTv2
from .regnet import RegNet
from .res2net import Res2Net
from .resnest import ResNeSt
from .resnet import ResNet
from .resnext import ResNeXt
from .ssd_vgg import SSDVGG
from .swin import SwinTransformer
from .trident_resnet import TridentResNet
from .detectors_resnet import DetectoRSResNet

__all__ = [
    'ResNet', 'ResNeXt', 'Res2Net', 'ResNeSt', 'RegNet', 'HRNet', 'HourglassNet',
    'MobileNetV2', 'PVTv2', 'EfficientNet', 'ConvNeXt', 'CSPDarknet', 'Darknet', 'SSDVGG', 'SwinTransformer', 'TridentResNet', 'DetectoRSResNet',
]

# ---------------------------------------------------------------------------
# Backbone swapping (configs with backbone=dict(type=..., ...); the
# registry-free analogue of mmdet's MODELS.build for backbones). Most are
# state-free multi-scale backbones: uniform __call__(images) -> tuple of
# C2..C5-style features, FrozenBN/LN statistics. EfficientNet is the one
# stateful-BN entry: hosts that support the loss_and_state (mutable
# batch_stats) protocol pass train=True through (configs/efficientnet
# pairs it with RetinaSepBNHead, which already runs that protocol);
# elsewhere its BN running stats stay frozen, matching FrozenBN hosts.
# ---------------------------------------------------------------------------
SWAPPABLE_BACKBONES = {
    'ResNet': ResNet, 'ResNeXt': ResNeXt, 'Res2Net': Res2Net,
    'ResNeSt': ResNeSt, 'RegNet': RegNet, 'HRNet': HRNet,
    'PVTv2': PVTv2, 'ConvNeXt': ConvNeXt,
    'SwinTransformer': SwinTransformer, 'EfficientNet': EfficientNet,
}

#: backbones whose __call__ takes a train flag (train-time BatchNorm)
STATEFUL_BACKBONES = ('EfficientNet',)


def backbone_spec_to_static(spec):
    """dict config -> hashable tuple usable as an nn.Module field."""
    out = []
    for k in sorted(spec):
        v = spec[k]
        if isinstance(v, (list, tuple)):
            v = tuple(v)
        out.append((k, v))
    return tuple(out)


def build_swappable_backbone(spec, compute_dtype, name=None):
    """spec: dict or the static tuple form, with a 'type' key."""
    kw = dict(spec)
    cls = SWAPPABLE_BACKBONES[kw.pop('type')]
    if name is not None:
        kw['name'] = name
    return cls(compute_dtype=compute_dtype, **kw)


def backbone_out_channels(spec, compute_dtype, probe=224):
    """Per-level output channels via shape-only evaluation."""
    import jax
    import jax.numpy as jnp
    mod = build_swappable_backbone(spec, compute_dtype)
    outs, _ = jax.eval_shape(
        mod.init_with_output, jax.random.PRNGKey(0),
        jnp.zeros((1, probe, probe, 3), jnp.float32))
    return tuple(int(o.shape[-1]) for o in outs)


__all__ += ['SWAPPABLE_BACKBONES', 'STATEFUL_BACKBONES',
            'backbone_spec_to_static', 'build_swappable_backbone',
            'backbone_out_channels']
