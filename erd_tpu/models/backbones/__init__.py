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
