from .backbones.resnet import ResNet
from .detectors.atss import ATSSDetector
from .detectors.fcos import FCOSDetector
from .detectors.gfl_erd import ERDConfig, ERDDetector, ers_select
from .detectors.faster_rcnn import FasterRCNNDetector
from .detectors.ld import LDDetector
from .detectors.retinanet import RetinaNetDetector
from .detectors.tood import TOODDetector
from .detectors.vfnet import VFNetDetector
from .detectors.centernet import CenterNetDetector
from .detectors.paa import PAADetector
from .detectors.solov2 import SOLOV2Detector
from .detectors.soft_teacher import SemiTrainConfig, SoftTeacherDetector
from .detectors.single_stage import GFLDetector, GFLNet
from .heads.gfl_head import (AnchorContext, GFLHeadNet, GFLTestConfig,
                             GFLTrainConfig, flatten_levels, gfl_loss,
                             gfl_predict, gfl_targets)
from .necks.fpn import FPN
from .preprocessor import Preprocessor

__all__ = [
    'ResNet', 'FPN', 'GFLHeadNet', 'GFLNet', 'GFLDetector', 'ERDDetector',
    'ERDConfig', 'ers_select', 'AnchorContext', 'RetinaNetDetector',
    'FCOSDetector', 'ATSSDetector', 'LDDetector', 'FasterRCNNDetector',
    'TOODDetector', 'VFNetDetector', 'CenterNetDetector', 'PAADetector', 'SOLOV2Detector', 'SoftTeacherDetector', 'SemiTrainConfig',
    'GFLTrainConfig', 'GFLTestConfig', 'flatten_levels', 'gfl_loss',
    'gfl_predict', 'gfl_targets', 'Preprocessor',
]
