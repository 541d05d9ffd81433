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
from .detectors.fsaf import FSAFDetector
from .detectors.fovea import FoveaDetector
from .detectors.yolof import YOLOFDetector
from .detectors.reppoints import RepPointsDetector
from .detectors.ddod import DDODDetector
from .detectors.cornernet import CornerNetDetector
from .detectors.libra_rcnn import LibraRCNNDetector
from .detectors.panoptic_fpn import PanopticFPNDetector
from .detectors.sparse_rcnn import SparseRCNNDetector
from .detectors.free_anchor import FreeAnchorDetector
from .detectors.autoassign import AutoAssignDetector
from .detectors.pisa_retinanet import PISARetinaNetDetector
from .detectors.mask_scoring_rcnn import MaskScoringRCNNDetector
from .detectors.htc import HTCDetector
from .detectors.dynamic_rcnn import DynamicRCNNDetector
from .detectors.condinst import CondInstDetector
from .detectors.yolact import YOLACTDetector
from .detectors.mask2former import Mask2FormerDetector
from .detectors.lad import LADDetector
from .detectors.point_rend import PointRendDetector
from .detectors.grid_rcnn import GridRCNNDetector
from .detectors.queryinst import QueryInstDetector
from .detectors.solo import SOLODetector
from .detectors.boxinst import BoxInstDetector
from .detectors.crowddet import CrowdDetDetector
from .detectors.scnet import SCNetDetector
from .detectors.trident_faster_rcnn import TridentFasterRCNNDetector
from .detectors.nasfcos import NASFCOSDetector
from .detectors.detectors_rcnn import DetectoRSFasterRCNNDetector
from .detectors.centripetalnet import CentripetalNetDetector
from .detectors.fast_rcnn import FastRCNNDetector, RPNDetector
from .detectors.ga_faster_rcnn import (GAFasterRCNNDetector,
                                       GARPNDetector)
from .detectors.double_head_rcnn import DoubleHeadRCNNDetector
from .detectors.cascade_rpn import (CascadeRPNDetector,
                                    CascadeRPNFasterRCNNDetector)
from .detectors.groie_faster_rcnn import GRoIEFasterRCNNDetector
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
    'FSAFDetector', 'FoveaDetector', 'YOLOFDetector', 'RepPointsDetector', 'DDODDetector', 'CornerNetDetector', 'LibraRCNNDetector', 'PanopticFPNDetector', 'SparseRCNNDetector', 'FreeAnchorDetector', 'AutoAssignDetector', 'PISARetinaNetDetector', 'MaskScoringRCNNDetector', 'HTCDetector', 'DynamicRCNNDetector', 'CondInstDetector', 'YOLACTDetector', 'Mask2FormerDetector', 'LADDetector', 'PointRendDetector', 'GridRCNNDetector', 'QueryInstDetector', 'SOLODetector', 'BoxInstDetector', 'CrowdDetDetector', 'SCNetDetector', 'TridentFasterRCNNDetector', 'NASFCOSDetector', 'DetectoRSFasterRCNNDetector', 'CentripetalNetDetector', 'FastRCNNDetector', 'RPNDetector', 'GAFasterRCNNDetector', 'GARPNDetector', 'DoubleHeadRCNNDetector', 'CascadeRPNDetector', 'CascadeRPNFasterRCNNDetector', 'GRoIEFasterRCNNDetector',
    'GFLTrainConfig', 'GFLTestConfig', 'flatten_levels', 'gfl_loss',
    'gfl_predict', 'gfl_targets', 'Preprocessor',
]
